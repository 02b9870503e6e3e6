"""Prediction API: ConvNP → physical-units mean/std (+ samples) fields.

Engine parity with ``model.predict(task, X_t=..., n_samples=,
resolution_factor=, transform_params=)`` (call sites
``nzdownscale/downscaler/validate.py:1084-1118``, ``validate_ERA.py:88-96``,
``validate_WRF.py:227-238``): takes tasks + a target grid (the coarsened DEM)
or off-grid points (station coords), returns a ``Prediction`` holding
``mean``/``std`` (and optionally joint ``samples``) as :class:`Field`s with
real latitude/longitude coordinates and a time dimension, unnormalised back
to physical units, with sea-masking from DEM NaNs
(``validate_ERA.py:48-57,94-96``).

TPU-first: one jitted program computes forward + moments + unnormalisation
for a whole batch of timestamps; only the finished maps come back to host.
The low-rank (gnp) head yields **coherent joint samples** directly — the
factors decoded on the target grid define a consistent spatial covariance —
covering the reference's joint-sample panels (``validate.py:1019-1027``).
For non-Gaussian heads, AR sampling lives in :mod:`deepsensornz_tpu.infer.ar`.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepsensornz_tpu.data.grid import Dataset, Field
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.task.batching import take
from deepsensornz_tpu.task.task import TaskBatch

# one compiled gather program shared by every chunk of every Predictor:
# the batch shapes (month B, chunk size) key the jit cache
_take_device = jax.jit(take)


class Prediction(Dataset):
    """Dataset of mean/std (+samples) fields for one target variable."""


def _affine_for(dp: DataProcessor, var: str) -> tuple[float, float]:
    """(scale, offset): physical = normalised*scale + offset.

    Valid for all three normalisation methods (each is affine):
    mean_std → (σ, μ); min_max → (span/2, min + span/2);
    positive_semidefinite → (σ, 0).
    """
    cfg = dp.config[var]
    p = cfg["params"]
    m = cfg["method"]
    if m == "mean_std":
        return p["std"], p["mean"]
    if m == "min_max":
        span = p["max"] - p["min"]
        return span / 2.0, p["min"] + span / 2.0
    if m == "positive_semidefinite":
        return p["std"], 0.0
    raise ValueError(m)


def _linear_interp_weights(old: np.ndarray, new: np.ndarray) -> np.ndarray:
    """Dense (len(new), len(old)) linear-interpolation weight matrix with
    EXACTLY the semantics of ``Field._interp_one(dim, new, 'linear')``
    (sort-ascending, edge-clamped) so batched einsum upsampling matches the
    per-field path bit-for-bit."""
    old = np.asarray(old, np.float64)
    new = np.asarray(new, np.float64)
    order = np.argsort(old)
    old_s = old[order]
    pos = np.clip(np.searchsorted(old_s, new), 1, len(old_s) - 1)
    x0, x1 = old_s[pos - 1], old_s[pos]
    w = np.clip((new - x0) / np.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    W = np.zeros((len(new), len(old)), np.float64)
    rows = np.arange(len(new))
    np.add.at(W, (rows, order[pos - 1]), 1.0 - w)
    np.add.at(W, (rows, order[pos]), w)
    return W


_QUANT_BITS = {"int16": 16, "int8": 8}


def _quantize_ingraph(v: jnp.ndarray, bits: int,
                      axes: Optional[tuple] = None) -> dict:
    """Affine-quantize a (..., H, W, C) map IN-graph with per-(leading, C)
    scale/offset over the spatial axes (or explicit ``axes`` — the
    land-gathered layout quantizes over its single point axis).
    Downloading ``q`` (int8/int16) + the tiny lo/scale maps moves 4×/2×
    fewer bytes than f32 — the lever on a wire-bound serving link. Max abs
    error = scale/2 = range/(2·(2ᵇ−1)) per map (measured in
    docs/results/operational_month_r4.json)."""
    if axes is None:
        axes = (v.ndim - 3, v.ndim - 2)
    lo = jnp.min(v, axis=axes, keepdims=True)
    hi = jnp.max(v, axis=axes, keepdims=True)
    levels = float(2 ** bits - 1)
    scale = jnp.maximum((hi - lo) / levels, 1e-12)
    q = jnp.round((v - lo) / scale) - 2.0 ** (bits - 1)
    dt = jnp.int8 if bits == 8 else jnp.int16
    return {"q": q.astype(dt), "lo": lo.astype(jnp.float32),
            "scale": scale.astype(jnp.float32)}


def _dequantize_host(d, out_dtype=np.float64) -> np.ndarray:
    """Host-side inverse of :func:`_quantize_ingraph` (accepts plain arrays
    too, so consumers handle every transfer mode with one call)."""
    if not isinstance(d, dict):
        return np.asarray(d, out_dtype)
    q = np.asarray(d["q"])
    half = float(2 ** (q.dtype.itemsize * 8 - 1))
    return ((q.astype(np.float32) + half) * np.asarray(d["scale"], np.float32)
            + np.asarray(d["lo"], np.float32)).astype(out_dtype)


def _upcast_f32(task):
    """Upcast any compressed (float16) task leaves back to float32 — a
    no-op for float32 input, so one compiled program serves both upload
    modes per shape signature. On-device numerics are identical either
    way; only the wire format differs."""

    def up(x):
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jnp.float32:
            return x.astype(jnp.float32)
        return x

    return jax.tree.map(up, task)


def _prepare_grid_task(task: TaskBatch, upload_dtype: Optional[str]):
    """Shrink the host→device upload of a gridded-prediction TaskBatch.

    (a) Target-side leaves (``xt``/``yt``/``yt_mask``/``yt_aux``) are UNUSED
        when a ``target_grid`` is supplied — the model reads only the
        context sets and the internal grid — so they are replaced with
        minimal placeholders before upload. Exact; drops ~12 % of a month
        TaskBatch's bytes (the operational month is wire-bound over a
        remote host link, ``docs/results/operational_month_r4.json``).
    (b) With ``upload_dtype`` set (e.g. "float16"), VALUE leaves (gridded
        context ``y``, point ``y`` and masks — masks are {0,1}, exactly
        representable) are cast on host: 2× fewer upload bytes. The jitted
        forward upcasts to float32 before compute, so the only error is
        the input rounding (~5e-4 of a normalised value — measured output
        deviation documented in the operational-month artifact).
        COORDINATE leaves stay float32: a float16 ulp at 1.0 is ~half a
        d500 internal-grid cell.
    """
    from deepsensornz_tpu.task.task import GridContext, PointContext

    B = task.batch_size
    task = task.replace(
        xt=jnp.zeros((B, 1, 2), jnp.float32), yt=None,
        yt_mask=jnp.zeros((B, 1), jnp.float32), yt_aux=None,
    )
    if not upload_dtype:
        return task
    dt = jnp.dtype(upload_dtype)

    def g(gc: GridContext) -> GridContext:
        return GridContext(
            x1=gc.x1, x2=gc.x2, y=gc.y.astype(dt),
            mask=None if gc.mask is None else gc.mask.astype(dt),
        )

    def p(pc: PointContext) -> PointContext:
        return PointContext(x=pc.x, y=pc.y.astype(dt),
                            mask=pc.mask.astype(dt))

    return task.replace(grids=tuple(g(x) for x in task.grids),
                        points=tuple(p(x) for x in task.points))


@functools.lru_cache(maxsize=64)
def _grid_forward_fn(model, n_samples: int, transfer_dtype: Optional[str] = None,
                     outputs: tuple = ("mean", "std")):
    """Jitted gridded forward, shared across Predictor instances of the
    same (hashable) model — a fresh Predictor never recompiles.

    ``transfer_dtype`` shrinks the device→host transfer — the dominant cost
    of operational serving over a remote host link (measured: 17.1 s of a
    19.9 s month was the f32 download; docs/results/operational_month_r3_
    d120.json):
    - "float16"/"bfloat16": IN-graph cast, 2× fewer bytes; f16's 10-bit
      mantissa resolves ~0.03 % of a normalised value — far below station
      error — and outputs are upcast on the host.
    - "int16"/"int8": IN-graph affine quantization with per-(task, channel)
      scale/offset over the map (2×/4× fewer bytes; int16 is MORE accurate
      than f16 — uniform 1/65535-of-range steps vs f16's coarse tail).

    ``outputs`` selects which moment maps come back: the reference's
    operational product keeps ONLY the mean (``outputs/infer.py:93-112``
    strips to the ``mean`` var before writing), so ``("mean",)`` halves
    the download of a mean+std month.

    ``gather_land``: the prediction maps are sea-masked to NaN on host
    anyway (``validate_ERA.py:94-96``), so when enabled the graph gathers
    ONLY the land cells (a traced ``land_idx`` flat-index vector) before
    the transfer — exact, and cuts every download mode by the sea
    fraction (~42 % of the NZ 0.05° grid is sea). Host side scatters back
    into NaN-filled full maps.
    """
    lik = model.cfg.make_likelihood()
    qbits = _QUANT_BITS.get(transfer_dtype or "")
    tdt = (jnp.dtype(transfer_dtype)
           if transfer_dtype and not qbits else None)

    @jax.jit
    def fn(params, task, target_grid, seed, std_scale, land_idx=None):
        raw = model.apply(params, _upcast_f32(task), target_grid=target_grid)
        # post-hoc recalibration (traced): reparameterise the head so the
        # predictive spread scales by std_scale around an unchanged mean —
        # exact for every head incl. the mixed ones' point masses (fit on
        # validation and stored in the checkpoint metadata ``std_scale``)
        raw = lik.rescale_raw(raw, std_scale)
        mean, std = lik.mean_std(raw)
        out = {k: v for k, v in (("mean", mean), ("std", std))
               if k in outputs}
        B, Ht, Wt, K = raw.shape
        if n_samples > 0:
            # flatten grid → (B, Ht*Wt, K) so the head's joint sampler applies
            flat = raw.reshape(B, Ht * Wt, K)
            s = lik.sample(flat, jax.random.key(seed), n_samples)
            out["samples"] = s.reshape((n_samples, B, Ht, Wt, -1))
        if land_idx is not None:
            out = {
                k: jnp.take(v.reshape(v.shape[:-3] + (Ht * Wt, v.shape[-1])),
                            land_idx, axis=-2)
                for k, v in out.items()
            }
        q_axes = (-2,) if land_idx is not None else None
        if qbits:
            out = {k: _quantize_ingraph(v, qbits, q_axes)
                   for k, v in out.items()}
        elif tdt is not None:
            out = {k: v.astype(tdt) for k, v in out.items()}
        return out

    return fn


@functools.lru_cache(maxsize=64)
def _point_forward_fn(model):
    lik = model.cfg.make_likelihood()

    @jax.jit
    def fn(params, task, std_scale):
        raw = lik.rescale_raw(model.apply(params, task), std_scale)
        mean, std = lik.mean_std(raw)
        out = {"mean": mean, "std": std}
        if lik.name == "bernoulli-gamma":
            # occurrence probability for wet/dry skill scoring
            # (Validate.wet_dry_skill; untouched by the spread rescale)
            out["p_wet"] = jax.nn.sigmoid(raw[..., 0])
        return out

    return fn


class Predictor:
    """Bind (model, params, data_processor) into a predict callable."""

    def __init__(self, model, params, data_processor: DataProcessor,
                 target_var, transfer_dtype: Optional[str] = None,
                 std_scale: float = 1.0, batch_chunk: Optional[int] = None,
                 download_threads: int = 1,
                 upload_dtype: Optional[str] = None):
        """``target_var``: the target variable name, or a sequence of
        ``dim_yt`` names for multi-channel models (e.g. wind u+v two-column
        targets — the loader and heads support them; tested in
        ``test_edge_cases.py``). Each channel unnormalises with its own
        stats entry.

        ``batch_chunk``: split gridded predictions into fixed-size task
        chunks (one compiled program; tail padded by repetition) — bounds
        device memory for long runs (a 720-hour month at full internal
        density cannot sit on one chip as a single batch) and enables
        compute/download overlap. ``download_threads``: device→host
        fetches of the chunks run on a thread pool, overlapping downloads
        with the queued compute AND pipelining round trips over the host
        link (measured on the v5e relay: a month's downloads run ~3×
        faster with 4 fetch streams than any single-stream quantized mode,
        ``perf/operational_bench.py``).

        ``upload_dtype``: compress the gridded-prediction TaskBatch's VALUE
        leaves on host before upload (see :func:`_prepare_grid_task`) —
        the upstream half of the wire bound. Input-side rounding only;
        on-device compute stays float32."""
        self.model = model
        self.params = params
        self.dp = data_processor
        if isinstance(target_var, str):
            self.target_vars = [target_var]
        else:
            self.target_vars = list(target_var)
        self.target_var = self.target_vars[0]
        dy = model.cfg.dim_yt
        if dy != 1 and len(self.target_vars) != dy:
            raise ValueError(
                f"model has dim_yt={dy}; pass {dy} target_var names "
                f"(got {self.target_vars})"
            )
        self.likelihood = model.cfg.make_likelihood()
        # halve device→host bytes for remote serving (see _grid_forward_fn)
        self.transfer_dtype = transfer_dtype
        self.upload_dtype = upload_dtype
        self.batch_chunk = batch_chunk
        self.download_threads = int(download_threads)
        # post-hoc uncertainty recalibration fit on validation z-scores
        # (``Train.train_model(recalibrate=...)``); lives in the checkpoint
        # metadata so it travels WITH the model artifact
        self.std_scale = float(std_scale)
        # wall split of the most recent chunked predict_grid (upload vs
        # overlapped dispatch+compute+download) — perf accounting only
        self.last_timings: Optional[dict] = None

    # -- jitted cores --------------------------------------------------------

    def _grid_forward(self, params, task, target_grid, n_samples: int, seed=0,
                      outputs: tuple = ("mean", "std"), land_idx=None):
        return _grid_forward_fn(self.model, n_samples, self.transfer_dtype,
                                outputs)(
            params, task, target_grid, jnp.asarray(seed),
            jnp.asarray(self.std_scale, jnp.float32), land_idx,
        )

    def _point_forward(self, params, task):
        return _point_forward_fn(self.model)(
            params, task, jnp.asarray(self.std_scale, jnp.float32))

    # -- public API ------------------------------------------------------------

    def predict_grid(
        self,
        task: TaskBatch,
        target_elev: Field,
        aux_at_targets=None,
        times: Optional[np.ndarray] = None,
        n_samples: int = 0,
        seed: int = 0,
        sea_mask: bool = True,
        unnormalise: bool = True,
        post_transform=None,
        resolution_factor: float = 1.0,
        outputs: tuple = ("mean", "std"),
    ) -> Prediction:
        """Predict on the grid of ``target_elev`` (a DEM Field in RAW
        latitude/longitude coords, used as grid spec + sea mask; NaNs = sea).

        ``aux_at_targets`` must be the same normalised x-space aux
        Dataset/Field the TaskLoader was built with (highres topography);
        its channels are resampled onto the prediction grid.
        ``post_transform(mean, std) -> (mean, std)`` hook covers variable-
        specific output maps (humidity interval shift, ``preprocess.py:233-235``).
        CONTRACT: the hook is also applied to joint samples as
        ``post_transform(samples, None)`` — it must accept ``std=None``
        (apply the mean map, return the second element unchanged), as
        ``pipeline.validate.humidity_post_transform`` does.

        ``outputs``: which moment maps to fetch — ``("mean", "std")``
        (default) or ``("mean",)``. The reference's operational product
        writes only the mean (``outputs/infer.py:93-112``); fetching
        mean-only halves a month's download on a wire-bound link.
        """
        if "mean" not in outputs or not set(outputs) <= {"mean", "std"}:
            raise ValueError(f"outputs must be ('mean','std') or ('mean',); "
                             f"got {outputs}")
        lat = target_elev.coords[target_elev.dims[-2]]
        lon = target_elev.coords[target_elev.dims[-1]]
        if resolution_factor != 1.0:
            # densify/thin the prediction grid relative to the DEM grid
            # (``resolution_factor`` parity, e.g. nz_downscaling.py:425)
            n_lat = max(int(round(len(lat) * resolution_factor)), 2)
            n_lon = max(int(round(len(lon) * resolution_factor)), 2)
            lat = np.linspace(float(lat[0]), float(lat[-1]), n_lat)
            lon = np.linspace(float(lon[0]), float(lon[-1]), n_lon)
            target_elev = target_elev._interp_one(
                target_elev.dims[-2], lat, "nearest"
            )._interp_one(target_elev.dims[-1], lon, "nearest")
        xt1 = jnp.asarray(self.dp.map_x1(lat), jnp.float32)
        xt2 = jnp.asarray(self.dp.map_x2(lon), jnp.float32)

        aux_grid = None
        if task.yt_aux is not None:
            if aux_at_targets is None:
                raise ValueError(
                    "model was trained with aux_at_targets; pass the same "
                    "normalised aux Dataset/Field to predict_grid"
                )
            from deepsensornz_tpu.data.grid import Dataset as _DS

            chans = (
                list(aux_at_targets.values())
                if isinstance(aux_at_targets, _DS) else [aux_at_targets]
            )
            cols = []
            for f in chans:
                g = f._interp_one(f.dims[-2], np.asarray(xt1), "linear")
                g = g._interp_one(g.dims[-1], np.asarray(xt2), "linear")
                cols.append(np.nan_to_num(g.data.astype(np.float32)))
            aux = np.stack(cols, -1)
            if aux.shape[-1] != task.yt_aux.shape[-1]:
                raise ValueError(
                    f"aux channel mismatch: task has {task.yt_aux.shape[-1]}, "
                    f"grid aux has {aux.shape[-1]}"
                )
            aux_grid = aux  # (Ht, Wt, C); broadcast per forward-call batch

        # sea cells are NaN-masked below anyway: transfer ONLY land cells
        # (in-graph gather, host scatter) — exact, and cuts the download
        # by the sea fraction (~42 % of the NZ grid)
        land = None
        if sea_mask:
            sea2d = np.isnan(target_elev.data)
            if sea2d.any():
                land = np.flatnonzero(~sea2d.ravel())

        # keep the channel axis: (B, Ht, Wt, dy); dequantize/upcast on host
        mean, std, samples = self._forward_and_fetch(
            task, xt1, xt2, aux_grid, n_samples, seed, outputs, land)

        if post_transform is not None:
            mean, std = post_transform(mean, std)
            if samples is not None:
                samples, _ = post_transform(samples, None)

        if unnormalise:
            scale, offset = self._affines()   # per-channel vectors (dy,)
            mean = mean * scale + offset
            if std is not None:
                std = std * np.abs(scale)
            if samples is not None:
                samples = samples * scale + offset

        # sea cells are already NaN: the land-only gather's host scatter
        # NaN-fills every non-land cell (and with no sea cells there is
        # nothing to mask) — no extra 52M-cell np.where pass needed

        if times is None:
            times = np.arange(task.batch_size)
        dims = ("time", "latitude", "longitude")
        coords = {"time": np.asarray(times), "latitude": lat, "longitude": lon}
        fields = {}
        for c, var in enumerate(self.target_vars):
            # single-channel models keep the historical "mean"/"std" names
            suffix = "" if len(self.target_vars) == 1 else f"_{var}"
            fields[f"mean{suffix}"] = Field(
                mean[..., c].astype(np.float32), dims, coords, f"mean{suffix}",
                {"variable": var})
            if std is not None:
                fields[f"std{suffix}"] = Field(
                    std[..., c].astype(np.float32), dims, coords,
                    f"std{suffix}", {"variable": var})
            if samples is not None:
                fields[f"samples{suffix}"] = Field(
                    samples[..., c].astype(np.float32), ("sample",) + dims,
                    {"sample": np.arange(n_samples), **coords},
                    f"samples{suffix}", {},
                )
        return Prediction(fields)

    def _forward_and_fetch(self, task, xt1, xt2, aux, n_samples: int,
                           seed: int, outputs: tuple = ("mean", "std"),
                           land=None):
        """Gridded forward + device→host fetch, chunked when configured.

        With ``batch_chunk`` set and exceeded, the batch splits into
        fixed-size chunks (tail padded by repeating its last task so every
        chunk runs the SAME compiled program, pad rows trimmed after);
        every chunk's forward is dispatched up front — JAX async dispatch
        queues them on device — and the fetches run on a
        ``download_threads`` pool, so downloads overlap both the remaining
        compute and each other (multiple streams over the host link).
        Joint samples draw per-chunk seeds (``seed + chunk offset``): the
        sampled fields depend on the chunking, the mean/std do not.
        """
        B = task.batch_size
        # upload shaping: drop target-side leaves (unused on the grid path,
        # exact) + optional value compression — see _prepare_grid_task
        task = _prepare_grid_task(task, self.upload_dtype)
        Ht, Wt = xt1.shape[0], xt2.shape[0]
        # the land-cell index vector lives on device ONCE; chunks reuse it
        land_dev = None if land is None else jnp.asarray(land, jnp.int32)

        def expand(a):
            """Scatter a land-gathered (.., L, C) array back into the
            NaN-filled full (.., Ht, Wt, C) map."""
            if a is None or land is None:
                return a
            lead = a.shape[:-2]
            full = np.full(lead + (Ht * Wt, a.shape[-1]), np.nan, a.dtype)
            full[..., land, :] = a
            return full.reshape(lead + (Ht, Wt, a.shape[-1]))

        def brd_aux(b):
            return (None if aux is None
                    else jnp.asarray(np.broadcast_to(aux, (b,) + aux.shape)))

        def fetch(out):
            # f32 end-to-end: the assembled Fields are float32 anyway, and
            # f64 intermediates double every host-side copy/scatter on a
            # month-scale fetch (52M cells × 2 moments)
            return (
                expand(_dequantize_host(out["mean"], np.float32)),
                expand(_dequantize_host(out["std"], np.float32))
                if "std" in out else None,
                expand(_dequantize_host(out["samples"], np.float32))
                if n_samples > 0 else None,
            )

        chunk = self.batch_chunk
        if not chunk or B <= chunk:
            return fetch(self._grid_forward(
                self.params, task, (xt1, xt2, brd_aux(B)), n_samples,
                jnp.asarray(seed), outputs, land_dev))

        from concurrent.futures import ThreadPoolExecutor

        # upload the WHOLE batch once and slice chunks ON DEVICE: per-chunk
        # host→device uploads cost one transfer per pytree leaf per chunk
        # (~20 round trips each over a remote host link — measured to
        # dominate a month's wall); one bulk device_put replaces them all.
        # The per-chunk gather is JITTED (one compiled program reused for
        # every chunk): eager take() costs a relay round trip PER LEAF per
        # chunk (~2 s/chunk measured), jitted it is one dispatch. Fetches
        # are submitted as soon as each chunk is dispatched so downloads
        # overlap the remaining dispatch work as well as the compute.
        t_up = time.perf_counter()
        task = jax.device_put(task)
        # whole-tree sync: the upload must complete before any chunk
        # computes, so this only moves the wait to where it is attributable
        # (a few host-link round trips on a month-scale wall; through a
        # relay that acks early this can still under-report — the
        # device-resident diagnostic split in perf/operational_bench.py is
        # the authoritative upload number)
        jax.block_until_ready(task)
        t_up = time.perf_counter() - t_up
        t_run = time.perf_counter()
        aux_c = brd_aux(chunk)

        # fetch threads write each chunk STRAIGHT into preallocated full
        # month maps (dequantize→scatter fused per chunk, no concat pass
        # over the 52M-cell month at the end); sea cells are NaN-filled by
        # the scatter itself
        def _ch(v):
            return (v["q"] if isinstance(v, dict) else v).shape[-1]

        def write_into(dst, a):
            """dst: contiguous (n, Ht, Wt, C) slice; a: device layout
            ((n, Ht, Wt, C) full or (n, L, C) land-gathered)."""
            if land is None:
                dst[...] = a
            else:
                flat = dst.reshape(dst.shape[0], Ht * Wt, a.shape[-1])
                flat[:] = np.nan
                flat[:, land, :] = a

        mean_full = std_full = samples_full = None

        def fetch_into(out, off):
            n = min(off + chunk, B) - off
            write_into(mean_full[off:off + n],
                       _dequantize_host(out["mean"], np.float32)[:n])
            if std_full is not None:
                write_into(std_full[off:off + n],
                           _dequantize_host(out["std"], np.float32)[:n])
            if samples_full is not None:
                s = _dequantize_host(out["samples"], np.float32)[:, :n]
                for k in range(s.shape[0]):
                    write_into(samples_full[k, off:off + n], s[k])

        futures = []
        with ThreadPoolExecutor(max(self.download_threads, 1)) as ex:
            for off in range(0, B, chunk):
                idx = np.arange(off, min(off + chunk, B))
                if len(idx) < chunk:
                    idx = np.concatenate(
                        [idx, np.full(chunk - len(idx), idx[-1], idx.dtype)])
                out = self._grid_forward(
                    self.params, _take_device(task, idx), (xt1, xt2, aux_c),
                    n_samples, jnp.asarray(seed + off), outputs, land_dev)
                if mean_full is None:
                    mean_full = np.empty((B, Ht, Wt, _ch(out["mean"])),
                                         np.float32)
                    if "std" in out:
                        std_full = np.empty(
                            (B, Ht, Wt, _ch(out["std"])), np.float32)
                    if n_samples > 0:
                        samples_full = np.empty(
                            (n_samples, B, Ht, Wt, _ch(out["samples"])),
                            np.float32)
                futures.append(ex.submit(fetch_into, out, off))
            for f in futures:
                f.result()
        # wall split of the last chunked run: upload vs overlapped
        # dispatch+compute+download (the overlap is the design, so the
        # second bucket is not separable further without serialising it)
        self.last_timings = {"upload_s": round(t_up, 3),
                             "overlap_s": round(time.perf_counter() - t_run, 3)}
        return mean_full, std_full, samples_full

    def predict_points(
        self,
        task: TaskBatch,
        unnormalise: bool = True,
        post_transform=None,
    ) -> dict[str, np.ndarray]:
        """Mean/std at ``task.xt`` (station holdout evaluation path,
        ``validate.py:206-317``). Returns arrays of shape (B, M) for
        single-channel models, (B, M, dy) for ``dim_yt>1``."""
        out = self._point_forward(self.params, task)
        mean = np.asarray(out["mean"], np.float64)
        std = np.asarray(out["std"], np.float64)
        if post_transform is not None:
            mean, std = post_transform(mean, std)
        if unnormalise:
            scale, offset = self._affines()
            mean = mean * scale + offset
            std = std * np.abs(scale)
        mask = np.asarray(task.yt_mask).astype(bool)
        mean = np.where(mask[..., None], mean, np.nan)
        std = np.where(mask[..., None], std, np.nan)
        if len(self.target_vars) == 1:
            mean, std = mean[..., 0], std[..., 0]
        result = {"mean": mean, "std": std, "mask": mask}
        if "p_wet" in out:
            result["p_wet"] = np.where(mask, np.asarray(out["p_wet"], np.float64),
                                       np.nan)
        return result

    def ar_sample_grid(
        self,
        task: TaskBatch,
        target_elev: Field,
        aux_at_targets=None,
        n_samples: int = 1,
        subsample_factor: int = 4,
        n_blocks: int = 8,
        unnormalise: bool = True,
        sea_mask: bool = True,
        seed: int = 0,
    ) -> np.ndarray:
        """Coherent AR samples on the prediction grid.

        deepsensor's ``ar_sample`` + ``ar_subsample_factor`` pattern: AR runs
        on a coarse subset of the grid (every ``subsample_factor``-th cell),
        then each sampled field is interpolated back to the full grid.
        Returns (n_samples, B, Ht, Wt) in physical units.
        """
        from deepsensornz_tpu.infer.ar import ar_sample

        lat = target_elev.coords[target_elev.dims[-2]]
        lon = target_elev.coords[target_elev.dims[-1]]
        lat_c = lat[::subsample_factor]
        lon_c = lon[::subsample_factor]
        x1c = self.dp.map_x1(lat_c).astype(np.float32)
        x2c = self.dp.map_x2(lon_c).astype(np.float32)
        pts = np.stack(np.meshgrid(x1c, x2c, indexing="ij"), -1).reshape(-1, 2)
        M = len(pts)
        B = task.batch_size
        xt = jnp.asarray(np.broadcast_to(pts[None], (B, M, 2)).copy())
        aux = None
        if task.yt_aux is not None:
            A = task.yt_aux.shape[-1]
            if aux_at_targets is not None:
                # real aux channels at the coarse AR grid points, matching
                # what the model was conditioned on during training
                from deepsensornz_tpu.data.grid import Dataset as _DS
                from deepsensornz_tpu.task.loader import interp_grid_at_points

                chans = (
                    list(aux_at_targets.values())
                    if isinstance(aux_at_targets, _DS) else [aux_at_targets]
                )
                cols = [
                    interp_grid_at_points(f, pts[:, 0], pts[:, 1])
                    for f in chans
                ]
                a = np.stack(cols, -1).astype(np.float32)
                if a.shape[-1] != A:
                    raise ValueError(
                        f"aux channel mismatch: task has {A}, grid aux has "
                        f"{a.shape[-1]}"
                    )
                aux = jnp.asarray(np.broadcast_to(a[None], (B, M, A)).copy())
            else:
                aux = jnp.zeros((B, M, A), jnp.float32)
        coarse_task = task.replace(
            xt=xt, yt=jnp.zeros((B, M, self.model.cfg.dim_yt), jnp.float32),
            yt_mask=jnp.ones((B, M), jnp.float32), yt_aux=aux,
        )
        import jax as _jax

        dy = self.model.cfg.dim_yt
        samples = ar_sample(
            self.model, self.params, coarse_task, n_samples=n_samples,
            n_blocks=n_blocks, rng=_jax.random.key(seed),
            std_scale=self.std_scale,
        )  # (S, B, M, dy)
        fields = samples.reshape(n_samples, B, len(lat_c), len(lon_c), dy)
        # upsample back to the full grid: ONE batched separable linear
        # interp over (samples × batch × channels) — two einsums with the
        # per-axis linear weight matrices (same semantics as
        # Field._interp_one('linear'), tested equal), replacing the
        # round-3 triple python loop
        w_lat = _linear_interp_weights(lat_c, lat)
        w_lon = _linear_interp_weights(lon_c, lon)
        out = np.einsum("hi,sbijc,wj->sbhwc", w_lat, np.asarray(fields), w_lon,
                        optimize=True).astype(np.float32)
        if unnormalise:
            scale, offset = self._affines()
            out = out * scale + offset
        if sea_mask:
            sea = np.isnan(target_elev.data)[..., None]
            out = np.where(sea, np.nan, out)
        # historical contract: single-channel models return (S, B, Ht, Wt)
        return out[..., 0] if dy == 1 else out

    def _target_stat_name(self, var: Optional[str] = None) -> str:
        """Resolve the DataProcessor stats entry for a target variable."""
        var = self.target_var if var is None else var
        if var in self.dp.config:
            return var
        hits = [k for k in self.dp.config if k.startswith(var)]
        if len(hits) == 1:
            return hits[0]
        if hits:
            # an arbitrary pick here would silently unnormalise with the
            # wrong variable's stats
            raise KeyError(
                f"target {var!r} matches multiple stats entries "
                f"{hits}; use the exact name"
            )
        raise KeyError(
            f"no normalisation stats for target {var!r}; "
            f"have {list(self.dp.config)}"
        )

    def _affines(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-channel (scale, offset) vectors, shape (dim_yt,)."""
        pairs = [_affine_for(self.dp, self._target_stat_name(v))
                 for v in self.target_vars]
        return (np.asarray([p[0] for p in pairs], np.float64),
                np.asarray([p[1] for p in pairs], np.float64))

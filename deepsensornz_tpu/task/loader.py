"""TaskLoader: assemble fixed-shape TaskBatches from normalised data.

Engine parity (``deepsensor.data.TaskLoader``; reference call sites
``nzdownscale/downscaler/train.py:120-216,308-334`` and the subclass
``TaskLoader_SampleStations`` at ``train.py:525-637``):

- holds N context sets (gridded Fields/Datasets or station DataFrames) and a
  target set, plus ``aux_at_targets`` (highres topography sampled at target
  points → ``Y_t_aux``),
- callable on a timestamp or list of timestamps, with per-set
  ``context_sampling`` strategies: ``"all"``, float fraction, int count,
  ``"random"`` (fresh uniform fraction per task, ``train.py:311-314``), and
  ``"split"`` (sampled station subset becomes context, the complement
  becomes targets — the reference's ``sample_df``, ``train.py:529-558``),
- ``seed_override`` / ``datewise_deterministic`` seeding (``train.py:578-583``),
- picklable; context/target data may be swapped in place for operational
  inference (``validate_ERA.py:117-127``, ``validate_WRF.py:324-345``).

TPU-first difference: the output is a static-shape :class:`TaskBatch`
(padded points + masks) rather than a ragged dict, so one compiled program
serves every date — no station-count bucketing (``train.py:448-475``).
"""

from __future__ import annotations

import contextlib
import hashlib
from typing import Optional, Sequence

import numpy as np

from deepsensornz_tpu.data.grid import Dataset, Field
from deepsensornz_tpu.ops.grids import internal_grid
from deepsensornz_tpu.task.task import GridContext, PointContext, TaskBatch, pad_points

try:
    import pandas as pd
except Exception:  # pragma: no cover
    pd = None


def _round_up(n: int, m: int) -> int:
    return max(((n + m - 1) // m) * m, m)


def _is_frame(obj) -> bool:
    return pd is not None and isinstance(obj, pd.DataFrame)


def _grid_channels(entry) -> list[Field]:
    if isinstance(entry, Field):
        return [entry]
    if isinstance(entry, Dataset):
        return list(entry.values())
    raise TypeError(f"unsupported gridded context type {type(entry)}")


def _frame_value_cols(df) -> list[str]:
    skip = {"time", "x1", "x2", "station_id", "station_name", "elevation",
            "latitude", "longitude"}
    return [c for c in df.columns if c not in skip and np.issubdtype(df[c].dtype, np.number)]


def interp_grid_at_points(field: Field, x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """Bilinear interpolation of a (x1, x2) Field at scattered points."""
    g1 = field.coords[field.dims[-2]].astype(np.float64)
    g2 = field.coords[field.dims[-1]].astype(np.float64)
    s1 = np.argsort(g1)
    s2 = np.argsort(g2)
    d = np.take(np.take(np.nan_to_num(field.data), s1, -2), s2, -1)
    g1s, g2s = g1[s1], g2[s2]

    def locate(g, p):
        i = np.clip(np.searchsorted(g, p), 1, len(g) - 1)
        w = np.clip((p - g[i - 1]) / np.maximum(g[i] - g[i - 1], 1e-12), 0, 1)
        return i - 1, w

    i1, w1 = locate(g1s, np.asarray(x1, np.float64))
    i2, w2 = locate(g2s, np.asarray(x2, np.float64))
    v00 = d[..., i1, i2]
    v01 = d[..., i1, i2 + 1]
    v10 = d[..., i1 + 1, i2]
    v11 = d[..., i1 + 1, i2 + 1]
    return (
        v00 * (1 - w1) * (1 - w2)
        + v01 * (1 - w1) * w2
        + v10 * w1 * (1 - w2)
        + v11 * w1 * w2
    )


class TaskLoader:
    """Build device-ready TaskBatches from normalised contexts/targets."""

    def __init__(
        self,
        context: Sequence,
        target,
        aux_at_targets: Optional[Dataset | Field] = None,
        aux_at_contexts: Optional[Dataset | Field] = None,
        context_sampling="all",
        target_sampling="all",
        links: Optional[Sequence[tuple[int, int]]] = None,
        delta_t: Optional[Sequence[int]] = None,
        internal_density: float = 500.0,
        grid_margin: float = 0.1,
        grid_multiple: int = 16,
        point_capacity: Optional[int] = None,
        target_capacity: Optional[int] = None,
        split_frac: float = 0.5,
    ):
        """``delta_t``: per-context-set time lag in days — context set i is
        sliced at ``date + delta_t[i]`` (engine TaskLoader ``delta_t``
        parity). ``aux_at_contexts``: gridded aux channels gathered at every
        off-grid context point and appended to its values (engine parity;
        gather at ``train.py:614-625``)."""
        self.context = list(context)
        self.target = target
        self.aux_at_targets = aux_at_targets
        self.aux_at_contexts = aux_at_contexts
        self.delta_t = list(delta_t) if delta_t is not None else [0] * len(self.context)
        if len(self.delta_t) != len(self.context):
            raise ValueError("delta_t must have one entry per context set")
        if isinstance(context_sampling, (str, float, int)):
            context_sampling = [context_sampling] * len(self.context)
        self.context_sampling = list(context_sampling)
        self.target_sampling = target_sampling
        self.links = list(links or [])
        self.internal_density = float(internal_density)
        self.grid_margin = grid_margin
        self.grid_multiple = grid_multiple
        self.split_frac = split_frac

        self.context_var_IDs = [
            [f.name for f in _grid_channels(c)] if not _is_frame(c) else _frame_value_cols(c)
            for c in self.context
        ]
        self.target_var_IDs = (
            _frame_value_cols(target) if _is_frame(target) else [f.name for f in _grid_channels(target)]
        )

        self._rebuild_static()
        if point_capacity is not None:
            self.point_capacity = point_capacity
        if target_capacity is not None:
            self.target_capacity = target_capacity
        self._flat_cache: dict = {}

    # -- static geometry -------------------------------------------------------

    def _rebuild_static(self) -> None:
        """(Re)derive internal grid + capacities from current data.

        Call after in-place context/target swaps (operational inference).
        """
        x1_lo, x1_hi, x2_lo, x2_hi = np.inf, -np.inf, np.inf, -np.inf
        for entry in list(self.context) + [self.target]:
            if _is_frame(entry):
                if len(entry):
                    x1_lo = min(x1_lo, entry["x1"].min())
                    x1_hi = max(x1_hi, entry["x1"].max())
                    x2_lo = min(x2_lo, entry["x2"].min())
                    x2_hi = max(x2_hi, entry["x2"].max())
            else:
                for f in _grid_channels(entry):
                    c1 = f.coords[f.dims[-2]]
                    c2 = f.coords[f.dims[-1]]
                    x1_lo, x1_hi = min(x1_lo, c1.min()), max(x1_hi, c1.max())
                    x2_lo, x2_hi = min(x2_lo, c2.min()), max(x2_hi, c2.max())
        self.x1g, self.x2g = internal_grid(
            (x1_lo, x1_hi), (x2_lo, x2_hi),
            self.internal_density, self.grid_margin, self.grid_multiple,
        )
        # station capacity: max simultaneous rows over time, rounded up.
        # Never SHRINK an existing capacity: stable static shapes mean the
        # compiled train/predict programs survive operational data swaps
        # (month-to-month station availability would otherwise retrigger
        # compilation).
        caps = []
        for entry in list(self.context) + [self.target]:
            if _is_frame(entry) and len(entry):
                caps.append(int(entry.groupby("time").size().max()))
        cap = _round_up(max(caps, default=8), 8)
        self.point_capacity = max(cap, getattr(self, "point_capacity", 0))
        self.target_capacity = max(cap, getattr(self, "target_capacity", 0))
        # invalidate the fast-path flat cache: data may have been swapped
        self._flat_cache = {}

    @contextlib.contextmanager
    def swap_data(self, context=None, target=None):
        """Temporarily swap the loader's context/target data in place.

        The supported API for operational inference against a trained
        loader (reference mutates a pickled loader's ``.context`` before
        predicting, ``validate_ERA.py:117-127``): swaps the data, rederives
        the static geometry (the internal grid; capacities never shrink, so
        compiled programs survive the swap), and restores the originals —
        including variable-ID lists — on exit.

        ``context`` must have the same number of sets as the loader was
        built with (``delta_t``/``context_sampling`` are per-set).
        """
        if context is not None and len(context) != len(self.context):
            raise ValueError(
                f"swap_data context must have {len(self.context)} sets, "
                f"got {len(context)}"
            )
        saved = (self.context, self.target,
                 self.context_var_IDs, self.target_var_IDs)
        try:
            if context is not None:
                self.context = list(context)
                self.context_var_IDs = [
                    [f.name for f in _grid_channels(c)]
                    if not _is_frame(c) else _frame_value_cols(c)
                    for c in self.context
                ]
            if target is not None:
                self.target = target
                self.target_var_IDs = (
                    _frame_value_cols(target) if _is_frame(target)
                    else [f.name for f in _grid_channels(target)]
                )
            self._rebuild_static()
            yield self
        finally:
            (self.context, self.target,
             self.context_var_IDs, self.target_var_IDs) = saved
            self._rebuild_static()

    # -- seeding ------------------------------------------------------------------

    @staticmethod
    def _seed_for(date, seed_override, datewise_deterministic) -> Optional[int]:
        if seed_override is not None:
            return int(seed_override)
        if datewise_deterministic:
            h = hashlib.md5(str(np.datetime64(date)).encode()).hexdigest()
            return int(h[:8], 16)
        return None

    # -- task generation -------------------------------------------------------------

    def __call__(
        self,
        dates,
        context_sampling=None,
        target_sampling=None,
        seed_override=None,
        datewise_deterministic: bool = False,
    ) -> TaskBatch:
        """Materialise a TaskBatch for one date or a list of dates."""
        import jax.numpy as jnp

        single = not isinstance(dates, (list, tuple, np.ndarray))
        date_list = [dates] if single else list(dates)
        sampling = self.context_sampling if context_sampling is None else (
            [context_sampling] * len(self.context)
            if isinstance(context_sampling, (str, float, int)) else list(context_sampling)
        )
        tgt_sampling = self.target_sampling if target_sampling is None else target_sampling

        fast = self._fast_call(date_list, sampling, tgt_sampling)
        if fast is not None:
            return fast

        grids: list[list[np.ndarray]] = [[] for _ in self.context]
        grid_specs: list[tuple] = [None] * len(self.context)
        pts_x: dict[int, list] = {}
        pts_y: dict[int, list] = {}
        pts_m: dict[int, list] = {}
        xt_l, yt_l, ytm_l, aux_l = [], [], [], []

        linked_ctx = {c for c, _ in self.links}

        for date in date_list:
            seed = self._seed_for(date, seed_override, datewise_deterministic)
            rng = np.random.default_rng(seed)
            split_context_ids = None  # station ids chosen as context this task

            # --- point context sets first (split decides targets) -----------
            for ci, entry in enumerate(self.context):
                if not _is_frame(entry):
                    continue
                date_eff = np.datetime64(date) + np.timedelta64(self.delta_t[ci], "D")
                rows = self._rows_at(entry, date_eff)
                # drop rows with any non-finite value — reference semantics
                # (train.py:530 ``df.dropna(how='any')``); a NaN station
                # reading must never become a valid observation of 0
                vals = rows[self.context_var_IDs[ci]].to_numpy(np.float32)
                finite = np.isfinite(vals).all(-1)
                if not finite.all():
                    rows = rows.iloc[np.nonzero(finite)[0]]
                strat = sampling[ci]
                if ci in linked_ctx or strat == "split":
                    n_ctx = max(int(round(self.split_frac * len(rows))), 1)
                    perm = rng.permutation(len(rows))
                    ctx_rows = rows.iloc[perm[:n_ctx]]
                    split_context_ids = set(
                        zip(ctx_rows["x1"].round(9), ctx_rows["x2"].round(9))
                    )
                    rows = ctx_rows
                elif strat == "all" or strat is True:
                    pass
                elif strat == "random":
                    frac = rng.random()  # fresh fraction per task (train.py:311-314)
                    rows = rows.sample(frac=frac, random_state=rng.integers(2**31))
                elif isinstance(strat, float) and not isinstance(strat, bool):
                    rows = rows.sample(frac=strat, random_state=rng.integers(2**31))
                elif isinstance(strat, (int, np.integer)) and not isinstance(strat, bool):
                    n = min(int(strat), len(rows))
                    rows = rows.sample(n=n, random_state=rng.integers(2**31))
                else:
                    raise ValueError(f"unknown context_sampling {strat!r}")
                cols = self.context_var_IDs[ci]
                x = rows[["x1", "x2"]].to_numpy(np.float32)
                y = rows[cols].to_numpy(np.float32)
                if self.aux_at_contexts is not None:
                    aux_cols = [
                        interp_grid_at_points(f, x[:, 0], x[:, 1])
                        for f in _grid_channels(self.aux_at_contexts)
                    ]
                    if aux_cols:
                        y = np.concatenate(
                            [y, np.stack(aux_cols, -1).astype(np.float32)], axis=-1
                        )
                xp, yp, m = pad_points(x, y, self.point_capacity)
                pts_x.setdefault(ci, []).append(xp)
                pts_y.setdefault(ci, []).append(yp)
                pts_m.setdefault(ci, []).append(m)

            # --- gridded context sets -----------------------------------------
            for ci, entry in enumerate(self.context):
                if _is_frame(entry):
                    continue
                chans = []
                spec = None
                date_eff = np.datetime64(date) + np.timedelta64(self.delta_t[ci], "D")
                for f in _grid_channels(entry):
                    sl = f.sel(time=date_eff, method="nearest") if "time" in f.dims else f
                    chans.append(np.nan_to_num(sl.data.astype(np.float32)))
                    spec = (sl.coords[sl.dims[-2]].astype(np.float32),
                            sl.coords[sl.dims[-1]].astype(np.float32))
                grids[ci].append(np.stack(chans, -1))
                grid_specs[ci] = spec

            # --- targets ----------------------------------------------------------
            t_rows = self._rows_at(self.target, date)
            if split_context_ids is not None or tgt_sampling == "split":
                if split_context_ids is None:
                    raise ValueError("target 'split' requires a linked station context")
                keys = list(zip(t_rows["x1"].round(9), t_rows["x2"].round(9)))
                keep = [k not in split_context_ids for k in keys]
                t_rows = t_rows.iloc[np.nonzero(keep)[0]]
            xt = t_rows[["x1", "x2"]].to_numpy(np.float32)
            yt = t_rows[self.target_var_IDs].to_numpy(np.float32)
            ok = np.isfinite(yt).all(-1)
            xt, yt = xt[ok], yt[ok]
            xtp, ytp, mt = pad_points(xt, yt, self.target_capacity)
            xt_l.append(xtp)
            yt_l.append(ytp)
            ytm_l.append(mt)

            if self.aux_at_targets is not None:
                aux_ch = [
                    interp_grid_at_points(f, xtp[:, 0], xtp[:, 1])
                    for f in _grid_channels(self.aux_at_targets)
                ]
                aux_l.append(np.stack(aux_ch, -1).astype(np.float32))

        grid_ctx = tuple(
            GridContext(
                x1=jnp.asarray(grid_specs[ci][0]),
                x2=jnp.asarray(grid_specs[ci][1]),
                y=jnp.asarray(np.stack(grids[ci])),
            )
            for ci in range(len(self.context)) if grids[ci]
        )
        point_ctx = tuple(
            PointContext(
                x=jnp.asarray(np.stack(pts_x[ci])),
                y=jnp.asarray(np.stack(pts_y[ci])),
                mask=jnp.asarray(np.stack(pts_m[ci])),
            )
            for ci in sorted(pts_x)
        )
        return TaskBatch(
            grids=grid_ctx,
            points=point_ctx,
            xt=jnp.asarray(np.stack(xt_l)),
            yt=jnp.asarray(np.stack(yt_l)),
            yt_mask=jnp.asarray(np.stack(ytm_l)),
            yt_aux=jnp.asarray(np.stack(aux_l)) if aux_l else None,
            x1g=jnp.asarray(self.x1g),
            x2g=jnp.asarray(self.x2g),
        )

    # -- native fast path ---------------------------------------------------------

    def _fast_call(self, date_list, sampling, tgt_sampling):
        """Batch-pack all dates in one native pass (operational hot path:
        ~720 tasks per monthly predict call, ``validate_ERA.py:79``).

        Handles the common configuration — every sampling strategy "all",
        no split links, no aux_at_contexts. Returns None to fall back.
        """
        from deepsensornz_tpu.native.taskpack import (
            available, interp_grid_points_native, pack_station_batches,
        )

        if not available() or len(date_list) == 0:
            return None
        if tgt_sampling != "all" or self.links or self.aux_at_contexts is not None:
            return None
        for ci, entry in enumerate(self.context):
            if _is_frame(entry) and sampling[ci] != "all" and sampling[ci] is not True:
                return None
        import jax.numpy as jnp

        dates = np.asarray(
            [np.datetime64(d, "s") for d in date_list], dtype="datetime64[s]"
        )

        if not hasattr(self, "_flat_cache"):
            self._flat_cache = {}

        def flat(df, key):
            # cache holds a strong reference to the source frame and is
            # validated by identity: a swapped-in frame (operational path,
            # pipeline/validate.py) can never be served a stale entry even
            # if id() is recycled after GC. _rebuild_static also clears it.
            cached = self._flat_cache.get(key)
            if cached is not None and cached[0] is df:
                return cached[1]
            cols = _frame_value_cols(df)
            t = df["time"].to_numpy().astype("datetime64[s]")
            x1 = df["x1"].to_numpy(np.float32)
            x2 = df["x2"].to_numpy(np.float32)
            v = df[cols].to_numpy(np.float32)
            # drop rows with any non-finite value (reference train.py:530
            # dropna semantics) — for contexts AND targets alike: a NaN
            # reading must never enter the encoder as a valid 0
            ok = np.isfinite(v).all(-1)
            if not ok.all():
                t, x1, x2, v = t[ok], x1[ok], x2[ok], v[ok]
            self._flat_cache[key] = (df, (t, x1, x2, v))
            return t, x1, x2, v

        # point context sets
        points = []
        for ci, entry in enumerate(self.context):
            if not _is_frame(entry):
                continue
            t, x1, x2, v = flat(entry, f"ctx{ci}")
            dts = self._align_times(t, dates + np.timedelta64(self.delta_t[ci], "D"))
            packed = pack_station_batches(t, x1, x2, v, dts, self.point_capacity)
            if packed is None:
                return None
            px, py, pm, _ = packed
            points.append(PointContext(
                x=jnp.asarray(px), y=jnp.asarray(py), mask=jnp.asarray(pm)
            ))

        # targets
        t, x1, x2, v = flat(self.target, "tgt")
        packed = pack_station_batches(
            t, x1, x2, v, self._align_times(t, dates), self.target_capacity
        )
        if packed is None:
            return None
        xt, yt, ytm, _ = packed

        # aux at targets via the native bilinear gather
        yt_aux = None
        if self.aux_at_targets is not None:
            chans = []
            flat_x1 = xt[..., 0].ravel().astype(np.float64)
            flat_x2 = xt[..., 1].ravel().astype(np.float64)
            for f in _grid_channels(self.aux_at_targets):
                g1 = f.coords[f.dims[-2]].astype(np.float64)
                g2 = f.coords[f.dims[-1]].astype(np.float64)
                s1, s2 = np.argsort(g1), np.argsort(g2)
                grid = np.take(np.take(f.data, s1, -2), s2, -1).astype(np.float32)
                out = interp_grid_points_native(grid, g1[s1], g2[s2], flat_x1, flat_x2)
                if out is None:
                    return None
                chans.append(out.reshape(xt.shape[:2]))
            yt_aux = jnp.asarray(np.stack(chans, -1))

        # gridded context sets: vectorised nearest-time gather
        grids = []
        for ci, entry in enumerate(self.context):
            if _is_frame(entry):
                continue
            dts = dates + np.timedelta64(self.delta_t[ci], "D")
            chans = []
            spec = None
            for f in _grid_channels(entry):
                if "time" in f.dims:
                    ft = f.coords["time"].astype("datetime64[s]").astype(np.int64)
                    order = np.argsort(ft)
                    want = dts.astype(np.int64)
                    pos = np.clip(np.searchsorted(ft[order], want), 1, len(ft) - 1)
                    left, right = ft[order][pos - 1], ft[order][pos]
                    pick = order[np.where(np.abs(want - left) <= np.abs(right - want),
                                          pos - 1, pos)]
                    data = np.nan_to_num(
                        np.take(f.data, pick, axis=f.axis("time")).astype(np.float32)
                    )
                else:
                    data = np.broadcast_to(
                        np.nan_to_num(f.data.astype(np.float32)),
                        (len(dates),) + f.data.shape,
                    )
                chans.append(data)
                spec = (f.coords[f.dims[-2]].astype(np.float32),
                        f.coords[f.dims[-1]].astype(np.float32))
            grids.append(GridContext(
                x1=jnp.asarray(spec[0]), x2=jnp.asarray(spec[1]),
                y=jnp.asarray(np.stack(chans, -1)),
            ))

        return TaskBatch(
            grids=tuple(grids), points=tuple(points),
            xt=jnp.asarray(xt), yt=jnp.asarray(yt), yt_mask=jnp.asarray(ytm),
            yt_aux=yt_aux,
            x1g=jnp.asarray(self.x1g), x2g=jnp.asarray(self.x2g),
        )

    @staticmethod
    def _align_times(frame_times: np.ndarray, queries: np.ndarray) -> np.ndarray:
        """Map query timestamps onto a frame's native time resolution.

        Exact matches pass through untouched. A query with no exact match
        whose calendar day IS present in the frame snaps to the frame's
        nearest timestamp within that day — a loader built from
        daily-resampled stations queried at hourly base times (or vice
        versa) would otherwise silently yield empty context/target sets.
        The reference aligns by resampled index (``train.py:593-596``).
        Queries whose whole day is absent stay unchanged (genuinely
        missing data → empty set is correct).
        """
        if len(frame_times) == 0 or len(queries) == 0:
            return queries
        uniq = np.unique(frame_times)
        exact = np.isin(queries, uniq)
        if exact.all():
            return queries
        # snapped values are FRAME timestamps — carry the frame's time unit,
        # or assigning [s] values into a [D] query array would silently
        # truncate the snap back to day resolution (a no-op)
        out = queries.astype(uniq.dtype).copy()
        miss = np.nonzero(~exact)[0]
        q = queries[miss]
        # nearest frame timestamp WITHIN the query's calendar day only
        uniq_days = uniq.astype("datetime64[D]")
        q_days = q.astype("datetime64[D]")
        lo = np.searchsorted(uniq_days, q_days, side="left")
        hi = np.searchsorted(uniq_days, q_days, side="right")
        same_day = hi > lo
        lo_c = np.minimum(lo, len(uniq) - 1)
        hi_c = np.maximum(hi - 1, 0)
        ins = np.searchsorted(uniq, q)
        li = np.clip(ins - 1, lo_c, hi_c)
        ri = np.clip(ins, lo_c, hi_c)
        nearest = np.where(
            np.abs(q - uniq[li]) <= np.abs(uniq[ri] - q), uniq[li], uniq[ri]
        )
        if same_day.any():
            import warnings

            warnings.warn(
                "TaskLoader: query timestamps do not exactly match the "
                "station frame's time resolution; snapping to the frame's "
                "nearest same-day timestamps (daily/hourly mismatch).",
                stacklevel=3,
            )
            out[miss[same_day]] = nearest[same_day]
        return out

    @staticmethod
    def _rows_at(df, date):
        t = np.datetime64(date, "s")
        times = df["time"].to_numpy().astype("datetime64[s]")
        idx = np.nonzero(times == t)[0]
        if len(idx) == 0 and len(times):
            t2 = TaskLoader._align_times(times, np.asarray([t]))[0]
            if t2 != t:
                idx = np.nonzero(times == t2)[0]
        return df.iloc[idx]

    # -- dims used by ConvNP construction ------------------------------------------

    def context_dims(self) -> list[int]:
        n_aux_c = (
            len(_grid_channels(self.aux_at_contexts))
            if self.aux_at_contexts is not None else 0
        )
        return [
            len(ids) + (n_aux_c if _is_frame(self.context[i]) else 0)
            for i, ids in enumerate(self.context_var_IDs)
        ]

    def target_dim(self) -> int:
        return len(self.target_var_IDs)

    def aux_dim(self) -> int:
        if self.aux_at_targets is None:
            return 0
        return len(_grid_channels(self.aux_at_targets))

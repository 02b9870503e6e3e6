"""Validation layer: run reconstruction, holdout metrics, baselines.

Rebuild of the reference validation stack:

- :func:`load_run` — reconstruct a trained run from its artifact directory
  (``ValidateV1._load_pretrained_model``, ``nzdownscale/downscaler/
  validate.py:81-204``; artifact layout from ``train.py:409-417`` /
  ``validate_ERA.py:19-44``),
- :class:`Validate` — research validation: predictions at station holdouts
  with ``seed_override=42`` (``validate.py:1084-1118``), per-station RMSE of
  the predicted mean at the station location vs obs
  (``calculate_loss``, ``validate.py:206-317``), base-field-at-station
  baseline RMSE (``calculate_loss_era5``, ``validate.py:319-412``),
  station-availability scan (``validate.py:474-509``),
- :class:`ValidateERA` — operational gridded inference: prediction grid =
  DEM coarsened by the training highres factor, sea-mask from DEM NaNs,
  data loaded for exactly the requested timestamps and swapped into the
  persisted TaskLoader (``validate_ERA.py:19-127``),
- :class:`ValidateWRF` — forecast-cycle inference against the saved
  normalisation (``validate_WRF.py:24-239``).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional, Sequence

import numpy as np

from deepsensornz_tpu import config as cfg
from deepsensornz_tpu.data.features import rmse
from deepsensornz_tpu.data.grid import Field
from deepsensornz_tpu.data.processor import DataProcessor
from deepsensornz_tpu.infer.predict import Predictor
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig
from deepsensornz_tpu.train.checkpoint import load_checkpoint

try:
    import pandas as pd
except Exception:  # pragma: no cover
    pd = None


def load_run(model_dir: str) -> dict:
    """Load {model, params, task_loader, data_processor, metadata} from a
    training-run directory."""
    import jax

    with open(os.path.join(model_dir, "task_loader.pkl"), "rb") as f:
        task_loader = pickle.load(f)
    dp = DataProcessor.load(os.path.join(model_dir, "data_processor.json"))
    with open(os.path.join(model_dir, "metadata.json")) as f:
        metadata = json.load(f)
    kw = metadata.get("convnp_kwargs", {})
    var = metadata.get("data_settings", {}).get("variable", "temperature")
    mc = metadata.get("model_config")
    if mc:
        mc = dict(mc)
        mc["unet_channels"] = tuple(mc["unet_channels"])
        model_cfg = ConvNPConfig(**mc)
    else:
        model_cfg = ConvNPConfig(
            unet_channels=tuple(kw.get("unet_channels", cfg.CONVNP_KWARGS_DEFAULT["unet_channels"])),
            likelihood=kw.get("likelihood", cfg.LIKELIHOODS.get(var, "cnp")),
            internal_density=kw.get("internal_density", cfg.CONVNP_KWARGS_DEFAULT["internal_density"]),
            dim_yt=task_loader.target_dim(),
            sigmoid_output=(var == "humidity" and kw.get("likelihood") in ("cnp", "gnp")),
        )
    model = ConvNP(model_cfg)
    # template init on one materialised task, then overwrite from checkpoint
    first_time = _first_time(task_loader)
    example = task_loader([first_time], seed_override=0)
    template = model.init(jax.random.key(0), example)
    params = load_checkpoint(model_dir, template)["params"]
    return {
        "model": model,
        "params": params,
        "task_loader": task_loader,
        "data_processor": dp,
        "metadata": metadata,
        "variable": var,
        # post-hoc uncertainty recalibration fit at train time
        # (Train.train_model(recalibrate=...)); 1.0 when absent
        "std_scale": float(metadata.get("std_scale", 1.0)),
    }


def _first_time(task_loader):
    for entry in list(task_loader.context) + [task_loader.target]:
        if hasattr(entry, "columns"):
            return entry["time"].iloc[0]
        for f in (entry.values() if hasattr(entry, "values") and not isinstance(entry, Field) else [entry]):
            if "time" in f.dims:
                return f.coords["time"][0]
    raise ValueError("no time coordinate found in task loader data")


def humidity_post_transform(mean, std):
    """[0,1] model space → [-1,1] min_max space before unnormalisation
    (inverse of the preprocess shift, ``preprocess.py:233-235``)."""
    from deepsensornz_tpu.data.features import shift_humidity_from_unit_interval

    mean = shift_humidity_from_unit_interval(mean)
    std = None if std is None else np.asarray(std) * 2.0
    return mean, std


def post_transform_for(variable: str):
    return humidity_post_transform if variable == "humidity" else None


def _nearest_index(coord: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Index of the nearest ``coord`` entry for each query (any coord order)."""
    coord = np.asarray(coord, np.float64)
    query = np.asarray(query, np.float64)
    if len(coord) == 1:
        return np.zeros(len(query), np.intp)
    order = np.argsort(coord)
    cs = coord[order]
    pos = np.clip(np.searchsorted(cs, query), 1, len(cs) - 1)
    pick = np.where(np.abs(query - cs[pos - 1]) <= np.abs(cs[pos] - query),
                    pos - 1, pos)
    return order[pick]


def remove_stations_from_frame(df, station_names: Sequence[str]):
    """Holdout filter (``validate.py:1120-1142``); matches ``station_name``
    when present, else ``station_id`` (string-compared)."""
    if not station_names:
        return df
    wanted = {str(s) for s in station_names}
    if "station_name" in df.columns:
        keep = ~df["station_name"].astype(str).isin(wanted)
    elif "station_id" in df.columns:
        keep = ~df["station_id"].astype(str).isin(wanted)
    else:
        return df
    return df[keep].reset_index(drop=True)


def registry_elevation_lookup(max_dist_deg: float = 0.02):
    """Elevation resolver backed by the shipped station registry
    (``config.station_registry``): nearest station within ``max_dist_deg``
    (~2 km), else None."""
    reg = cfg.station_registry()
    entries = [
        (v["latitude"], v["longitude"], v["elevation"])
        for v in reg.values() if v["elevation"] is not None
    ]
    lats = np.asarray([e[0] for e in entries])
    lons = np.asarray([e[1] for e in entries])
    elevs = np.asarray([e[2] for e in entries])

    def lookup(lat: float, lon: float):
        d2 = np.square(lats - lat) + np.square(lons - lon)
        i = int(np.argmin(d2))
        return float(elevs[i]) if d2[i] <= max_dist_deg**2 else None

    return lookup


class Validate:
    """Research validation against held-out stations (ValidateV1 parity)."""

    def __init__(self, model_dir: Optional[str] = None, run: Optional[dict] = None):
        self.run = run or load_run(model_dir)
        self.predictor = Predictor(
            self.run["model"], self.run["params"], self.run["data_processor"],
            # full ID list: dim_yt>1 artifacts (e.g. joint wind u+v) need one
            # name per channel; Predictor handles both 1- and N-long lists
            self.run["task_loader"].target_var_IDs,
            std_scale=self.run.get("std_scale", 1.0),
        )

    @property
    def task_loader(self):
        return self.run["task_loader"]

    def _unnormalise_obs(self, yt: np.ndarray) -> np.ndarray:
        """Observed (normalised) targets (..., M, dy) → physical units,
        each channel through its OWN variable's affine (the Predictor's
        per-channel ``_affines``) — dim_yt>1 artifacts (e.g. joint wind
        u+v) score every channel with the right stats, not channel 0's."""
        yt = np.asarray(yt, np.float64)
        if self.run["variable"] == "humidity":
            yt = yt * 2.0 - 1.0  # undo the unit-interval shift first
        scale, offset = self.predictor._affines()  # (dy,), (dy,)
        return yt * scale + offset

    @staticmethod
    def _as_channels(arr: np.ndarray, dy: int) -> np.ndarray:
        """(B, M) single-channel arrays → (B, M, 1); (B, M, dy) unchanged."""
        arr = np.asarray(arr, np.float64)
        return arr[..., None] if arr.ndim == 2 and dy >= 1 else arr

    def _make_tasks(self, dates, remove_stations: Sequence[str] = (),
                    seed_override: int = 42):
        """Tasks for the given dates with the listed stations removed from
        the CONTEXT only (they stay targets → true holdout skill;
        ``validate.py:1084-1118``)."""
        tl = self.task_loader
        saved_context = list(tl.context)
        try:
            if remove_stations:
                tl.context = [
                    remove_stations_from_frame(c, remove_stations)
                    if hasattr(c, "columns") else c
                    for c in tl.context
                ]
            return tl(list(dates), seed_override=seed_override)
        finally:
            tl.context = saved_context

    def get_predictions(
        self,
        dates,
        remove_stations: Sequence[str] = (),
        seed_override: int = 42,
    ):
        """Mean/std at station targets for the given dates (holdout
        stations removed from context)."""
        task = self._make_tasks(dates, remove_stations, seed_override)
        out = self.predictor.predict_points(
            task, post_transform=post_transform_for(self.run["variable"])
        )
        out["xt"] = np.asarray(task.xt)
        out["yt"] = np.asarray(task.yt)
        return out

    def calculate_loss(self, dates, remove_stations: Sequence[str] = ()) -> dict:
        """Per-station RMSE between predicted mean and observation, in
        physical units (``validate.py:206-317``). Every target channel is
        scored with its own stats; ``per_channel`` keys the breakdown by
        ``target_var_IDs``. Single-channel models keep the legacy (B, M)
        array shapes; dim_yt>1 returns (B, M, dy)."""
        pred = self.get_predictions(dates, remove_stations)
        obs = self._unnormalise_obs(pred["yt"])          # (B, M, dy)
        dy = obs.shape[-1]
        mask = pred["mask"]
        mean = self._as_channels(pred["mean"], dy)
        err = np.where(mask[..., None], mean - obs, np.nan)
        obs_m = np.where(mask[..., None], obs, np.nan)
        per_channel = {
            vid: {
                "rmse": float(np.sqrt(np.nanmean(err[..., c] ** 2))),
                "mae": float(np.nanmean(np.abs(err[..., c]))),
                "bias": float(np.nanmean(err[..., c])),
            }
            for c, vid in enumerate(self.task_loader.target_var_IDs)
        }
        squeeze = dy == 1
        return {
            "rmse": float(np.sqrt(np.nanmean(err**2))),
            "mae": float(np.nanmean(np.abs(err))),
            "bias": float(np.nanmean(err)),
            "per_channel": per_channel,
            "errors": err[..., 0] if squeeze else err,
            "pred_mean": mean[..., 0] if squeeze else mean,
            "obs": obs_m[..., 0] if squeeze else obs_m,
            "xt": pred["xt"],
        }

    def elevation_band_errors(
        self,
        dates,
        remove_stations: Sequence[str] = (),
        bands: Sequence[tuple] = (
            ("Low (<500m)", None, 500.0),
            ("Mid (500m - 1000m)", 500.0, 1000.0),
            ("High (>1000m)", 1000.0, None),
        ),
        elevation_lookup=None,
        errors: Optional[np.ndarray] = None,
        xt: Optional[np.ndarray] = None,
    ) -> dict:
        """Per-station RMSE grouped by station elevation band — elevation is
        the core covariate of a downscaler, and this is the reference's
        strongest model diagnostic (``validation_notebook.py:721-778``).

        ``elevation_lookup(lat, lon) -> float|None`` resolves a station's
        elevation; the default matches the nearest entry of the shipped
        station registry (``config.station_registry``) within ~2 km.
        ``errors``/``xt`` let callers band a precomputed error set (e.g. a
        baseline's) instead of re-predicting.

        Returns ``{"bands": {label: [per-station rmse]}, "stations":
        {(lat, lon): {"rmse", "elevation", "band"}}}``.
        """
        if errors is None or xt is None:
            loss = self.calculate_loss(dates, remove_stations)
            errors, xt = loss["errors"], loss["xt"]
        if elevation_lookup is None:
            elevation_lookup = registry_elevation_lookup()
        dp = self.run["data_processor"]
        lat = np.asarray(dp.unmap_x1(xt[..., 0]))
        lon = np.asarray(dp.unmap_x2(xt[..., 1]))

        # group target slots into stations by (rounded) coordinate identity
        per_station: dict[tuple, list] = {}
        errors = np.asarray(errors)
        flat_err = errors.ravel()
        keys = np.stack([lat.ravel().round(4), lon.ravel().round(4)], -1)
        if errors.ndim == 3:  # dim_yt>1: every channel shares its slot's key
            keys = np.repeat(keys, errors.shape[-1], axis=0)
        for k, e in zip(map(tuple, keys), flat_err):
            if np.isfinite(e):
                per_station.setdefault(k, []).append(e)

        band_errs = {label: [] for label, _, _ in bands}
        stations = {}
        for (la, lo), errs in per_station.items():
            elev = elevation_lookup(la, lo)
            if elev is None:
                continue
            st_rmse = float(np.sqrt(np.mean(np.square(errs))))
            for label, lo_e, hi_e in bands:
                if (lo_e is None or elev >= lo_e) and (hi_e is None or elev < hi_e):
                    band_errs[label].append(st_rmse)
                    stations[(la, lo)] = {
                        "rmse": st_rmse, "elevation": float(elev), "band": label,
                    }
                    break
        return {"bands": band_errs, "stations": stations}

    @staticmethod
    def _base_pairs_at_stations(base_field: Field, station_df):
        """Vectorised base-at-station sampling: returns ``(keys, base, obs)``
        arrays — keys (N, 2) rounded (lat, lon), base/obs (N,) — for every
        finite station sample, matching time and cell by nearest. One
        O(N log G) gather replaces the former per-(time, station) pandas
        loop (O(720×619) python ops per operational month)."""
        col = [c for c in station_df.columns if c.endswith("_station")][0]
        lat_c = np.asarray(base_field.coords[base_field.dims[-2]], np.float64)
        lon_c = np.asarray(base_field.coords[base_field.dims[-1]], np.float64)
        t_c = np.asarray(base_field.coords["time"]).astype("datetime64[s]")
        st_t = station_df["time"].to_numpy().astype("datetime64[s]")
        st_lat = station_df["latitude"].to_numpy(np.float64)
        st_lon = station_df["longitude"].to_numpy(np.float64)
        obs = station_df[col].to_numpy(np.float64)
        ti = _nearest_index(t_c.astype(np.int64), st_t.astype(np.int64))
        li = _nearest_index(lat_c, st_lat)
        lo = _nearest_index(lon_c, st_lon)
        base = np.asarray(base_field.data)[ti, li, lo].astype(np.float64)
        ok = np.isfinite(base) & np.isfinite(obs)
        keys = np.stack([st_lat.round(5), st_lon.round(5)], -1)
        return keys[ok], base[ok], obs[ok]

    @classmethod
    def _base_errors_at_stations(cls, base_field: Field, station_df):
        """Yield ((lat, lon), base − obs) for every finite station sample —
        the one sampling path behind both base-baseline reporters (a fix to
        the nearest/finite handling applies everywhere)."""
        keys, base, obs = cls._base_pairs_at_stations(base_field, station_df)
        for k, b, o in zip(keys, base, obs):
            yield (float(k[0]), float(k[1])), float(b - o)

    def calculate_loss_base(self, base_field: Field, station_df) -> dict:
        """Baseline: raw base field (ERA5) sampled at station locations vs
        obs (``calculate_loss_era5``, ``validate.py:319-351``)."""
        _, base, obs = self._base_pairs_at_stations(base_field, station_df)
        errs = base - obs
        return {
            "rmse": float(np.sqrt(np.mean(errs**2))) if len(errs) else np.nan,
            # mae doubles as the base's CRPS: a deterministic forecast's
            # CRPS reduces to |err|, so Validate.crps vs this mae is the
            # proper-score comparison against the base-copy baseline
            "mae": float(np.mean(np.abs(errs))) if len(errs) else np.nan,
            "bias": float(np.mean(errs)) if len(errs) else np.nan,
            "n": len(errs),
        }

    def per_station_loss_base(self, base_field: Field, station_df, dates=None) -> dict:
        """Per-station |error| statistics of a base field sampled at the
        stations — the reference's ``calculate_loss_era5`` reporting
        (``validate.py:319-351``; HiRes-ERA5 study
        ``validation_notebook.py:862-908``): per-location daily abs errors,
        then the across-station mean of means and mean of stds.

        Used both for the raw (lowres) base baseline and for a
        higher-resolution base product (the notebook's HiRes ERA5): pass the
        HiRes field as ``base_field`` to reproduce that study.
        """
        if dates is not None:
            # compare at ns resolution: datetime64 equality/hashing is
            # unit-sensitive (a [D] and [ns] stamp of the same instant differ)
            want = {np.datetime64(d, "ns").astype(np.int64) for d in dates}
            station_df = station_df[[
                np.datetime64(t, "ns").astype(np.int64) in want
                for t in station_df["time"]]]
        keys, base, obs = self._base_pairs_at_stations(base_field, station_df)
        per: dict[tuple, list] = {}
        for k, e in zip(keys, np.abs(base - obs)):
            per.setdefault((float(k[0]), float(k[1])), []).append(e)
        stats = {k: (float(np.mean(e)), float(np.std(e))) for k, e in per.items()}
        means = [m for m, _ in stats.values()]
        stds = [s for _, s in stats.values()]
        return {
            "per_station": stats,
            "mean_of_means": float(np.mean(means)) if means else np.nan,
            "mean_of_stds": float(np.mean(stds)) if stds else np.nan,
            "n_stations": len(stats),
        }

    def calibration_stats(self, dates, remove_stations: Sequence[str] = ()) -> dict:
        """Uncertainty calibration at stations: z-score moments + CI coverage.

        For a calibrated model z = (obs − mean)/std is ~N(0,1):
        |z_mean| ≈ 0, z_std ≈ 1, 95% coverage ≈ 0.95. The reference assessed
        this visually via ±2σ CI timeseries (``validate.py:862-946``); here
        it is a quantitative diagnostic.
        """
        pred = self.get_predictions(dates, remove_stations)
        obs = self._unnormalise_obs(pred["yt"])          # (B, M, dy)
        dy = obs.shape[-1]
        mask = pred["mask"]
        mean = self._as_channels(pred["mean"], dy)
        std = self._as_channels(pred["std"], dy)
        z = np.where(mask[..., None], (obs - mean) / np.maximum(std, 1e-9),
                     np.nan)
        out = self._z_summary(z)
        if dy > 1:
            out["per_channel"] = {
                vid: self._z_summary(z[..., c])
                for c, vid in enumerate(self.task_loader.target_var_IDs)
            }
        return out

    @staticmethod
    def _z_summary(z: np.ndarray) -> dict:
        zf = z[np.isfinite(z)]
        return {
            "z_mean": float(zf.mean()) if len(zf) else np.nan,
            "z_std": float(zf.std()) if len(zf) else np.nan,
            "coverage_95": float(np.mean(np.abs(zf) < 1.96)) if len(zf) else np.nan,
            "coverage_68": float(np.mean(np.abs(zf) < 1.0)) if len(zf) else np.nan,
            "n": int(len(zf)),
        }

    def pit_stats(self, dates, remove_stations: Sequence[str] = (),
                  seed: int = 0, return_samples: bool = False) -> dict:
        """Randomized-PIT calibration diagnostic, valid for EVERY head.

        u ~ U(F(y⁻), F(y)) is Uniform(0,1) iff the predictive distribution
        is calibrated (randomized quantile residuals — the z-score
        diagnostic of :meth:`calibration_stats` is only meaningful for
        Gaussian heads; a mixed head's pooled z_std is far from 1 even for
        a PERFECT model). Reports z = Φ⁻¹(u) moments and coverages on the
        same scale as ``calibration_stats``, so ``calibration_gate`` applies
        to any head. Gaussian heads include the shipped ``std_scale``
        recalibration."""
        import jax
        import jax.numpy as jnp
        from scipy.special import ndtri

        task = self._make_tasks(dates, remove_stations)
        model = self.run["model"]
        lik = model.cfg.make_likelihood()
        # cache the jitted forward on the instance: a fresh jax.jit wrapper
        # per call would retrace+recompile every invocation (~minutes
        # through the remote-TPU relay)
        if not hasattr(self, "_jit_apply"):
            self._jit_apply = jax.jit(model.apply)
        raw = self._jit_apply(self.run["params"], task)
        # the SHIPPED predictive distribution: spread recalibrated by the
        # artifact's std_scale (exact per head, point masses preserved)
        raw = lik.rescale_raw(raw, jnp.asarray(self.predictor.std_scale,
                                               jnp.float32))
        lo, hi = lik.cdf_bounds(raw, task.yt)
        lo, hi = np.asarray(lo, np.float64), np.asarray(hi, np.float64)
        mask = np.broadcast_to(
            np.asarray(task.yt_mask).astype(bool)[..., None], lo.shape)
        rng = np.random.default_rng(seed)
        u = lo + rng.random(lo.shape) * np.maximum(hi - lo, 0.0)
        zfull = ndtri(np.clip(u, 1e-6, 1.0 - 1e-6))
        zfull = np.where(mask, zfull, np.nan)
        out = self._z_summary(zfull)
        if zfull.shape[-1] > 1:
            out["per_channel"] = {
                vid: self._z_summary(zfull[..., c])
                for c, vid in enumerate(self.task_loader.target_var_IDs)
            }
        if return_samples:
            z = zfull[np.isfinite(zfull)]
            out["z"] = z  # for plot.plot_calibration
        return out

    def crps(self, dates, remove_stations: Sequence[str] = (),
             n_samples: int = 64, seed: int = 0) -> dict:
        """Mean marginal CRPS at station targets, in physical units — a
        PROPER score of the whole predictive distribution (RMSE scores only
        the mean; the reference's notebooks eyeball calibration but never
        score it). Closed form for the Gaussian heads, sampled energy form
        for the mixed ones (``likelihoods.Likelihood.crps``); the shipped
        ``std_scale`` recalibration applies, as in ``pit_stats``. CRPS is
        affine-equivariant, so normalised-space scores scale by each
        channel's |scale| (× the humidity unit-interval factor)."""
        import jax
        import jax.numpy as jnp

        task = self._make_tasks(dates, remove_stations)
        model = self.run["model"]
        lik = model.cfg.make_likelihood()
        if not hasattr(self, "_jit_apply"):
            self._jit_apply = jax.jit(model.apply)
        raw = self._jit_apply(self.run["params"], task)
        raw = lik.rescale_raw(raw, jnp.asarray(self.predictor.std_scale,
                                               jnp.float32))
        c = np.asarray(lik.crps(raw, jnp.asarray(task.yt),
                                jax.random.key(seed), n_samples), np.float64)
        scale, _ = self.predictor._affines()
        if self.run["variable"] == "humidity":
            scale = scale * 2.0  # unit-interval shift is a further affine
        c = c * np.abs(scale)
        mask = np.asarray(task.yt_mask).astype(bool)
        c = np.where(mask[..., None], c, np.nan)
        out = {"crps": float(np.nanmean(c)), "n": int(np.isfinite(c).sum())}
        if c.shape[-1] > 1:
            out["per_channel"] = {
                vid: float(np.nanmean(c[..., ch]))
                for ch, vid in enumerate(self.task_loader.target_var_IDs)
            }
        return out

    def _target_station_coords(self) -> dict:
        """{station name/id: (lat, lon)} of every target station, unmapped
        from the processed target frame's x1/x2."""
        df = self.task_loader.target
        key = ("station_name" if "station_name" in df.columns
               else "station_id")
        dp = self.run["data_processor"]
        lat = np.asarray(dp.unmap_x1(df["x1"].to_numpy()))
        lon = np.asarray(dp.unmap_x2(df["x2"].to_numpy()))
        out: dict = {}
        for name, la, lo_ in zip(df[key].to_numpy(), lat, lon):
            out.setdefault(str(name), (float(la), float(lo_)))
        return out

    def _region_predicate(self, lat_range=None, lon_range=None,
                          elevation_range=None, elevation_lookup=None):
        """(lat, lon) -> bool membership test for a lat/lon box and/or an
        elevation band (band bounds follow elevation_band_errors: lo
        inclusive, hi exclusive, None-open)."""
        if elevation_range is not None and elevation_lookup is None:
            elevation_lookup = registry_elevation_lookup()

        def inside(la: float, lo_: float) -> bool:
            if lat_range is not None and not (
                    lat_range[0] <= la <= lat_range[1]):
                return False
            if lon_range is not None and not (
                    lon_range[0] <= lo_ <= lon_range[1]):
                return False
            if elevation_range is not None:
                e = elevation_lookup(la, lo_)
                lo_e, hi_e = elevation_range
                if e is None or (lo_e is not None and e < lo_e) or (
                        hi_e is not None and e >= hi_e):
                    return False
            return True

        return inside

    def stations_in_region(self, lat_range=None, lon_range=None,
                           elevation_range=None, elevation_lookup=None) -> list:
        """Target-station names inside a lat/lon box and/or elevation band
        — the holdout sets behind :meth:`extrapolation_loss`."""
        inside = self._region_predicate(lat_range, lon_range,
                                        elevation_range, elevation_lookup)
        return [name for name, (la, lo_) in
                self._target_station_coords().items() if inside(la, lo_)]

    def extrapolation_loss(self, dates, *, lat_range=None, lon_range=None,
                           elevation_range=None, elevation_lookup=None) -> dict:
        """Spatial-extrapolation holdout — the regime a downscaler actually
        fails in: EVERY station inside a lat/lon box or elevation band
        leaves the CONTEXT at once, and skill is scored separately AT those
        stations (extrapolation) and at the rest (interpolation), from the
        same prediction pass. ``calculate_loss``'s random-subset holdout
        measures infill between observed neighbours; the reference probes
        the harder regime only indirectly via elevation-band violins
        (``validation_notebook.py:721-778``) — this makes it a protocol.
        """
        held = self.stations_in_region(lat_range, lon_range,
                                       elevation_range, elevation_lookup)
        if not held:
            raise ValueError("no target stations inside the holdout region")
        loss = self.calculate_loss(dates, remove_stations=held)
        # classify every target slot by ITS OWN coordinates through the
        # same predicate that chose the holdout (slots and stations both
        # derive from the target frame's x1/x2)
        inside = self._region_predicate(lat_range, lon_range,
                                        elevation_range, elevation_lookup)
        dp = self.run["data_processor"]
        xt = loss["xt"]
        lat = np.asarray(dp.unmap_x1(xt[..., 0]))
        lon = np.asarray(dp.unmap_x2(xt[..., 1]))
        in_hold = np.fromiter(
            (inside(la, lo_) for la, lo_ in
             zip(lat.ravel(), lon.ravel())),
            dtype=bool, count=lat.size).reshape(lat.shape)
        err = np.asarray(loss["errors"])
        sel = in_hold[..., None] if err.ndim == 3 else in_hold

        def _m(e):
            any_f = np.isfinite(e).any()
            return {
                "rmse": float(np.sqrt(np.nanmean(e**2))) if any_f else np.nan,
                "mae": float(np.nanmean(np.abs(e))) if any_f else np.nan,
                "bias": float(np.nanmean(e)) if any_f else np.nan,
                "n": int(np.isfinite(e).sum()),
            }

        return {
            "held_out_stations": held,
            "extrapolation": _m(np.where(sel, err, np.nan)),
            "interpolation": _m(np.where(sel, np.nan, err)),
            "errors": err,
            "xt": xt,
            "holdout_mask": in_hold,
        }

    def wet_dry_skill(
        self,
        dates,
        base_field: Optional[Field] = None,
        station_df=None,
        remove_stations: Sequence[str] = (),
        wet_threshold: float = 0.0,
    ) -> dict:
        """Precipitation occurrence skill at stations: Brier score and hit
        rate of the model's P(wet) against observed wetness, plus the base
        field's deterministic wetness as baseline when ``base_field`` +
        raw ``station_df`` are given (the reference studies occurrence via
        the precip validation notebook; this makes it a quantitative
        metric). ``wet_threshold`` is in physical units (mm)."""
        pred = self.get_predictions(dates, remove_stations)
        if "p_wet" not in pred:
            raise ValueError(
                "wet/dry skill needs the bernoulli-gamma head (no P(wet) "
                f"for likelihood {self.run['model'].cfg.likelihood!r})"
            )
        obs = self._unnormalise_obs(pred["yt"])[..., 0]
        p = pred["p_wet"]
        mask = pred["mask"] & np.isfinite(p) & np.isfinite(obs)
        wet = (obs[mask] > wet_threshold).astype(np.float64)
        pm = p[mask]
        out = {
            "brier": float(np.mean((pm - wet) ** 2)) if mask.any() else np.nan,
            "hit_rate": float(np.mean((pm > 0.5) == (wet > 0.5))) if mask.any() else np.nan,
            "wet_frac_obs": float(np.mean(wet)) if mask.any() else np.nan,
            "n": int(mask.sum()),
        }
        if base_field is not None and station_df is not None:
            want = {np.datetime64(d, "ns").astype(np.int64) for d in dates}
            sdf = station_df[[
                np.datetime64(t, "ns").astype(np.int64) in want
                for t in station_df["time"]]]
            _, b, o = self._base_pairs_at_stations(base_field, sdf)
            bw = (b > wet_threshold).astype(np.float64)
            ow = (o > wet_threshold).astype(np.float64)
            out["baseline_brier"] = float(np.mean((bw - ow) ** 2)) if len(b) else np.nan
            out["baseline_hit_rate"] = float(np.mean(bw == ow)) if len(b) else np.nan
        return out

    @staticmethod
    def calibration_gate(stats: dict, z_std_range=(0.8, 1.25),
                         coverage_95_range=(0.90, 0.98)) -> bool:
        """True iff calibration_stats pass the shipping gate: z_std and 95 %
        coverage inside their acceptance windows. The registry-default model
        (gnp) must pass this at holdout stations — the headline capability
        claim is CALIBRATED uncertainty (reference ``README.md:1-9``)."""
        z = stats.get("z_std", np.nan)
        c = stats.get("coverage_95", np.nan)
        return bool(
            np.isfinite(z) and np.isfinite(c)
            and z_std_range[0] <= z <= z_std_range[1]
            and coverage_95_range[0] <= c <= coverage_95_range[1]
        )

    def stations_in_date_range(self, station_df, date_range) -> list:
        """Stations reporting over the whole range (``validate.py:474-509``).

        Keys by ``station_name`` when present, else ``station_id`` — the
        same convention as :func:`remove_stations_from_frame` (synthetic
        frames carry only ids)."""
        key = ("station_name" if "station_name" in station_df.columns
               else "station_id")
        lo, hi = np.datetime64(date_range[0]), np.datetime64(date_range[-1])
        names = []
        for name, grp in station_df.groupby(key):
            t = grp["time"].to_numpy().astype("datetime64[s]")
            if t.min() <= lo and t.max() >= hi:
                names.append(name)
        return names


class ValidateERA:
    """Operational gridded ERA5 inference (``validate_ERA.py``)."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        dem: Optional[Field] = None,
        highres_factor: int = 10,
        *,
        run: Optional[dict] = None,
        pred_grid: Optional[Field] = None,
        predictor: Optional[Predictor] = None,
        transfer_dtype: Optional[str] = None,
        batch_chunk: Optional[int] = None,
        download_threads: int = 1,
        upload_dtype: Optional[str] = None,
    ):
        """Load from ``model_dir``, or reuse an already-loaded ``run`` (and
        optionally its ``pred_grid``/``predictor`` — the WRF cycle shares
        them instead of re-jitting). ``transfer_dtype`` ("float16") halves
        device→host bytes — the dominant cost of operational serving over a
        remote host link. ``batch_chunk``/``download_threads`` chunk long
        gridded runs and overlap their downloads; ``upload_dtype``
        compresses the host→device task upload (``Predictor`` docs)."""
        self.run = run or load_run(model_dir)
        self.dem = dem
        if pred_grid is None and dem is None:
            raise ValueError(
                "ValidateERA needs a prediction grid: pass dem (coarsened by "
                "highres_factor) or an explicit pred_grid"
            )
        # prediction grid = raw DEM coarsened by the training highres factor
        # + sea mask from its NaNs (validate_ERA.py:48-57)
        self.pred_grid = pred_grid if pred_grid is not None else dem.coarsen(highres_factor)
        self.predictor = predictor or Predictor(
            self.run["model"], self.run["params"], self.run["data_processor"],
            self.run["task_loader"].target_var_IDs,
            transfer_dtype=transfer_dtype,
            std_scale=self.run.get("std_scale", 1.0),
            batch_chunk=batch_chunk, download_threads=download_threads,
            upload_dtype=upload_dtype,
        )

    def predict(
        self,
        times: np.ndarray,
        base_fields: dict[str, Field],
        station_df=None,
        remove_stations: Sequence[str] = (),
        context_sampling=None,
        n_samples: int = 0,
        outputs: tuple = ("mean", "std"),
    ):
        """Predict the requested timestamps on the DEM grid.

        ``base_fields``/``station_df`` are RAW (physical units, lat/lon
        coords); they are normalised with the SAVED processor and swapped
        into the persisted TaskLoader (``validate_ERA.py:67-127``).
        """
        dp = self.run["data_processor"]
        tl = self.run["task_loader"]
        var = self.run["variable"]
        method = cfg.NORMALISATION[var]

        new_context = []
        for entry in tl.context:
            if hasattr(entry, "columns"):  # station context
                if station_df is None:
                    # no stations available (e.g. real-time forecast mode):
                    # run with an empty station context — parity with
                    # context_sampling=[...,0] (validation_precip notebook)
                    new_context.append(entry.iloc[0:0])
                else:
                    sdf = remove_stations_from_frame(station_df, remove_stations)
                    new_context.append(dp(sdf, assert_computed=True))
            else:
                fields = dict(entry.items()) if hasattr(entry, "items") else {entry.name: entry}
                updated = dict(fields)
                # swap base-variable channels for the new timestamps,
                # resampled onto the stored (trimmed) training grid
                for v, raw in base_fields.items():
                    short = cfg.VAR_ERA5[v]["var_name"]
                    if short in fields:
                        new_f = dp(raw.rename(short), assert_computed=True)
                        old = fields[short]
                        new_f = new_f._interp_one("x1", old.coords["x1"], "nearest")
                        new_f = new_f._interp_one("x2", old.coords["x2"], "nearest")
                        updated[short] = new_f
                # recompute seasonal-encoding channels for the new times
                from deepsensornz_tpu.data.features import circ_time_encoding
                from deepsensornz_tpu.data.grid import Dataset as _DS

                circ_names = [n for n in fields if n in ("cos_D", "sin_D", "cos_H", "sin_H")]
                if circ_names:
                    t_new = np.asarray(times, dtype="datetime64[s]")
                    enc = circ_time_encoding(
                        t_new, "H" if "cos_H" in circ_names else "D"
                    )
                    for n in circ_names:
                        old = fields[n]
                        h, w = old.shape[-2:]
                        arr = np.broadcast_to(
                            enc[n][:, None, None].astype(np.float32),
                            (len(t_new), h, w),
                        ).copy()
                        coords = dict(old.coords)
                        coords["time"] = t_new
                        updated[n] = Field(arr, old.dims, coords, n, {})
                new_context.append(_DS(updated))
        new_target = None
        if station_df is not None:
            new_target = dp(remove_stations_from_frame(station_df, remove_stations),
                            assert_computed=True)
        with tl.swap_data(context=new_context, target=new_target):
            task = tl(list(np.asarray(times)),
                      context_sampling=context_sampling, seed_override=42)

        # highres aux for the prediction grid comes from the loader's own
        # aux_at_targets (normalised topo stack)
        return self.predictor.predict_grid(
            task, self.pred_grid, aux_at_targets=tl.aux_at_targets,
            times=np.asarray(times), n_samples=n_samples,
            post_transform=post_transform_for(var), outputs=outputs,
        )


class ValidateWRF:
    """Forecast-cycle inference (``validate_WRF.py``)."""

    def __init__(self, model_dir: str, dem: Field, coarsen_factor: int = 5):
        self.run = load_run(model_dir)
        self.dem = dem
        self.pred_grid = dem.coarsen(coarsen_factor)
        self.coarsen_factor = coarsen_factor
        # the gridded predict path is identical to the ERA5 one once the
        # forecast fields are regridded — share a properly-constructed
        # ValidateERA (and its jitted predictor) instead of duplicating it
        self._era = ValidateERA(
            run=self.run, dem=dem, pred_grid=self.pred_grid
        )
        self.predictor = self._era.predictor

    def predict(
        self,
        filepaths: Sequence[str],
        wrf_source,
        station_df=None,
        remove_stations: Sequence[str] = (),
        variables: Optional[Sequence[str]] = None,
    ):
        """Run one forecast cycle: load WRF files, regrid to the topo grid,
        normalise with the saved processor, predict every forecast hour
        (``validate_WRF.py:190-239``)."""
        var = self.run["variable"]
        variables = list(variables or [var])
        raw = wrf_source.load(filepaths, variables)
        lat = self.pred_grid.coords["latitude"]
        lon = self.pred_grid.coords["longitude"]
        base_fields = {}
        for v, fld in raw.items():
            g = wrf_source.regrid_to(fld, lat, lon)
            if v == "temperature" and np.nanmean(g.data) > 100:
                g = g.copy(g.data - 273.15)
            base_fields[v] = g
        times = base_fields[var].coords["time"]
        return self._era.predict(
            times, base_fields, station_df=station_df,
            remove_stations=remove_stations,
        )

"""Static variable / likelihood / normalisation registry.

Capability parity with the reference registry
(``nzdownscale/dataprocess/config.py:3-179,2685-2689``): canonical variable
names, per-data-source name maps, per-variable likelihood and normalisation
method, geographic extents, named locations, and ConvNP defaults.

The reference additionally hard-codes a 619-entry station registry
(``config.py:208-2683``). That table ships here as
``data/station_registry.json`` (loaded lazily by :func:`station_registry`),
TRANSCRIBED from the reference table — it is factual data about real NZ
stations and no archive exists in this environment to regenerate it from —
so holdout lists and plots work without the raw archive. When an archive IS
available, :meth:`deepsensornz_tpu.data.sources.stations.StationSource.build_registry`
regenerates it the same way the reference produced its table
(``stations.py:181-214``).
"""

from __future__ import annotations

import warnings

import json
import os
from typing import Optional

_STATION_REGISTRY: Optional[dict] = None


def station_registry() -> dict:
    """name → {station_id, latitude, longitude, elevation} for the ~619 NZ
    stations (parity: ``STATION_LATLON``, ``config.py:208-2683``).

    Loads the shipped ``data/station_registry.json`` artifact on first use;
    ``elevation`` may be None for the two stations the archive lacks it for.
    """
    global _STATION_REGISTRY
    if _STATION_REGISTRY is None:
        path = os.path.join(
            os.path.dirname(__file__), "data", "station_registry.json"
        )
        with open(path) as f:
            _STATION_REGISTRY = json.load(f)
    return _STATION_REGISTRY

# Canonical variable names used throughout the framework.
VARIABLE_OPTIONS = (
    "temperature",
    "precipitation",
    "surface_pressure",
    "10m_u_component_of_wind",
    "10m_v_component_of_wind",
    "humidity",
)

# Canonical name -> ERA5(-Land) short name (parity: config.py:46-92).
VAR_ERA5 = {
    "temperature": {"var_name": "t2m", "units": "°C", "long_name": "2 m temperature"},
    "precipitation": {"var_name": "tp", "units": "mm", "long_name": "Total precipitation"},
    "surface_pressure": {"var_name": "sp", "units": "Pa", "long_name": "Surface pressure"},
    "10m_u_component_of_wind": {"var_name": "u10", "units": "m s-1", "long_name": "10 m U wind"},
    "10m_v_component_of_wind": {"var_name": "v10", "units": "m s-1", "long_name": "10 m V wind"},
    "humidity": {"var_name": "rh", "units": "1", "long_name": "Relative humidity"},
}

# Canonical name -> WRF output field (parity: config.py:112-131).
VAR_WRF = {
    "temperature": {"var_name": "T2", "units": "K"},
    "precipitation": {"var_name": "RAINNC", "units": "mm"},
    "surface_pressure": {"var_name": "PSFC", "units": "Pa"},
    "10m_u_component_of_wind": {"var_name": "U10", "units": "m s-1"},
    "10m_v_component_of_wind": {"var_name": "V10", "units": "m s-1"},
    "humidity": {"var_name": "RH2", "units": "1"},
}

# Canonical name -> station archive variable + per-variable archive
# subfolder (parity: config.py:10-44; layout used by ``get_parent_path``,
# stations.py:21-24,46-51). u/v wind are DERIVED from the archive's
# speed/direction variables (stations.py:295-303), mirrored here with the
# reference's var_name convention.
VAR_STATIONS = {
    "temperature": {"var_name": "dry_bulb", "units": "°C",
                    "subdir": "ScreenObs"},
    "precipitation": {"var_name": "precipitation", "units": "mm",
                      "subdir": "Precipitation"},
    "surface_pressure": {"var_name": "stn_lev_pres", "units": "hPa",
                         "subdir": "Pressure"},
    "10m_u_component_of_wind": {"var_name": "u", "units": "m s-1",
                                "subdir": "Surface_Wind"},
    "10m_v_component_of_wind": {"var_name": "v", "units": "m s-1",
                                "subdir": "Surface_Wind"},
    "humidity": {"var_name": "relative_humidity", "units": "1",
                 "subdir": "ScreenObs"},
}

# Reverse map: any per-source short name -> canonical name (parity: config.py:94-110).
VAR_TO_STD = {}
for _std, _m in (
    list(VAR_ERA5.items()) + list(VAR_WRF.items()) + list(VAR_STATIONS.items())
):
    VAR_TO_STD[_m["var_name"]] = _std

# Per-variable output likelihood (parity: config.py:162-169).
#   cnp             — heteroscedastic diagonal Gaussian
#   gnp             — low-rank multivariate Gaussian (joint prediction)
#   bernoulli-gamma — mixed discrete/continuous for precipitation
#   cnp-spikes-beta — {0,1} spikes + Beta body for bounded humidity
LIKELIHOODS = {
    "temperature": "cnp",
    "precipitation": "bernoulli-gamma",
    "surface_pressure": "cnp",
    "10m_u_component_of_wind": "cnp",
    "10m_v_component_of_wind": "cnp",
    "humidity": "cnp-spikes-beta",
}

# Per-variable normalisation method (parity: config.py:171-179).
NORMALISATION = {
    "temperature": "mean_std",
    "precipitation": "positive_semidefinite",
    "surface_pressure": "mean_std",
    "10m_u_component_of_wind": "mean_std",
    "10m_v_component_of_wind": "mean_std",
    "humidity": "min_max",
}

# Geographic extents (degrees). "all" is the full-NZ training extent
# (parity in role with PLOT_EXTENT, config.py:135-160).
EXTENTS = {
    "all": {"minlat": -47.95, "maxlat": -34.05, "minlon": 165.75, "maxlon": 178.70},
    "north_island": {"minlat": -41.7, "maxlat": -34.05, "minlon": 172.5, "maxlon": 178.70},
    "south_island": {"minlat": -47.95, "maxlat": -40.3, "minlon": 165.75, "maxlon": 174.5},
    "christchurch": {"minlat": -44.2, "maxlat": -43.0, "minlon": 171.0, "maxlon": 173.2},
}

# Named city coordinates (lat, lon) for validation plots / timeseries
# (parity in role with LOCATION_LATLON, config.py:181-205).
LOCATION_LATLON = {
    "auckland": (-36.8485, 174.7633),
    "wellington": (-41.2866, 174.7756),
    "christchurch": (-43.5321, 172.6362),
    "dunedin": (-45.8788, 170.5028),
    "queenstown": (-45.0312, 168.6626),
    "hamilton": (-37.7870, 175.2793),
    "tauranga": (-37.6878, 176.1651),
    "napier": (-39.4928, 176.9120),
    "nelson": (-41.2706, 173.2840),
    "invercargill": (-46.4132, 168.3538),
    "taupo": (-38.6857, 176.0702),
    "hokitika": (-42.7166, 170.9632),
    "milford_sound": (-44.6717, 167.9256),
    "mt_cook": (-43.7340, 170.0966),
}

# ConvNP model defaults (parity: config.py:2685-2689).
CONVNP_KWARGS_DEFAULT = {
    "unet_channels": (64, 64, 64, 64),
    "likelihood": "gnp",
    "internal_density": 500,
}

# Default training recipe (parity: train.py:336-355,427).
TRAIN_DEFAULTS = {
    "lr": 5e-5,
    "weight_decay": 0.0,
    "batch_size": 8,
    "n_epochs": 30,
    "plateau_factor": 0.1,
    "plateau_patience": 5,
    "early_stop_patience": 10,
}


# Measured-best per-variable training settings — the opt-in ``profile:
# tuned`` resolution for the training CLI. The parity defaults above are
# unchanged; this table records the round-3 density/length-scale study
# outcomes at FLAGSHIP scale (docs/results/flagship_d350_per_variable.json,
# flagship_density_frontier.json, selftune_cpu_scale.json):
# temperature/wind/humidity train better-or-equal at internal_density 350
# at ~2x throughput. Precipitation and surface pressure nominally prefer
# the finer 500 grid, but the capstone transplants showed that preference
# is mostly a SMOOTHING preference — d350 + init_lengthscale=0.005
# recovers nearly all of it (precip 0.112 vs 0.109; pressure 576 vs
# 558 Pa) at ~2x throughput, which is what the profile ships. Length-scale
# self-tuning (lengthscale_lr_mult) at flagship scale pays only for wind
# (~30, the joint model's gentler operating point: 0.596/0.620 vs
# 0.622/0.632); for temperature and precip the CPU-scale gains do NOT
# transfer (neutral-to-harmful — self-tuning refines around a good init
# but cannot rescue a bad one at the flagship lr×steps budget), and
# surface pressure genuinely prefers its smooth init-determined scale.
# MULTI-WORLD ROBUSTNESS (round 5, docs/results/profile_robustness_r5
# .json): the d350 point beats-or-matches the d500 parity default in ALL
# four perturbed generator worlds (rough+sparse, smooth+dense, 3x obs
# noise, steep lapse) — and the d500-at-default-smoothing point outright
# FAILS calibration in two of them. The tuned profile is not a
# one-world artifact.
TUNED_PROFILE = {
    "temperature": {"internal_density": 350},
    "precipitation": {"internal_density": 350, "init_lengthscale": 0.005},
    "surface_pressure": {"internal_density": 350, "init_lengthscale": 0.005},
    "10m_u_component_of_wind": {"internal_density": 350,
                                "lengthscale_lr_mult": 30.0},
    "10m_v_component_of_wind": {"internal_density": 350,
                                "lengthscale_lr_mult": 30.0},
    "humidity": {"internal_density": 350},
}


# Measured max-throughput operating points — the grid-floor study
# (flagship_density_frontier.json grid_floor_rows + the per-variable d120
# runs in flagship_d350_per_variable.json): with each variable's
# measured-best smoothing scale PINNED, holdout quality is flat over the
# entire expressible internal-grid range, so density 120 trains at
# 1019.5 tasks/s/chip at matched quality (batch 32, verified across
# three data seeds; 6.3x the tuned profile's d350 at 161.4, 11.8x the
# d500 parity config at 86.3 — the 909.8 batch-16 point is capacity with
# a marginal-quality caveat). Hardware evidence per variable (120-cap,
# seed 0): temperature
# 0.555 (vs d350 0.548), precip 0.109 (EQUALS the all-config best),
# pressure 427 Pa (BEATS every prior config), humidity 0.033 (slightly
# softer than 0.025-0.026), wind near-neutral vs a fair d350 control
# (u 0.608/0.575, v 0.518/0.525). Serving is decode-bound below ~d350, so
# this profile is about TRAINING cost; quality-first users keep 'tuned'.
# MULTI-WORLD ROBUSTNESS (round 5, docs/results/profile_robustness_r5
# .json): WORLD-CONDITIONAL. The d120+pinned point holds within 10% of
# the per-world best in the noise-dominated and steep-lapse worlds (in
# the latter it is the BEST point, 0.829 vs d350's 1.719, and the only
# one passing calibration) but LOSES where fine terrain structure must
# be resolved by the grid itself: rough+sparse (1.595 vs 0.932, gate
# fail) and smooth+dense (0.461 vs 0.393, +17%). Use 'throughput' when
# the sub-grid signal is elevation/noise-dominated; use 'tuned' when the
# terrain texture is fine relative to ~1/120 of the domain.
THROUGHPUT_PROFILE = {
    "temperature": {"internal_density": 120, "init_lengthscale": 0.00714},
    "precipitation": {"internal_density": 120, "init_lengthscale": 0.005},
    "surface_pressure": {"internal_density": 120, "init_lengthscale": 0.005},
    "10m_u_component_of_wind": {"internal_density": 120,
                                "init_lengthscale": 0.00714,
                                "lengthscale_lr_mult": 30.0},
    "10m_v_component_of_wind": {"internal_density": 120,
                                "init_lengthscale": 0.00714,
                                "lengthscale_lr_mult": 30.0},
    "humidity": {"internal_density": 120, "init_lengthscale": 0.00714},
}

PROFILES = {"tuned": TUNED_PROFILE, "throughput": THROUGHPUT_PROFILE}


def lengthscale_values(ls) -> list:
    """Numeric values of an ``init_lengthscale`` setting in any of its
    accepted forms — scalar, mapping, or (name, value) pair iterable (the
    same protocol ``utils.ARG_SCHEMA`` coerces from YAML and
    ``ConvNPConfig.__post_init__`` normalises; keep the three in sync)."""
    if isinstance(ls, (int, float)):
        return [float(ls)]
    pairs = ls.items() if hasattr(ls, "items") else ls
    return [float(v) for _, v in pairs]


def apply_profile(args: dict) -> dict:
    """Resolve ``profile: tuned`` / ``profile: throughput`` into
    per-variable measured-best settings.

    Explicit per-run values always win; the profile only fills keys the
    YAML left unset (or null). ``profile: parity`` / absent is a no-op.
    """
    profile = args.get("profile")
    if profile in (None, "parity"):
        return args
    if profile not in PROFILES:
        raise ValueError(
            f"unknown profile {profile!r}; use "
            f"{', '.join(map(repr, PROFILES))} or 'parity'")
    filled = set()
    for k, v in PROFILES[profile][args["variable"]].items():
        if args.get(k) is None:
            args[k] = v
            filled.add(k)
    # The profile's init_lengthscale values assume the profile's density.
    # If the combination ends up invalid (a length-scale at/below the
    # SetConv half-grid-spacing floor 0.5/density, which ConvNP refuses),
    # back off whichever side the PROFILE filled — never an explicit
    # per-run value (those always win). If BOTH are explicit, leave the
    # combo alone so the model raises its own loud error.
    ls, dens = args.get("init_lengthscale"), args.get("internal_density")
    if ls is not None and dens:
        vals = lengthscale_values(ls)
        # an empty per-scale mapping means "all scales default" (ConvNP
        # accepts it) — nothing to check against the floor
        if vals and min(vals) <= 0.5 / float(dens):
            if "init_lengthscale" in filled:
                warnings.warn(
                    f"profile {profile!r} init_lengthscale {ls} is "
                    f"at/below the grid floor 0.5/{dens}; dropping it for "
                    f"this run", stacklevel=2)
                args["init_lengthscale"] = None
            elif "internal_density" in filled:
                warnings.warn(
                    f"explicit init_lengthscale {ls} is at/below the grid "
                    f"floor at the profile's internal_density {dens}; "
                    f"dropping the profile's density for this run",
                    stacklevel=2)
                args["internal_density"] = None
    return args


def likelihood_for(variable: str) -> str:
    """Default likelihood for a canonical variable name."""
    return LIKELIHOODS[variable]


def normalisation_for(variable: str) -> str:
    """Default normalisation method for a canonical variable name."""
    return NORMALISATION[variable]

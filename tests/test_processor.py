"""DataProcessor: normalisation methods, coord maps, round-trip inverses.

Promotes the reference's manual round-trip check
(``preprocess.py:903-913`` test_normalisation) to a real test (SURVEY.md §4).
"""

import numpy as np
import pandas as pd
import pytest

from deepsensornz_tpu.data.grid import Field
from deepsensornz_tpu.data.processor import DataProcessor


def make_dp():
    dp = DataProcessor()
    dp.set_coord_maps_from_extent(-47.9, -34.0, 165.7, 178.7)
    return dp


def make_field(name="t2m", positive=False):
    rng = np.random.default_rng(3)
    lat = np.linspace(-34.0, -47.0, 5)
    lon = np.linspace(166.0, 178.0, 7)
    data = rng.normal(12.0, 6.0, (5, 7))
    if positive:
        data = np.abs(data)
    return Field(data, ("latitude", "longitude"), {"latitude": lat, "longitude": lon}, name)


@pytest.mark.parametrize("method", ["mean_std", "min_max", "positive_semidefinite"])
def test_field_roundtrip(method):
    dp = make_dp()
    f = make_field(positive=(method == "positive_semidefinite"))
    norm = dp(f, method=method)
    assert "x1" in norm.coords and "x2" in norm.coords
    assert norm.dims == ("x1", "x2")
    back = dp.unnormalise(norm)
    np.testing.assert_allclose(back.data, f.data, atol=1e-3)
    np.testing.assert_allclose(back.coords["latitude"], f.coords["latitude"], atol=1e-9)


def test_mean_std_statistics():
    dp = make_dp()
    f = make_field()
    norm = dp(f, method="mean_std")
    assert abs(float(norm.data.mean())) < 1e-9
    assert abs(float(norm.data.std()) - 1.0) < 1e-9


def test_min_max_range():
    dp = make_dp()
    f = make_field(name="rh")
    norm = dp(f, method="min_max")
    assert norm.data.min() == pytest.approx(-1.0)
    assert norm.data.max() == pytest.approx(1.0)


def test_positive_semidefinite_keeps_zero():
    dp = make_dp()
    f = make_field(name="tp", positive=True)
    f.data[0, 0] = 0.0
    norm = dp(f, method="positive_semidefinite")
    assert norm.data[0, 0] == 0.0
    assert (norm.data >= 0).all()


def test_apply_only_mode_raises():
    dp = make_dp()
    f = make_field()
    with pytest.raises(KeyError):
        dp(f, assert_computed=True)


def test_stats_cached_and_reused():
    dp = make_dp()
    f = make_field()
    dp(f, method="mean_std")
    stats = dict(dp.config["t2m"]["params"])
    f2 = make_field()
    f2.data = f2.data + 100.0
    norm2 = dp(f2)  # must reuse cached stats, not refit
    assert dp.config["t2m"]["params"] == stats
    assert norm2.data.mean() > 5  # shifted data clearly not re-standardised


def test_dataframe_roundtrip():
    dp = make_dp()
    df = pd.DataFrame({
        "time": np.repeat(np.datetime64("2001-01-01"), 4),
        "latitude": [-35.0, -40.0, -45.0, -47.0],
        "longitude": [167.0, 170.0, 174.0, 177.0],
        "t2m_station": [10.0, 5.0, 2.0, -1.0],
    })
    norm = dp(df, method="mean_std")
    assert "x1" in norm.columns and "latitude" not in norm.columns
    assert ((norm["x1"] >= 0) & (norm["x1"] <= 1)).all()
    back = dp.unnormalise(norm)
    np.testing.assert_allclose(back["t2m_station"], df["t2m_station"], atol=1e-9)
    np.testing.assert_allclose(back["latitude"], df["latitude"], atol=1e-9)


def test_serialisation_roundtrip(tmp_path):
    dp = make_dp()
    dp(make_field(), method="mean_std")
    p = str(tmp_path / "dp.json")
    dp.save(p)
    dp2 = DataProcessor.load(p)
    assert dp2.config == dp.config
    assert tuple(dp2.x1_map) == tuple(dp.x1_map)

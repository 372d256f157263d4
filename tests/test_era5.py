"""ERA5 NetCDF ingestion logic, exercised against the fake-xarray backend
(tests/fake_xarray.py) since the image ships no xarray/netCDF4."""

import os
import sys

import numpy as np
import pytest

import fake_xarray
from weatherforecast_stgcn_maml_tpu.config import DataConfig, WEATHER_VARS
from weatherforecast_stgcn_maml_tpu.data.era5 import (
    NC_FILENAMES,
    load_region,
    load_region_cached,
)

ACCUM_VARS = ("tp", "str", "e")
INSTANT_VARS = tuple(v for v in WEATHER_VARS if v not in ACCUM_VARS)

# ERA5 grids: latitude descending, longitude in [0, 360).
LATS = np.arange(30.0, 9.9, -0.5)  # 30 .. 10 descending
LONS = np.arange(340.0, 360.0, 0.5)  # covers lon_min=-20 after to_0360


def _times(start, n):
    return np.datetime64(start) + np.arange(n) * np.timedelta64(1, "h")


def _write_quarter(dirpath, times, value_offset, *, with_expver=False):
    os.makedirs(dirpath, exist_ok=True)
    t, la, lo = len(times), len(LATS), len(LONS)
    rng = np.random.default_rng(int(value_offset))

    def field(seed_shift):
        return value_offset + rng.normal(size=(t, la, lo))

    accum = {v: field(i) for i, v in enumerate(ACCUM_VARS)}
    instant = {v: field(10 + i) for i, v in enumerate(INSTANT_VARS)}
    if with_expver:
        # Post-2024 CDS downloads carry a [T]-shaped `expver` variable
        # ("0001" final / "0005" ERA5T). Streams may disagree (accum from a
        # later re-download than instant), and OLDER quarters lack the
        # variable entirely — concat of such mixed archives fails unless
        # era5.py drops it (the drop_vars line is load-bearing: see
        # fake_xarray.concat).
        accum["expver"] = np.array(["0001"] * t)
        instant["expver"] = np.array(["0005"] * t)
    # Overlapping variable: accum's copy must win (compat="override",
    # first-file precedence — dataLoader.py:44 semantics; without override
    # the fake's xarray-default no_conflicts merge raises).
    instant["tp"] = np.full((t, la, lo), -999.0)
    fake_xarray.write_fake_nc(
        os.path.join(dirpath, NC_FILENAMES[0]), accum, times, LATS, LONS
    )
    fake_xarray.write_fake_nc(
        os.path.join(dirpath, NC_FILENAMES[1]), instant, times, LATS, LONS
    )


@pytest.fixture()
def era5_root(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "xarray", fake_xarray)
    root = str(tmp_path / "era5")
    # Q1's data is written with LATER timestamps than Q2 so the loader's
    # final sortby actually has to reorder; Q1 additionally carries the
    # expver variable (mixed re-downloaded archive) while Q2 does not.
    _write_quarter(
        os.path.join(root, "2020", "Q1"), _times("2020-04-01", 6), 1.0,
        with_expver=True,
    )
    _write_quarter(os.path.join(root, "2020", "Q2"), _times("2020-01-01", 6), 2.0)
    _write_quarter(
        os.path.join(root, "2021", "Q1"), _times("2021-01-01", 6), 3.0,
        with_expver=True,
    )
    # 2021/Q2 intentionally missing.
    return root


def _cfg(root, tmp_path):
    return DataConfig(
        root=root, cache_dir=str(tmp_path / "cache"), quarters=("Q1", "Q2")
    )


BOX = (12.0, 20.0, -18.0, -12.0)  # lon in [-180, 180) convention


def test_load_region_merges_slices_and_sorts(era5_root, tmp_path):
    cfg = _cfg(era5_root, tmp_path)
    region = load_region(BOX, ["2020"], cfg, strict=True, name="r")
    # Latitude slice of a descending coord: 12..20 -> 17 points at 0.5 deg.
    assert region.weather.shape[1] == 17
    # Longitude -18..-12 -> 342..348 -> 13 points.
    assert region.weather.shape[2] == 13
    # Two quarters of 6 hours each, sorted ascending despite Q1 > Q2 times.
    assert region.weather.shape[0] == 12
    t = region.times
    assert (t[:-1] <= t[1:]).all()
    # Q2 (offset 2.0, January) sorts before Q1 (offset 1.0, April): the tp
    # channel must contain accum's values (~offset), not instant's -999.
    tp = region.weather[..., WEATHER_VARS.index("tp")]
    assert tp.min() > -100, "instant-file tp leaked through override merge"
    # Variable order matches WEATHER_VARS and all 12 are present.
    assert region.weather.shape[-1] == 12
    assert np.isfinite(region.weather).all()


def test_load_region_strict_missing_file(era5_root, tmp_path):
    cfg = _cfg(era5_root, tmp_path)
    with pytest.raises(FileNotFoundError):
        load_region(BOX, ["2020", "2021"], cfg, strict=True)


def test_load_region_skips_missing_when_lenient(era5_root, tmp_path):
    cfg = _cfg(era5_root, tmp_path)
    region = load_region(BOX, ["2020", "2021"], cfg, strict=False)
    # 2020 Q1+Q2 plus 2021 Q1 only = 18 timesteps.
    assert region.weather.shape[0] == 18


def test_load_region_no_files_raises(era5_root, tmp_path):
    cfg = _cfg(era5_root, tmp_path)
    with pytest.raises(FileNotFoundError):
        load_region(BOX, ["1999"], cfg, strict=False)


def test_load_region_cached_roundtrip(era5_root, tmp_path):
    cfg = _cfg(era5_root, tmp_path)
    r1 = load_region_cached(BOX, ["2020"], cfg, tag="t", name="r")
    cache_files = os.listdir(cfg.cache_dir)
    assert len(cache_files) == 1 and cache_files[0].endswith(".npz")
    # Second load must come from cache — poison the root to prove it.
    import shutil

    shutil.rmtree(era5_root)
    r2 = load_region_cached(BOX, ["2020"], cfg, tag="t", name="r")
    np.testing.assert_array_equal(r1.weather, r2.weather)
    np.testing.assert_array_equal(r1.times, r2.times)


def test_era5_requires_xarray_without_fake(tmp_path):
    assert "xarray" not in sys.modules or sys.modules["xarray"] is not fake_xarray
    cfg = DataConfig(root=str(tmp_path), cache_dir=str(tmp_path / "c"))
    with pytest.raises((ImportError, FileNotFoundError)):
        load_region(BOX, ["2020"], cfg)


def test_merge_without_override_conflicts(era5_root):
    """The accum/instant streams genuinely overlap (`tp` differs between
    them): xarray's default merge raises, so era5.py's compat="override"
    first-stream precedence is load-bearing."""
    q = os.path.join(era5_root, "2020", "Q2")
    accum = fake_xarray.open_dataset(os.path.join(q, NC_FILENAMES[0]))
    instant = fake_xarray.open_dataset(os.path.join(q, NC_FILENAMES[1]))
    with pytest.raises(fake_xarray.MergeError, match="tp"):
        fake_xarray.merge([accum, instant])
    merged = fake_xarray.merge([accum, instant], compat="override")
    assert float(merged["tp"].values[0, 0, 0]) != -999.0


def test_mixed_expver_archive_requires_drop(era5_root, tmp_path):
    """Quarters written with and without the [T]-shaped expver variable
    concat ONLY because era5.py drops it after slicing (the fake's concat
    raises on differing variable sets, like xarray)."""
    cfg = _cfg(era5_root, tmp_path)
    region = load_region(BOX, ["2020"], cfg, strict=True, name="r")
    assert region.weather.shape[0] == 12  # both quarters present
    # Sanity: without the drop the same concat really does fail.
    q1 = fake_xarray.open_dataset(
        os.path.join(era5_root, "2020", "Q1", NC_FILENAMES[0])
    )
    q2 = fake_xarray.open_dataset(
        os.path.join(era5_root, "2020", "Q2", NC_FILENAMES[0])
    )
    with pytest.raises(ValueError, match="differing variables"):
        fake_xarray.concat([q1, q2], dim="valid_time")


def test_dateline_adjacent_box(era5_root, tmp_path):
    """Boxes touching the prime-meridian seam from the west slice the 0-360
    longitude grid correctly — both in the reference's own spelling
    (355..360, main.py "Sahara") and the natural negative one (-5..0, which
    to_0360 alone would collapse to an empty 355..0 range)."""
    cfg = _cfg(era5_root, tmp_path)
    ref_style = load_region(
        (12.0, 20.0, 355.0, 360.0), ["2020"], cfg, strict=True
    )
    region = load_region((12.0, 20.0, -5.0, 0.0), ["2020"], cfg, strict=True)
    np.testing.assert_array_equal(ref_style.weather, region.weather)
    # LONS covers 340..359.5; 355..360 -> 10 grid points at 0.5 deg.
    assert region.weather.shape[2] == 10
    np.testing.assert_allclose(region.lons.min(), 355.0)
    np.testing.assert_allclose(region.lons.max(), 359.5)
    assert np.isfinite(region.weather).all()


def test_wraparound_box_raises(era5_root, tmp_path):
    """A box genuinely wrapping the 0/360 meridian (e.g. -10..10) cannot be
    expressed as one longitude slice; the loader must refuse loudly instead
    of silently selecting zero columns (round-3 review finding)."""
    cfg = _cfg(era5_root, tmp_path)
    with pytest.raises(ValueError, match="wraps the 0/360 meridian"):
        load_region((12.0, 20.0, -10.0, 10.0), ["2020"], cfg, strict=True)

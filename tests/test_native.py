"""Native C++ pipeline vs numpy fallback parity.

Builds native/libwf_native.so on demand (skips if no toolchain) and checks
that every native kernel reproduces the numpy reference path bit-for-bit
(or to float tolerance where accumulation order differs).
"""

import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu import native
from weatherforecast_stgcn_maml_tpu.config import NUM_WEATHER_VARS
from weatherforecast_stgcn_maml_tpu.data.preprocess import prepare_features
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region
from weatherforecast_stgcn_maml_tpu.data.windows import WindowSpec
from weatherforecast_stgcn_maml_tpu.graph import knn_edges, normalized_adjacency
from weatherforecast_stgcn_maml_tpu.train.tasks import _materialize

pytestmark = pytest.mark.skipif(
    not native.build(), reason="native toolchain unavailable"
)


@pytest.fixture(autouse=True)
def native_on():
    native.set_enabled(True)
    yield
    native.set_enabled(True)


def _with_numpy_path(fn):
    native.set_enabled(False)
    try:
        return fn()
    finally:
        native.set_enabled(True)


def test_knn_edges_parity():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 10, size=(60, 2))
    e_native = knn_edges(pos, k=4)
    e_numpy = _with_numpy_path(lambda: knn_edges(pos, k=4))
    np.testing.assert_array_equal(e_native, e_numpy)


def test_knn_edges_parity_on_regular_grid_ties():
    """Regular grids have equidistant candidates everywhere; both paths must
    break ties identically ((distance, index) order) or models trained with
    the .so would run on a different graph without it."""
    from weatherforecast_stgcn_maml_tpu.graph import grid_node_positions

    pos = grid_node_positions(np.arange(5.0) * 0.25, np.arange(5.0) * 0.25)
    e_native = knn_edges(pos, k=4)
    e_numpy = _with_numpy_path(lambda: knn_edges(pos, k=4))
    np.testing.assert_array_equal(e_native, e_numpy)
    a_native = normalized_adjacency(e_native, 25, pad_to=32)
    a_numpy = _with_numpy_path(lambda: normalized_adjacency(e_numpy, 25, pad_to=32))
    np.testing.assert_allclose(a_native, a_numpy, atol=1e-7)


def test_normalized_adjacency_parity():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 5, size=(30, 2))
    edges = knn_edges(pos, k=3)
    a_native = normalized_adjacency(edges, 30, pad_to=64)
    a_numpy = _with_numpy_path(lambda: normalized_adjacency(edges, 30, pad_to=64))
    np.testing.assert_allclose(a_native, a_numpy, rtol=1e-6, atol=1e-7)


def test_nan_fill_stats_parity():
    rng = np.random.default_rng(2)
    data = rng.normal(5.0, 2.0, size=(50, 8, NUM_WEATHER_VARS)).astype(np.float32)
    data[rng.random(data.shape) < 0.2] = np.nan
    data[..., 3] = np.nan  # all-NaN column
    d_native = np.ascontiguousarray(data.copy())
    mean, std = native.nan_fill_stats_native(d_native)

    from weatherforecast_stgcn_maml_tpu.data.preprocess import (
        compute_stats,
        fill_nans_with_mean,
    )

    d_numpy = fill_nans_with_mean(data.copy())
    stats = compute_stats(d_numpy.reshape(-1, 1, NUM_WEATHER_VARS))
    np.testing.assert_allclose(d_native, d_numpy, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(mean, stats.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(std, stats.std, rtol=1e-4, atol=1e-5)


def test_prepare_features_native_vs_numpy_and_no_mutation():
    region = synthetic_region(num_timesteps=48, seed=3, nan_fraction=0.1)
    before = region.weather.copy()
    f_native, s_native = prepare_features(region)
    np.testing.assert_array_equal(region.weather, before)  # caller untouched
    f_numpy, s_numpy = _with_numpy_path(lambda: prepare_features(region))
    # Native accumulates in double; numpy's f32 nanmean on 1e5-magnitude
    # variables (sp/str) is off by up to ~3 raw units, which shows up as
    # ~0.01 z-units on NaN-filled entries. Native is the more accurate
    # path, so the comparison uses correspondingly loose tolerances.
    np.testing.assert_allclose(s_native.mean, s_numpy.mean, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(s_native.std, s_numpy.std, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(f_native, f_numpy, rtol=2e-3, atol=2e-2)


def test_gather_windows_parity():
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(40, 12, 16)).astype(np.float32)
    spec = WindowSpec(window=6, horizon=3)
    anchors = np.array([6, 9, 30])
    x_n, y_n = _materialize(feats, anchors, spec)
    x_p, y_p = _with_numpy_path(lambda: _materialize(feats, anchors, spec))
    assert x_n.shape == (3, 6, 12, 16)
    assert y_n.shape == (3, 3, 12, 12)
    np.testing.assert_array_equal(x_n, x_p)
    np.testing.assert_array_equal(y_n, y_p)


def test_disabled_native_returns_none():
    native.set_enabled(False)
    assert native.knn_edges_native(np.zeros((4, 2)), 2) is None
    assert not native.normalize_native(
        np.zeros((2, 2), np.float32), np.zeros(2), np.ones(2)
    )


def test_gather_windows_rejects_out_of_range_anchor():
    """The C++ gather memcpy's blindly; the wrapper must refuse anchors that
    would read out of bounds (round-3 review finding)."""
    import pytest

    if not native.available():
        pytest.skip("native lib unavailable")
    feats = np.zeros((20, 4, 16), np.float32)
    with pytest.raises(ValueError, match="anchor out of range"):
        native.gather_windows_native(feats, np.array([3]), 6, 3, 12)
    with pytest.raises(ValueError, match="anchor out of range"):
        native.gather_windows_native(feats, np.array([18]), 6, 3, 12)
    out = native.gather_windows_native(feats, np.array([6, 16]), 6, 3, 12)
    assert out is not None

"""Mesh-sharded region-fleet adaptation (parallel/fleet_mesh.py,
engines/fleet_adapt.py): numerical equivalence to the serial engine and
padding behavior, on the 8 fake CPU devices."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.config import (
    AdaptConfig,
    ExperimentConfig,
    MeshConfig,
    MetaConfig,
    ModelConfig,
)
from weatherforecast_stgcn_maml_tpu.engines.adapt import run_adaptation
from weatherforecast_stgcn_maml_tpu.engines.fleet_adapt import run_fleet_adaptation
from weatherforecast_stgcn_maml_tpu.models.registry import init_model
from weatherforecast_stgcn_maml_tpu.utils.checkpoint import save_checkpoint

MODEL = ModelConfig(
    hidden_channels=8, gcn_layers=2, lstm_hidden=8, lstm_layers=1,
    window=6, horizon=2, koppen_dim=4,
)
REGIONS = [
    ((10.0, 10.75, 20.0, 20.75), "India"),       # tropical zone list
    ((30.0, 30.75, 40.0, 40.75), "Moscow"),      # cold
    ((50.0, 50.75, 60.0, 60.75), "NewYork"),     # temperate
]


def _cfg(tmp_path, **adapt_kw):
    kw = dict(epochs=2, batch_size=4, max_samples=40)
    kw.update(adapt_kw)
    return ExperimentConfig(
        model=MODEL,
        meta=MetaConfig(meta_batch=2, grad_accum=1),
        adapt=AdaptConfig(**kw),
        mesh=MeshConfig(num_devices=8),
        out_dir=str(tmp_path),
    )


def _seed_meta_ckpt(cfg):
    params = init_model(jax.random.key(0), cfg.model)
    save_checkpoint(
        os.path.join(cfg.out_dir, "meta", "ckpt_best"),
        {"params": params},
        {"schema": "wfstgcn-meta-v1", "epoch": 1, "family": cfg.model.family},
    )


def test_fleet_adaptation_matches_serial_engine(tmp_path):
    """Each region's fleet result must match the serial engine bit-for-bit
    in protocol: same epoch losses and val MSE (same rng streams, same
    batch order, same optimizer). Pinned to threefry keys: the default
    "rbg" impl draws different hardware-RNG bits under shard_map sharding
    than outside it (jax.random docs), so exact equivalence is only
    provable on a sharding-stable key impl — the rbg default is covered by
    the statistical check below."""
    cfg = _cfg(tmp_path / "fleet", rng_impl="threefry2x32")
    _seed_meta_ckpt(cfg)
    fleet = run_fleet_adaptation(cfg, REGIONS, log_cb=lambda *a: None)

    cfg2 = _cfg(tmp_path / "serial", rng_impl="threefry2x32")
    _seed_meta_ckpt(cfg2)
    for (box, name), fres in zip(REGIONS, fleet):
        sres = run_adaptation(cfg2, box, name, log_cb=lambda *a: None)
        np.testing.assert_allclose(
            fres.epoch_losses, sres.epoch_losses, rtol=2e-5,
            err_msg=f"{name} epoch losses diverge",
        )
        np.testing.assert_allclose(
            fres.val_mse, sres.val_mse, rtol=2e-5,
            err_msg=f"{name} val MSE diverges",
        )
        assert os.path.exists(fres.ckpt_path)


def test_fleet_close_to_serial_under_rbg(tmp_path):
    """With the default rbg keys fleet and serial draw different dropout
    masks (sharding-dependent bits) — losses must still agree statistically
    (same data, same optimizer; only the mask draw differs)."""
    cfg = _cfg(tmp_path / "fleet")
    _seed_meta_ckpt(cfg)
    fleet = run_fleet_adaptation(cfg, REGIONS[:1], log_cb=lambda *a: None)
    cfg2 = _cfg(tmp_path / "serial")
    _seed_meta_ckpt(cfg2)
    sres = run_adaptation(cfg2, *REGIONS[0], log_cb=lambda *a: None)
    np.testing.assert_allclose(
        fleet[0].epoch_losses, sres.epoch_losses, rtol=2e-2,
        err_msg="fleet/serial losses not statistically close under rbg",
    )


def test_fleet_pads_to_mesh_and_drops_padding(tmp_path):
    """3 regions on 8 devices: the region axis is padded with lane-0 copies
    and only real regions produce results/checkpoints."""
    cfg = _cfg(tmp_path)
    _seed_meta_ckpt(cfg)
    res = run_fleet_adaptation(cfg, REGIONS[:2], log_cb=lambda *a: None)
    assert [r.region_name for r in res] == [n for _, n in REGIONS[:2]]
    assert all(np.isfinite(r.val_mse) for r in res)


def test_fleet_rejects_streaming(tmp_path):
    import pytest

    cfg = _cfg(tmp_path, max_device_timesteps=32)
    _seed_meta_ckpt(cfg)
    with pytest.raises(ValueError, match="streaming"):
        run_fleet_adaptation(cfg, REGIONS[:1], log_cb=lambda *a: None)


def test_pipeline_mesh_fleet_end_to_end(tmp_path):
    """`run_pipeline(mesh_fleet=True)` fleet-adapts pending regions, then
    validates each one normally."""
    from weatherforecast_stgcn_maml_tpu.engines.pipeline import run_pipeline

    cfg = _cfg(tmp_path)
    _seed_meta_ckpt(cfg)
    res = run_pipeline(
        cfg, REGIONS, mesh_fleet=True, make_plots=False, log_cb=lambda *a: None
    )
    assert not res.errors
    assert set(res.validations) == {n for _, n in REGIONS}
    for r in res.validations.values():
        assert np.isfinite(r["average_mse"])

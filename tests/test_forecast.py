"""Forecast (serving) engine + new CLI subcommands."""

import json

import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.config import (
    AdaptConfig,
    DataConfig,
    ExperimentConfig,
    MetaConfig,
    ModelConfig,
    WEATHER_VARS,
)
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
from weatherforecast_stgcn_maml_tpu.engines.forecast import run_forecast
from weatherforecast_stgcn_maml_tpu.engines.meta_train import run_meta_training

BOX = (10.0, 10.75, 20.0, 20.75)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("forecast")
    cfg = ExperimentConfig(
        model=ModelConfig(
            hidden_channels=8, gcn_layers=2, lstm_hidden=8, lstm_layers=1,
            window=6, horizon=2, koppen_dim=4,
        ),
        meta=MetaConfig(
            num_epochs=1, meta_batch=1, grad_accum=1, inner_epochs=1,
            inner_batches=2, query_train_mode=False,
        ),
        adapt=AdaptConfig(epochs=1, batch_size=4, max_samples=20),
        data=DataConfig(synthetic_timesteps=32, validate_max_timesteps=16),
        out_dir=str(tmp / "out"),
    )
    regions = [synthetic_region_for_box(BOX, num_timesteps=32, seed=1, name="A")]
    run_meta_training(cfg, regions, log_cb=lambda *_: None)
    return cfg


def test_run_forecast(trained):
    cfg = trained
    res = run_forecast(cfg, BOX, "FRegion", log_cb=lambda *_: None)
    h = cfg.model.horizon
    assert res.mean_forecast.shape == (h, 12)
    assert res.grid_forecast.shape == (h, 4, 4, 12)
    assert len(res.times) == h
    # Window pairs skip the anchor step (quirk 13): the first forecast row
    # is TWO steps after the last observation.
    payload0 = json.load(open(res.artifact_path))
    issued = np.datetime64(payload0["issued_from"])
    first = np.datetime64(payload0["times"][0])
    assert first - issued == np.timedelta64(2, "h")
    assert np.isfinite(res.mean_forecast).all()
    # Denormalized t2m should be in a physical Kelvin range, not z-units.
    t2m = res.mean_forecast[:, WEATHER_VARS.index("t2m")]
    assert np.all(t2m > 200) and np.all(t2m < 350)
    payload = json.load(open(res.artifact_path))
    assert payload["region_name"] == "FRegion"
    assert len(payload["times"]) == h
    assert payload["model_kind"] == "base"


def test_forecast_too_short_region(trained):
    cfg = trained
    region = synthetic_region_for_box(BOX, num_timesteps=4, seed=2)
    with pytest.raises(ValueError):
        run_forecast(cfg, BOX, "Short", region=region, log_cb=lambda *_: None)


def test_cli_forecast_and_data_report(trained, capsys):
    from weatherforecast_stgcn_maml_tpu.cli import main

    cfg = trained
    ov = [
        "-o", f"out_dir={cfg.out_dir}",
        "-o", "model.hidden_channels=8", "-o", "model.gcn_layers=2",
        "-o", "model.lstm_hidden=8", "-o", "model.lstm_layers=1",
        "-o", "model.window=6", "-o", "model.horizon=2",
        "-o", "model.koppen_dim=4",
        "-o", "data.synthetic_timesteps=32",
    ]
    lat_min, lat_max, lon_min, lon_max = BOX
    box_args = ["--box", str(lat_min), str(lat_max), str(lon_min), str(lon_max)]
    assert main(["forecast", *box_args, "--name", "CliF", *ov]) == 0
    out = capsys.readouterr().out
    assert "forecast=" in out and "CliF" in out

    assert main(["data-report", *box_args, "--name", "CliF", *ov]) == 0
    out = capsys.readouterr().out
    assert "t2m" in out and "nodes" in out


def test_imported_reference_checkpoint_validates(tmp_path):
    """Full switch-over path: reference .pt -> import -> run_validation."""
    torch = pytest.importorskip("torch")
    from test_torch_import import _reference_state_dicts

    model_cfg = ModelConfig(
        hidden_channels=8, gcn_layers=2, lstm_hidden=6, lstm_layers=2,
        window=6, horizon=2, koppen_dim=8,
    )
    hybrid, koppen, _ = _reference_state_dicts(model_cfg)
    pt = str(tmp_path / "ref.pt")
    torch.save(
        {
            "hybrid_model_state_dict": hybrid,
            "koppen_embed_state_dict": koppen,
            "config": {
                "hidden_channels": 8, "window_size": 6, "forecast_horizon": 2,
            },
            "hybrid_config": {"lstm_hidden_size": 6, "lstm_num_layers": 2},
        },
        pt,
    )
    out_dir = str(tmp_path / "out")
    from weatherforecast_stgcn_maml_tpu.cli import main

    assert main(["import-checkpoint", pt, "-o", f"out_dir={out_dir}"]) == 0

    from weatherforecast_stgcn_maml_tpu.engines.validate import run_validation

    cfg = ExperimentConfig(
        model=model_cfg,
        data=DataConfig(synthetic_timesteps=32, validate_max_timesteps=16),
        out_dir=out_dir,
    )
    res = run_validation(cfg, BOX, "Imported", make_plots=False, log_cb=lambda *_: None)
    assert res.model_kind == "base"
    assert np.isfinite(res.results["average_mse"])


def test_cli_import_checkpoint(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from weatherforecast_stgcn_maml_tpu.cli import main

    cfg_model = ModelConfig(
        hidden_channels=8, gcn_layers=2, lstm_hidden=6, lstm_layers=2,
        window=4, horizon=3, koppen_dim=5,
    )
    from test_torch_import import _reference_state_dicts

    hybrid, koppen, _ = _reference_state_dicts(cfg_model)
    pt = str(tmp_path / "ref.pt")
    torch.save(
        {
            "hybrid_model_state_dict": hybrid,
            "koppen_embed_state_dict": koppen,
            "config": {
                "hidden_channels": 8, "window_size": 4, "forecast_horizon": 3,
            },
            "hybrid_config": {"lstm_hidden_size": 6, "lstm_num_layers": 2},
        },
        pt,
    )
    out_dir = str(tmp_path / "imported")
    assert main(["import-checkpoint", pt, "--out", out_dir]) == 0
    assert "imported" in capsys.readouterr().out

    from weatherforecast_stgcn_maml_tpu.utils.checkpoint import load_checkpoint

    arrays, meta = load_checkpoint(out_dir)
    assert meta["imported_from"] == pt
    assert arrays["params"]["koppen"].shape == (31, 5)


def test_cli_import_checkpoint_as_adapted(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import numpy as _np

    from test_torch_import import _reference_state_dicts
    from weatherforecast_stgcn_maml_tpu.cli import main
    from weatherforecast_stgcn_maml_tpu.engines.adapt import adapted_ckpt_path
    from weatherforecast_stgcn_maml_tpu.utils.checkpoint import (
        checkpoint_exists,
        load_checkpoint,
    )

    cfg_model = ModelConfig(
        hidden_channels=8, gcn_layers=2, lstm_hidden=6, lstm_layers=2,
        window=4, horizon=3, koppen_dim=5,
    )
    hybrid, koppen, _ = _reference_state_dicts(cfg_model)
    pt = str(tmp_path / "adapted.pt")
    torch.save(
        {
            "hybrid_model_state_dict": hybrid,
            "koppen_embed_state_dict": koppen,
            "config": {"hidden_channels": 8, "window_size": 4, "forecast_horizon": 3},
            "hybrid_config": {"lstm_hidden_size": 6, "lstm_num_layers": 2},
            "stats": {"mean": _np.zeros(12), "std": _np.ones(12)},
            "region_name": "Moscow",
        },
        pt,
    )
    out_dir = str(tmp_path / "out")
    assert (
        main(["import-checkpoint", pt, "--region", "Moscow", "-o", f"out_dir={out_dir}"])
        == 0
    )
    box = (53, 58, 35, 40)
    path = adapted_ckpt_path(out_dir, "Moscow", box)
    assert checkpoint_exists(path)
    _, meta = load_checkpoint(path)
    assert meta["schema"] == "wfstgcn-adapted-v1"
    assert meta["region_name"] == "Moscow"
    assert meta["stats"]["std"][0] == 1.0

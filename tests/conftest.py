"""Test environment: force the CPU backend with 8 fake devices so sharding
and collective paths are exercised without TPU hardware (SURVEY.md section 4,
test strategy item (d)). Must run before any jax import."""

import os

# Force-override: the TPU image presets JAX_PLATFORMS=axon (the remote TPU
# tunnel) and its sitecustomize sets jax.config.jax_platforms directly, so
# both the env var AND the config value must be pinned to the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from weatherforecast_stgcn_maml_tpu.config import ModelConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_cfg() -> ModelConfig:
    """A scaled-down architecture for fast tests."""
    return ModelConfig(
        hidden_channels=16,
        gcn_layers=2,
        lstm_hidden=8,
        lstm_layers=2,
        window=6,
        horizon=3,
        koppen_dim=4,
        gcn_dropout=0.1,
        lstm_dropout=0.1,
    )


@pytest.fixture(scope="session")
def tiny_region():
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region

    return synthetic_region(
        10.0, 11.0, 20.0, 21.0, num_timesteps=64, resolution=0.25, seed=3
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(0)

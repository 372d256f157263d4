"""Shared case for the 2-OS-process pipeline-fleet test.

Both pipeline_worker.py processes and the validating test process build
the identical tiny synthetic config from one shared out_dir, so the only
coordination channel is the filesystem — exactly the multi-host fleet
recipe engines/pipeline.py documents (checkpoint exchange via shared
storage, regions partitioned by shard_id/num_shards).
"""

from weatherforecast_stgcn_maml_tpu.config import (
    AdaptConfig,
    DataConfig,
    ExperimentConfig,
    MetaConfig,
    ModelConfig,
)

BOXES = [
    ((10.0, 10.75, 20.0, 20.75), "FleetA"),
    ((30.0, 30.75, 40.0, 40.75), "FleetB"),
    ((50.0, 50.75, 60.0, 60.75), "FleetC"),
    ((-20.0, -19.25, 80.0, 80.75), "FleetD"),
]


def make_cfg(out_dir: str) -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(
            hidden_channels=8, gcn_layers=2, lstm_hidden=8, lstm_layers=1,
            window=6, horizon=2, koppen_dim=4,
        ),
        meta=MetaConfig(
            num_epochs=2, meta_batch=2, grad_accum=1, inner_epochs=1,
            inner_batches=2, query_train_mode=False,
        ),
        adapt=AdaptConfig(epochs=2, batch_size=4, max_samples=40),
        data=DataConfig(synthetic_timesteps=48, validate_max_timesteps=20),
        out_dir=out_dir,
    )

"""Workflow engines (reference layers L4/L5): meta-train, adapt, validate,
and the multi-region pipeline driver."""

from weatherforecast_stgcn_maml_tpu.engines.meta_train import run_meta_training  # noqa: F401
from weatherforecast_stgcn_maml_tpu.engines.adapt import run_adaptation  # noqa: F401
from weatherforecast_stgcn_maml_tpu.engines.validate import run_validation  # noqa: F401
from weatherforecast_stgcn_maml_tpu.engines.pipeline import run_pipeline  # noqa: F401

"""Evaluation: per-variable metrics, forecast tables, plot artifacts."""

from weatherforecast_stgcn_maml_tpu.eval.metrics import variable_metrics  # noqa: F401

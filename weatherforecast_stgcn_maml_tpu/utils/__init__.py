"""Cross-cutting infrastructure: checkpoints, metrics, profiling."""

from weatherforecast_stgcn_maml_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from weatherforecast_stgcn_maml_tpu.utils.metrics import CsvLogger, JsonlLogger  # noqa: F401
from weatherforecast_stgcn_maml_tpu.utils.profiling import Timer, trace_span  # noqa: F401

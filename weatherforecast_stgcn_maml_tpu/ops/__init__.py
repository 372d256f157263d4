"""Custom TPU ops (Pallas kernels with XLA fallbacks)."""

from weatherforecast_stgcn_maml_tpu.ops.fused_gcn import fused_gcn_layer  # noqa: F401

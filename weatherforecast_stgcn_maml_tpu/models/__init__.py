"""Model zoo (reference layer L3): functional init/apply pytree models."""

from weatherforecast_stgcn_maml_tpu.models.stgcn import (  # noqa: F401
    init_stgcn,
    apply_stgcn,
)
from weatherforecast_stgcn_maml_tpu.models.hybrid import (  # noqa: F401
    init_hybrid,
    apply_hybrid,
    hybrid_param_count,
)
from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse  # noqa: F401
from weatherforecast_stgcn_maml_tpu.models.registry import (  # noqa: F401
    apply_model,
    init_model,
)

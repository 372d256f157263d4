"""Training engines (reference layer L4): supervised adaptation + MAML."""

from weatherforecast_stgcn_maml_tpu.train.maml import (  # noqa: F401
    MamlState,
    Task,
    make_meta_step,
    init_meta_state,
)
from weatherforecast_stgcn_maml_tpu.train.supervised import (  # noqa: F401
    make_train_step,
    make_eval_step,
)

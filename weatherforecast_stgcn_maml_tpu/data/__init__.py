"""Data ingestion and feature pipeline (reference layers L0-L2)."""

from weatherforecast_stgcn_maml_tpu.data.region import RegionData, to_0360  # noqa: F401
from weatherforecast_stgcn_maml_tpu.data.timefeat import time_features  # noqa: F401
from weatherforecast_stgcn_maml_tpu.data.preprocess import (  # noqa: F401
    NormStats,
    prepare_features,
)
from weatherforecast_stgcn_maml_tpu.data.windows import WindowSpec  # noqa: F401
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region  # noqa: F401

"""Koppen-Geiger climate classification.

Code table and majority-vote regional classifier equivalent to
dataLoader.py:74-131, decoupled from xarray: the classifier operates on any
numpy class-code field, and an optional NetCDF map reader is import-gated.
"""

from __future__ import annotations

import numpy as np

# Code -> class name (reference: dataLoader.py:74-105). Index 0 is padding.
CODE_TO_CLASS: dict[int, str] = {
    1: "Af", 2: "Am", 3: "Aw", 4: "BSh", 5: "BSk", 6: "BWh", 7: "BWk",
    8: "Cfa", 9: "Cfb", 10: "Cfc", 11: "Csa", 12: "Csb", 13: "Csc",
    14: "Cwa", 15: "Cwb", 16: "Cwc", 17: "Dfa", 18: "Dfb", 19: "Dfc",
    20: "Dfd", 21: "Dsa", 22: "Dsb", 23: "Dsc", 24: "Dsd", 25: "Dwa",
    26: "Dwb", 27: "Dwc", 28: "Dwd", 29: "EF", 30: "ET",
}

NUM_KOPPEN_CLASSES = 31  # 0..30 inclusive; 0 = unknown/padding


def majority_code(class_field: np.ndarray) -> int:
    """Majority Koppen code of a (possibly NaN-holed) class-code field.

    Returns -1 when the field contains no valid data, matching
    dataLoader.py:121-131.
    """
    flat = np.asarray(class_field, dtype=np.float64).ravel()
    flat = flat[~np.isnan(flat)].astype(np.int64)
    if flat.size == 0:
        return -1
    codes, counts = np.unique(flat, return_counts=True)
    return int(codes[np.argmax(counts)])


def class_name(code: int) -> str:
    return CODE_TO_CLASS.get(code, "unknown")


def koppen_code_for_box(
    map_path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> int:
    """Majority class for a lat/lon box read from a Koppen NetCDF map
    (variable `MasterMap1` over `lat`/`lon`, as in dataLoader.py:108-131).

    Requires the optional xarray/netCDF4 extra; raises ImportError otherwise.
    """
    try:
        import xarray as xr  # deferred: not available on all images
    except ImportError as e:  # pragma: no cover - exercised only with extras
        raise ImportError(
            "Reading Koppen NetCDF maps requires `pip install .[era5]`"
        ) from e

    from weatherforecast_stgcn_maml_tpu.data.region import slice_coord_dim

    ds = xr.open_dataset(map_path)
    try:
        sel = slice_coord_dim(ds, "lat", lat_min, lat_max)
        sel = slice_coord_dim(sel, "lon", lon_min, lon_max)
        return majority_code(sel["MasterMap1"].values)
    finally:
        if hasattr(ds, "close"):
            ds.close()

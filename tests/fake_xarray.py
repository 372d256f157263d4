"""Minimal in-memory xarray stand-in for testing the ERA5 loader.

The TPU image has no xarray/netCDF4, so tests exercise
`data/era5.py`'s slicing/merging/concat logic against this fake, which
implements exactly the subset of the xarray API the loader touches:
`open_dataset`, `Dataset.sel` (slice over possibly-descending coords),
`drop_vars`, `merge(compat="override")`, `concat(dim=...)`, `sortby`,
dict-style variable access with `.values`, and `.dims`. "Files" are .npz
archives written by `write_fake_nc`.
"""

from __future__ import annotations

import numpy as np


class _Var:
    def __init__(self, values):
        self.values = np.asarray(values)


class Dataset:
    def __init__(self, variables: dict, coords: dict):
        # variables: name -> [T, lat, lon]; coords: valid_time/latitude/longitude
        self.variables = dict(variables)
        self.coords = dict(coords)

    @property
    def dims(self):
        return {
            "valid_time": len(self.coords["valid_time"]),
            "latitude": len(self.coords["latitude"]),
            "longitude": len(self.coords["longitude"]),
        }

    def __getitem__(self, name):
        if name in self.coords:
            return _Var(self.coords[name])
        return _Var(self.variables[name])

    def __contains__(self, name):
        return name in self.variables or name in self.coords

    def sel(self, indexers: dict):
        ds = self
        for dim, sl in indexers.items():
            ds = ds._sel_dim(dim, sl)
        return ds

    def _sel_dim(self, dim, sl):
        coords = np.asarray(self.coords[dim])
        lo, hi = sl.start, sl.stop
        if len(coords) > 1 and coords[0] > coords[-1]:  # descending
            mask = (coords <= lo) & (coords >= hi)
        else:
            mask = (coords >= lo) & (coords <= hi)
        idx = np.nonzero(mask)[0]
        axis = {"valid_time": 0, "latitude": 1, "longitude": 2}[dim]
        variables = {
            k: np.take(v, idx, axis=axis) for k, v in self.variables.items()
        }
        coords2 = dict(self.coords)
        coords2[dim] = coords[idx]
        return Dataset(variables, coords2)

    def drop_vars(self, names, errors="raise"):
        if isinstance(names, str):
            names = [names]
        variables = dict(self.variables)
        for n in names:
            if n in variables:
                del variables[n]
            elif errors == "raise":
                raise KeyError(n)
        return Dataset(variables, self.coords)

    def sortby(self, dim):
        order = np.argsort(np.asarray(self.coords[dim]), kind="stable")
        axis = {"valid_time": 0}[dim]
        variables = {
            k: np.take(v, order, axis=axis) for k, v in self.variables.items()
        }
        coords = dict(self.coords)
        coords[dim] = np.asarray(self.coords[dim])[order]
        return Dataset(variables, coords)


def open_dataset(path):
    with np.load(path, allow_pickle=False) as z:
        coords = {
            "valid_time": z["coord_valid_time"].astype("datetime64[ns]"),
            "latitude": z["coord_latitude"],
            "longitude": z["coord_longitude"],
        }
        variables = {
            k[4:]: z[k] for k in z.files if k.startswith("var_")
        }
    return Dataset(variables, coords)


def merge(datasets, compat="override"):
    assert compat == "override"
    variables = {}
    for ds in datasets:  # first occurrence wins
        for k, v in ds.variables.items():
            variables.setdefault(k, v)
    return Dataset(variables, datasets[0].coords)


def concat(datasets, dim):
    assert dim == "valid_time"
    names = set().union(*(d.variables for d in datasets))
    variables = {}
    for k in names:
        parts = [d.variables[k] for d in datasets if k in d.variables]
        variables[k] = np.concatenate(parts, axis=0)
    coords = dict(datasets[0].coords)
    coords["valid_time"] = np.concatenate(
        [np.asarray(d.coords["valid_time"]) for d in datasets]
    )
    return Dataset(variables, coords)


def write_fake_nc(path, variables: dict, times, lats, lons):
    """Write a fake 'NetCDF' (npz) file open_dataset can read."""
    payload = {
        "coord_valid_time": np.asarray(times, dtype="datetime64[ns]").astype(
            np.int64
        ),
        "coord_latitude": np.asarray(lats, dtype=np.float64),
        "coord_longitude": np.asarray(lons, dtype=np.float64),
    }
    for k, v in variables.items():
        payload[f"var_{k}"] = np.asarray(v, dtype=np.float32)
    # Write through a handle: np.savez(path) would append ".npz" to the
    # ".nc"-suffixed filename.
    with open(path, "wb") as f:
        np.savez(f, **payload)

"""Minimal in-memory xarray stand-in for testing the ERA5 loader.

The TPU image has no xarray/netCDF4, so tests exercise
`data/era5.py`'s slicing/merging/concat logic against this fake, which
implements exactly the subset of the xarray API the loader touches:
`open_dataset`, `Dataset.sel` (slice over possibly-descending coords),
`drop_vars`, `merge`, `concat(dim=...)`, `sortby`, dict-style variable
access with `.values`, and `.dims`. "Files" are .npz archives written by
`write_fake_nc`.

Fidelity notes (VERDICT r2 item 7 — make the first real-ERA5 run boring):

  * variables are DIMS-AWARE: a variable may be [T, lat, lon] or [T]-only
    (like the `expver` coordinate variable post-2024 CDS files carry), and
    slicing/sorting only touch the axes a variable actually has;
  * `merge` defaults to xarray's `compat="no_conflicts"` and RAISES on
    conflicting values for a shared variable — era5.py's
    `compat="override"` (first-stream precedence over the accum/instant
    overlap) is therefore load-bearing in tests;
  * `concat` raises when variable sets differ across datasets — the real
    mixed-archive hazard (some quarters re-downloaded with an `expver`
    variable, some without) that makes era5.py's
    `drop_vars("expver", errors="ignore")` load-bearing.
"""

from __future__ import annotations

import numpy as np

_COORD_DIMS = ("valid_time", "latitude", "longitude")


class MergeError(ValueError):
    pass


class _Var:
    def __init__(self, values, dims=None):
        self.values = np.asarray(values)
        if dims is None:
            dims = _COORD_DIMS[: self.values.ndim]
        self.dims = tuple(dims)


class Dataset:
    def __init__(self, variables: dict, coords: dict):
        # variables: name -> _Var (or raw [T, lat, lon] array, wrapped);
        # coords: valid_time/latitude/longitude 1-D arrays.
        self.variables = {
            k: v if isinstance(v, _Var) else _Var(v)
            for k, v in variables.items()
        }
        self.coords = dict(coords)

    @property
    def dims(self):
        return {d: len(self.coords[d]) for d in _COORD_DIMS}

    def __getitem__(self, name):
        if name in self.coords:
            return _Var(self.coords[name], (name,))
        return self.variables[name]

    def __contains__(self, name):
        return name in self.variables or name in self.coords

    def load(self):
        return self

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
        variables = {
            k: _Var(
                np.take(v.values, idx, axis=v.dims.index(dim))
                if dim in v.dims else v.values,
                v.dims,
            )
            for k, v in self.variables.items()
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
        variables = {
            k: _Var(
                np.take(v.values, order, axis=v.dims.index(dim))
                if dim in v.dims else v.values,
                v.dims,
            )
            for k, v in self.variables.items()
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
        variables = {}
        for k in z.files:
            if k.startswith("var_"):
                name = k[4:]
                dims_key = f"dims_{name}"
                dims = (
                    tuple(str(d) for d in z[dims_key])
                    if dims_key in z.files else None
                )
                variables[name] = _Var(z[k], dims)
    return Dataset(variables, coords)


def merge(datasets, compat="no_conflicts"):
    """xarray-like merge over data variables.

    Default `no_conflicts` raises MergeError when two datasets carry the
    same variable with different values (the accum/instant streams DO
    overlap in real ERA5 downloads); `override` keeps the first occurrence.
    """
    variables: dict = {}
    for ds in datasets:
        for k, v in ds.variables.items():
            if k not in variables:
                variables[k] = v
            elif compat == "override":
                pass  # first occurrence wins
            elif (
                variables[k].values.shape != v.values.shape
                or not np.array_equal(
                    variables[k].values, v.values, equal_nan=True
                )
            ):
                raise MergeError(
                    f"conflicting values for variable {k!r} on merge "
                    f"(compat={compat!r})"
                )
    return Dataset(variables, datasets[0].coords)


def concat(datasets, dim):
    assert dim == "valid_time"
    names = set().union(*(set(d.variables) for d in datasets))
    missing = [
        (k, i) for k in names
        for i, d in enumerate(datasets) if k not in d.variables
    ]
    if missing:
        # Real mixed archives: a quarter re-downloaded post-2024 carries
        # `expver`, an older one does not — xarray cannot concat datasets
        # with differing variable sets (era5.py must drop such extras).
        raise ValueError(
            f"cannot concat datasets with differing variables: {missing}"
        )
    variables = {}
    for k in names:
        vs = [d.variables[k] for d in datasets]
        if "valid_time" in vs[0].dims:
            axis = vs[0].dims.index("valid_time")
            variables[k] = _Var(
                np.concatenate([v.values for v in vs], axis=axis), vs[0].dims
            )
        else:
            variables[k] = vs[0]
    coords = dict(datasets[0].coords)
    coords["valid_time"] = np.concatenate(
        [np.asarray(d.coords["valid_time"]) for d in datasets]
    )
    return Dataset(variables, coords)


def write_fake_nc(path, variables: dict, times, lats, lons):
    """Write a fake 'NetCDF' (npz) file open_dataset can read.

    `variables` values may be [T, lat, lon] fields or [T]-shaped
    per-timestep variables (e.g. `expver`); dims are inferred from ndim and
    stored alongside.
    """
    payload = {
        "coord_valid_time": np.asarray(times, dtype="datetime64[ns]").astype(
            np.int64
        ),
        "coord_latitude": np.asarray(lats, dtype=np.float64),
        "coord_longitude": np.asarray(lons, dtype=np.float64),
    }
    for k, v in variables.items():
        v = np.asarray(v)
        if v.dtype.kind == "f":
            v = v.astype(np.float32)
        payload[f"var_{k}"] = v
        payload[f"dims_{k}"] = np.asarray(_COORD_DIMS[: v.ndim])
    # Write through a handle: np.savez(path) would append ".npz" to the
    # ".nc"-suffixed filename.
    with open(path, "wb") as f:
        np.savez(f, **payload)

"""NetCDF snapshot export.

The reference ships a NetCDF writer that has bit-rotted (references
removed symbols, compiled out; `main.cpp:906-1003`, `simulation.h:10`).
This one works: classic NetCDF-3 via scipy (no libnetcdf dependency),
fields as (y, x) variables with coordinate vectors and the full parameter
set as global attributes, mirroring the attribute list the reference
intended to store.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from ..core.params import SimParams


def have_netcdf() -> bool:
    try:
        from scipy.io import netcdf_file  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def save_netcdf(path: str, maps: Dict[str, np.ndarray], p: SimParams,
                t: float, it: int) -> None:
    from scipy.io import netcdf_file

    sample = next(iter(maps.values()))
    ny, nx = np.asarray(sample).shape
    with netcdf_file(path, "w") as f:
        f.createDimension("x", nx)
        f.createDimension("y", ny)
        vx = f.createVariable("x", "d", ("x",))
        vy = f.createVariable("y", "d", ("y",))
        vx[:] = (np.arange(nx) + 0.5) * (p.L0 / nx)
        vy[:] = (np.arange(ny) + 0.5) * (p.L0 / ny)
        for name, data in maps.items():
            arr = np.asarray(data, np.float64)
            if arr.shape != (ny, nx):
                raise ValueError(f"map {name!r} shape {arr.shape} != {(ny, nx)}")
            v = f.createVariable(name, "d", ("y", "x"))
            v[:, :] = arr

        f.time = float(t)
        f.iter = int(it)
        for fld in dataclasses.fields(SimParams):
            val = getattr(p, fld.name)
            if isinstance(val, (int, float, bool)):
                setattr(f, fld.name, float(val) if not isinstance(val, bool) else int(val))
            else:
                setattr(f, fld.name, str(getattr(val, "value", val)))


def load_netcdf(path: str):
    """Returns (maps dict, attrs dict)."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as f:
        maps = {}
        for name, var in f.variables.items():
            if name in ("x", "y"):
                continue
            maps[name] = np.array(var[:])
        attrs = {k: v for k, v in f._attributes.items()}
    return maps, attrs

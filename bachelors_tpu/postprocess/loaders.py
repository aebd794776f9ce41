"""Offline loaders for run artifacts.

The analog of the reference's snapshot/stat loaders (`plot.py:26-205`):
``.bin`` frames (via io.snapshot) and the stats CSV including the derived
Lmax columns (the reference derives Lmax = max(|max|, |min|),
`plot.py:150-160`).
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List

import numpy as np

from ..io.snapshot import BinSnapshot, load_bin_maps

load_snapshot = load_bin_maps


def list_run_snapshots(run_folder: str) -> List[str]:
    """Sorted maps_NNNN.bin paths of a run folder."""
    return sorted(glob.glob(os.path.join(run_folder, "maps_*.bin")))


@dataclasses.dataclass
class StatsTable:
    nx: int
    ny: int
    dt: float
    columns: Dict[str, np.ndarray]
    step_res_count: int

    def __getitem__(self, key):
        return self.columns[key]


def load_stats_csv(path: str) -> StatsTable:
    with open(path) as f:
        first = f.readline().strip().split(",")
        nx, ny, dt = int(first[0]), int(first[1]), float(first[2])
        header = [h.strip().strip('"') for h in f.readline().strip().split(",")]
        rows = []
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith('"'):   # repeated header from append-mode? skip
                continue
            parts = line.split(",")
            # appended blocks may repeat the nx,ny,dt line -- skip those
            if len(parts) == 3 and "." in parts[2] and parts[0].isdigit():
                continue
            rows.append([float(p) if p else np.nan for p in parts])
    arr = np.array(rows) if rows else np.zeros((0, len(header)))
    cols = {h: arr[:, i] if arr.size else np.array([])
            for i, h in enumerate(header) if i < arr.shape[1]}

    # derived Lmax columns, as the reference loader computes
    for fld in ("T_delta", "Phi_delta"):
        if f"{fld}_max" in cols and f"{fld}_min" in cols:
            cols[f"{fld}_Lmax"] = np.maximum(np.abs(cols[f"{fld}_max"]),
                                             np.abs(cols[f"{fld}_min"]))
    n_res = sum(1 for h in header if h.startswith("step_res_L1["))
    for s in range(n_res):
        mx, mn = f"step_res_max[{s}]", f"step_res_min[{s}]"
        if mx in cols and mn in cols:
            cols[f"step_res_Lmax[{s}]"] = np.maximum(np.abs(cols[mx]),
                                                     np.abs(cols[mn]))
    return StatsTable(nx=nx, ny=ny, dt=dt, columns=cols, step_res_count=n_res)

"""Stats accumulation + CSV schema identical to the reference.

Mirrors ``App_Stats`` accumulation (`main.cpp:192-234`) and
``save_csv_stat_file`` (`main.cpp:782-823`): first line ``nx,ny,dt``, then a
quoted header row with 12 base columns plus 4 per live corrector iteration,
then one row per collected step; successive snapshots append and the
in-memory vectors are cleared after each write (`main.cpp:867-893`).
Readable by the reference's ``plot.py:104-205`` loader.
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..core.state import StepStats


@dataclasses.dataclass
class StatsAccumulator:
    rows: List[dict] = dataclasses.field(default_factory=list)
    step_res_count: int = 0
    writes: int = 0

    def collect(self, s: StepStats) -> None:
        """Append one step's stats (host-side; call with concrete values)."""
        n = int(s.step_res_count)
        self.step_res_count = max(self.step_res_count, n)
        self.rows.append(dict(
            time=float(s.t), iter=int(s.iter),
            Phi_iters=int(s.Phi_iters), T_iters=int(s.T_iters),
            T_delta_L1=float(s.T_delta_L1), T_delta_L2=float(s.T_delta_L2),
            T_delta_max=float(s.T_delta_max), T_delta_min=float(s.T_delta_min),
            Phi_delta_L1=float(s.Phi_delta_L1), Phi_delta_L2=float(s.Phi_delta_L2),
            Phi_delta_max=float(s.Phi_delta_max), Phi_delta_min=float(s.Phi_delta_min),
            step_res_L1=np.asarray(s.step_res_L1)[:n].tolist(),
            step_res_L2=np.asarray(s.step_res_L2)[:n].tolist(),
            step_res_max=np.asarray(s.step_res_max)[:n].tolist(),
            step_res_min=np.asarray(s.step_res_min)[:n].tolist(),
        ))

    def save_csv(self, path: str, nx: int, ny: int, dt: float) -> None:
        """Write-or-append, then clear (reference snapshot-flush protocol).

        An empty FIRST flush is skipped entirely: the header's per-corrector
        residual columns are sized from step_res_count, which is only known
        once rows exist (writing it early would freeze the schema at 0
        residual slots and orphan later columns)."""
        if not self.rows and self.writes == 0:
            return
        append = self.writes != 0
        with open(path, "ab" if append else "wb") as fb:
            f = _TextShim(fb)
            if not append:
                f.write(f"{nx},{ny},{dt:f}\n")
                cols = ['"time"', '"iter"', '"Phi_iters"', '"T_iters"',
                        '"T_delta_L1"', '"T_delta_L2"', '"T_delta_max"', '"T_delta_min"',
                        '"Phi_delta_L1"', '"Phi_delta_L2"', '"Phi_delta_max"', '"Phi_delta_min"']
                for s in range(self.step_res_count):
                    cols += [f'"step_res_L1[{s}]"', f'"step_res_L2[{s}]"',
                             f'"step_res_max[{s}]"', f'"step_res_min[{s}]"']
                f.write(",".join(cols) + "\n")
            for r in self.rows:
                vals = [f"{r['time']:f}", str(r["iter"]), str(r["Phi_iters"]),
                        str(r["T_iters"])]
                for k in ("T_delta_L1", "T_delta_L2", "T_delta_max", "T_delta_min",
                          "Phi_delta_L1", "Phi_delta_L2", "Phi_delta_max", "Phi_delta_min"):
                    vals.append(f"{r[k]:f}")
                for s in range(self.step_res_count):
                    for k in ("step_res_L1", "step_res_L2", "step_res_max", "step_res_min"):
                        arr = r[k]
                        vals.append(f"{arr[s]:f}" if s < len(arr) else "")
                f.write(",".join(vals) + "\n")
        self.rows.clear()
        self.writes += 1


class _TextShim:
    def __init__(self, fb):
        self.fb = fb

    def write(self, s: str):
        self.fb.write(s.encode())

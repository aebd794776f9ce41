"""Interface extraction & comparison metrics.

The analog of the reference's offline interface tooling: hand-rolled
marching squares + segment joining + optional spline smoothing for the
phi = 0.5 front outline (`plot.py:350-429`), interface-width measurement in
xi units (`plot.py:496-536`), and L1 phase-field distances between runs,
continuous and 0.5-thresholded, emitted as LaTeX tables (`plot.py:554-693`).

Implementation is a from-scratch vectorized numpy marching squares (cases
resolved per cell, asymptotic ambiguity broken by the cell-center mean),
not a port of the reference's Python.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# segment table: case -> list of (edge_a, edge_b) pairs.
# edges: 0 = bottom (y0), 1 = right, 2 = top, 3 = left; corner bit k set
# means corner value > level; corners: 0=(x0,y0) 1=(x1,y0) 2=(x1,y1) 3=(x0,y1)
_SEGMENTS = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    3: [(3, 1)], 12: [(3, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    6: [(0, 2)], 9: [(0, 2)],
    7: [(3, 2)], 8: [(3, 2)],
    # ambiguous saddles; resolved at runtime via the center mean
    5: [(3, 0), (1, 2)],
    10: [(0, 1), (3, 2)],
}


def extract_interface(phi: np.ndarray, level: float = 0.5,
                      dx: float = 1.0, dy: float = 1.0,
                      origin: Tuple[float, float] = (0.5, 0.5),
                      join: bool = True) -> List[np.ndarray]:
    """Marching-squares contour of ``phi`` at ``level``.

    Returns a list of polylines, each (k, 2) arrays of (x, y) in physical
    units with cell centers at ((i+origin_x)*dx, (j+origin_y)*dy).
    With ``join=False`` returns raw 2-point segments.
    """
    phi = np.asarray(phi, np.float64)
    ny, nx = phi.shape
    A = phi[:-1, :-1]
    B = phi[:-1, 1:]
    C = phi[1:, 1:]
    D = phi[1:, :-1]
    case = ((A > level).astype(int)
            | ((B > level).astype(int) << 1)
            | ((C > level).astype(int) << 2)
            | ((D > level).astype(int) << 3))

    with np.errstate(divide="ignore", invalid="ignore"):
        tb = (level - A) / (B - A)   # bottom edge param (x-direction)
        tr = (level - B) / (C - B)   # right edge (y-direction)
        tt = (level - D) / (C - D)   # top edge (x-direction)
        tl = (level - A) / (D - A)   # left edge (y-direction)

    jj, ii = np.nonzero((case > 0) & (case < 15))
    segments = []
    ox, oy = origin
    for j, i in zip(jj, ii):
        c = int(case[j, i])
        segs = _SEGMENTS[c]
        if c in (5, 10):
            center = 0.25 * (A[j, i] + B[j, i] + C[j, i] + D[j, i])
            # flip pairing when the center disagrees with the corner bits
            if (center > level) != (c == 5):
                segs = [(segs[0][0], segs[1][1]), (segs[1][0], segs[0][1])]

        def edge_point(e):
            if e == 0:
                return (i + np.clip(tb[j, i], 0, 1), j + 0.0)
            if e == 1:
                return (i + 1.0, j + np.clip(tr[j, i], 0, 1))
            if e == 2:
                return (i + np.clip(tt[j, i], 0, 1), j + 1.0)
            return (i + 0.0, j + np.clip(tl[j, i], 0, 1))

        for ea, eb in segs:
            xa, ya = edge_point(ea)
            xb, yb = edge_point(eb)
            segments.append(((xa, ya), (xb, yb)))

    pts = [np.array([[((x + ox) * dx), ((y + oy) * dy)] for x, y in seg])
           for seg in segments]
    if not join:
        return pts
    return _join_segments(pts)


def _join_segments(segments: List[np.ndarray], tol: float = 1e-9) -> List[np.ndarray]:
    """Stitch 2-point segments into polylines by endpoint matching."""
    def key(p):
        return (round(float(p[0]) / max(tol, 1e-12)), round(float(p[1]) / max(tol, 1e-12)))

    endpoints: Dict[tuple, List[int]] = {}
    for idx, seg in enumerate(segments):
        for p in (seg[0], seg[-1]):
            endpoints.setdefault(key(p), []).append(idx)

    used = [False] * len(segments)
    lines = []
    for start in range(len(segments)):
        if used[start]:
            continue
        used[start] = True
        line = [segments[start][0], segments[start][1]]
        # extend forward then backward
        for direction in (1, 0):
            while True:
                k = key(line[-1] if direction else line[0])
                nxt = None
                for idx in endpoints.get(k, []):
                    if not used[idx]:
                        nxt = idx
                        break
                if nxt is None:
                    break
                used[nxt] = True
                seg = segments[nxt]
                if key(seg[0]) == k:
                    new_pt = seg[1]
                else:
                    new_pt = seg[0]
                if direction:
                    line.append(new_pt)
                else:
                    line.insert(0, new_pt)
        lines.append(np.array(line))
    return lines


def smooth_polyline(line: np.ndarray, points: int = 400, smoothing: float = 0.0):
    """Periodic cubic-spline resampling of a closed polyline
    (`plot.py:413-429` uses scipy splines the same way)."""
    from scipy.interpolate import splev, splprep

    closed = np.allclose(line[0], line[-1], atol=1e-9)
    xy = line[:-1] if closed else line
    if len(xy) < 4:
        return line
    tck, _ = splprep([xy[:, 0], xy[:, 1]], s=smoothing, per=closed)
    u = np.linspace(0, 1, points)
    x, y = splev(u, tck)
    return np.stack([x, y], axis=1)


def contour_length(lines: Sequence[np.ndarray]) -> float:
    total = 0.0
    for ln in lines:
        d = np.diff(ln, axis=0)
        total += float(np.sqrt((d ** 2).sum(axis=1)).sum())
    return total


def interface_width(phi: np.ndarray, xi: float, dx: float, dy: float,
                    lo: float = 0.05, hi: float = 0.95) -> float:
    """Mean transition-band thickness in units of xi.

    Geometric estimate: area of the band lo < phi < hi divided by the
    length of the phi = 0.5 contour (the reference measures the same
    quantity by scanning profiles, `plot.py:496-536`).
    """
    band_area = float(((phi > lo) & (phi < hi)).sum()) * dx * dy
    lines = extract_interface(phi, 0.5, dx, dy)
    length = contour_length(lines)
    if length == 0:
        return float("nan")
    return band_area / length / xi


def phase_l1_distance(a: np.ndarray, b: np.ndarray,
                      discretize: bool = False) -> float:
    """Mean L1 distance between two phase fields; ``discretize`` thresholds
    both at 0.5 first (the reference's two table variants, `plot.py:618`)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if discretize:
        a = (a > 0.5).astype(np.float64)
        b = (b > 0.5).astype(np.float64)
    return float(np.abs(a - b).mean())


def distance_table_latex(fields: Dict[str, np.ndarray],
                         discretize: bool = False,
                         fmt: str = "{:.3e}") -> str:
    """Pairwise L1 phase-distance matrix as a LaTeX tabular
    (`plot.py:618-693` emits the same artifact)."""
    names = list(fields)
    rows = []
    header = " & ".join([""] + names) + r" \\"
    for na in names:
        cells = [na]
        for nb in names:
            d = phase_l1_distance(fields[na], fields[nb], discretize)
            cells.append(fmt.format(d))
        rows.append(" & ".join(cells) + r" \\")
    body = "\n".join([header] + rows)
    col = "l" + "c" * len(names)
    return (f"\\begin{{tabular}}{{{col}}}\n\\hline\n{body}\n\\hline\n"
            f"\\end{{tabular}}")

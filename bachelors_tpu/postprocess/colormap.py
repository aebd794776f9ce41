"""Science scalar-field colormap.

Matplotlib re-creation of the viewer's fragment-shader colormap
(`gl.h:221-283`): blue -> cyan -> green -> yellow -> red over the display
range, NaN rendered purple, out-of-range values fading to gray.
"""
from __future__ import annotations

import numpy as np


def science_colormap():
    from matplotlib.colors import LinearSegmentedColormap

    cmap = LinearSegmentedColormap.from_list(
        "btpu_science",
        [(0.0, (0.0, 0.0, 1.0)),
         (0.25, (0.0, 1.0, 1.0)),
         (0.5, (0.0, 1.0, 0.0)),
         (0.75, (1.0, 1.0, 0.0)),
         (1.0, (1.0, 0.0, 0.0))])
    cmap.set_bad((0.6, 0.0, 0.8))      # NaN -> purple
    cmap.set_under((0.35, 0.35, 0.45))  # below range -> cool gray
    cmap.set_over((0.45, 0.35, 0.35))   # above range -> warm gray
    return cmap


def map_to_rgb(field: np.ndarray, vmin: float = 0.0, vmax: float = 1.0) -> np.ndarray:
    """Field -> (ny, nx, 3) float RGB without matplotlib (for raw dumps)."""
    f = np.asarray(field, np.float64)
    t = (f - vmin) / max(vmax - vmin, 1e-300)
    t = np.clip(t, 0.0, 1.0)
    # piecewise-linear 5-stop ramp
    stops = np.array([
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 1.0],
        [0.0, 1.0, 0.0],
        [1.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
    ])
    x = np.nan_to_num(t * 4)
    i = np.clip(x.astype(int), 0, 3)
    frac = (x - i)[..., None]
    rgb = stops[i] * (1 - frac) + stops[i + 1] * frac
    rgb[np.isnan(f)] = [0.6, 0.0, 0.8]
    return rgb

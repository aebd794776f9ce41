"""Interactive viewer: live scalar-field rendering with keyboard control.

The analog of the reference's GLFW/OpenGL viewer (`gl.h`, interactive loop
`main.cpp:334-486`), re-done with matplotlib (no GL dependency; works over
X11/ssh; degrades to frame dumps headless).  Same science colormap as the
reference's fragment shader (`gl.h:221-283`) via postprocess.colormap.

Key bindings mirror `glfw_key_func` (`main.cpp:585-677`):
  space       pause / resume
  enter       single-step (step_by steps)
  d           toggle debug maps
  l           toggle linear filtering
  c           toggle corrector loop
  s           on-demand snapshot
  f1..f8      select rendered map (F, U, next_F, next_U, debug maps...)
  up/down     adjust display range
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import numpy as np

from ..core.params import SolverType
from ..core.state import SimState
from ..io.config import SimConfig
from ..utils.logging import get_logger

log = get_logger("viewer")


@dataclasses.dataclass
class ViewerState:
    paused: bool = True
    debug: bool = False
    remaining_steps: float = 0.0
    step_by: float = 1.0
    render_target: int = 0
    want_snapshot: bool = False
    closed: bool = False


def available_maps(state: SimState, cfg: SimConfig, debug: bool) -> Dict[str, np.ndarray]:
    maps = {"F": np.asarray(state.F), "U": np.asarray(state.U)}
    if debug:
        from ..core.boundary import pad2
        from ..models.allen_cahn import debug_maps

        p = cfg.params
        Fp = pad2(state.F, p.Phi_boundary)
        Up = pad2(state.U, p.T_boundary)
        gF, gU, an = debug_maps(Fp, Up, p)
        maps.update(grad_Phi=np.asarray(gF), grad_T=np.asarray(gU),
                    aniso=np.asarray(an))
    return maps


def run_interactive(cfg: SimConfig) -> None:
    """Interactive loop: render ~10 Hz, step while unpaused."""
    import matplotlib

    try:
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(7, 6))
        interactive_ok = matplotlib.get_backend().lower() not in ("agg",)
    except Exception as e:  # pragma: no cover
        log.warn(f"matplotlib unavailable for interactive mode ({e}); "
                 "falling back to headless run")
        interactive_ok = False
    if not interactive_ok:
        from .driver import run_simulation

        run_simulation(cfg)
        return

    import jax

    from ..models.initial import make_initial_fields
    from ..core.state import make_state
    from ..solvers.base import make_stepper
    from ..postprocess.colormap import science_colormap
    from .driver import _initial_state, _save_snapshot

    p = cfg.params
    state = _initial_state(cfg)
    stepper_box = [jax.jit(make_stepper(p))]
    vs = ViewerState()
    vmin, vmax = cfg.display_min, cfg.display_max

    ax = fig.add_subplot(111)
    im = ax.imshow(np.asarray(state.F), origin="lower",
                   cmap=science_colormap(), vmin=vmin, vmax=vmax,
                   extent=(0, p.L0, 0, p.L0),
                   interpolation="bilinear" if cfg.linear_filtering else "nearest")
    cb = fig.colorbar(im, ax=ax)

    def on_key(event):
        k = (event.key or "").lower()
        if k == " ":
            vs.paused = not vs.paused
            log.info(f"simulation {'paused' if vs.paused else 'running'}")
        elif k == "enter":
            vs.remaining_steps = vs.step_by
        elif k == "d":
            vs.debug = not vs.debug
            log.info(f"debug {vs.debug}")
        elif k == "c":
            cfg.params = cfg.params.replace(
                do_corrector_loop=not cfg.params.do_corrector_loop)
            # params are static in the compiled stepper: rebuild it so the
            # toggle actually takes effect (jit caches both variants)
            stepper_box[0] = jax.jit(make_stepper(cfg.params))
            log.info(f"corrector loop {cfg.params.do_corrector_loop}")
        elif k == "s":
            vs.want_snapshot = True
        elif k == "l":
            cfg.linear_filtering = not cfg.linear_filtering
            im.set_interpolation("bilinear" if cfg.linear_filtering else "nearest")
            log.info(f"linear filtering {cfg.linear_filtering}")
        elif k and k.startswith("f") and k[1:].isdigit():
            vs.render_target = int(k[1:]) - 1
        elif k == "up":
            nonlocal_range(+1)
        elif k == "down":
            nonlocal_range(-1)

    def nonlocal_range(direction):
        nonlocal vmin, vmax
        span = (vmax - vmin) or 1.0
        vmax += 0.1 * span * direction
        im.set_clim(vmin, vmax)

    fig.canvas.mpl_connect("key_press_event", on_key)
    fig.canvas.mpl_connect("close_event", lambda e: setattr(vs, "closed", True))

    import time as time_mod

    snap_idx = 0
    save_once = [0]
    plt.show(block=False)
    while not vs.closed and float(state.t) < cfg.stop_time:
        stepped = False
        if not vs.paused or vs.remaining_steps >= 1:
            state, stats = stepper_box[0](state)
            if vs.remaining_steps >= 1:
                vs.remaining_steps -= 1
            stepped = True
        if vs.want_snapshot:
            vs.want_snapshot = False
            snap_idx += 1
            os.makedirs(cfg.snapshot_folder or ".", exist_ok=True)
            _save_snapshot(cfg.snapshot_folder or ".", snap_idx, state, cfg,
                           None, save_once)
            log.info("on-demand snapshot saved")
        maps = available_maps(state, cfg, vs.debug)
        names = list(maps)
        target = names[min(vs.render_target, len(names) - 1)]
        im.set_data(maps[target])
        ax.set_title(f"{target}  t={float(state.t):.4g}  iter={int(state.iter)}"
                     f"{'  [paused]' if vs.paused else ''}")
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
        if not stepped:
            time_mod.sleep(0.05)


def render_frame(state: SimState, cfg: SimConfig, path: str,
                 target: str = "F") -> str:
    """Headless single-frame render (PNG) -- viewer fallback and pipeline
    utility."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from ..postprocess.colormap import science_colormap

    maps = available_maps(state, cfg, debug=target not in ("F", "U"))
    p = cfg.params
    fig, ax = plt.subplots(figsize=(6.4, 6))
    im = ax.imshow(maps[target], origin="lower", cmap=science_colormap(),
                   vmin=cfg.display_min, vmax=cfg.display_max,
                   extent=(0, p.L0, 0, p.L0))
    ax.set_title(f"{target}  t={float(state.t):.4g}")
    fig.colorbar(im, ax=ax)
    fig.savefig(path, bbox_inches="tight", dpi=130)
    plt.close(fig)
    return path

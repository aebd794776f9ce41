"""Interactive viewer: live scalar-field rendering with keyboard control.

The analog of the reference's GLFW/OpenGL viewer (`gl.h`, interactive loop
`main.cpp:334-486`), re-done with matplotlib (no GL dependency; works over
X11/ssh; degrades to frame dumps headless).  Same science colormap as the
reference's fragment shader (`gl.h:221-283`) via postprocess.colormap.

Key bindings mirror `glfw_key_func` (`main.cpp:585-677`) -- every reference
binding is covered:
  space       pause / resume                        (`main.cpp:596-600`)
  enter       single-step (step_by steps)           (`main.cpp:594-595`)
  d           toggle debug maps                     (`main.cpp:601-605`)
  l           toggle linear filtering               (`main.cpp:606-610`)
  c           toggle corrector loop                 (`main.cpp:611-615`)
  s           on-demand snapshot                    (`main.cpp:616-620`)
  r           display range entry 'MIN MAX' (stdin) (`main.cpp:621-641`)
  p           speed multiplier entry 'NUM' (stdin)  (`main.cpp:643-657`)
  f1..f8      select rendered map slot directly     (`main.cpp:659-666`)
  f9 / f10    cycle rendered map backward / forward (`main.cpp:668-669`)
  up/down     adjust display range (extra vs reference)
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
    map_count: int = 2
    want_snapshot: bool = False
    closed: bool = False


def _read_line(prompt: str) -> str:
    """Blocking stdin entry, the analog of the reference's scanf-based range
    and speed prompts (`main.cpp:626,646`); separated out so tests can patch
    it."""
    log.info(prompt)
    try:
        return input()
    except EOFError:  # pragma: no cover - headless stdin
        return ""


def handle_key(k: str, vs: ViewerState, cfg: SimConfig,
               set_range=None, set_filtering=None, rebuild_stepper=None) -> None:
    """Pure-ish key dispatch (testable without a GUI).  Mirrors the
    reference's `glfw_key_func` case table (`main.cpp:585-677`)."""
    k = (k or "").lower()
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
        if rebuild_stepper is not None:
            # params are static in the compiled stepper: rebuild it so the
            # toggle actually takes effect (jit caches both variants)
            rebuild_stepper()
        log.info(f"corrector loop {cfg.params.do_corrector_loop}")
    elif k == "s":
        vs.want_snapshot = True
    elif k == "l":
        cfg.linear_filtering = not cfg.linear_filtering
        if set_filtering is not None:
            set_filtering(cfg.linear_filtering)
        log.info(f"linear filtering {cfg.linear_filtering}")
    elif k == "r":
        # display-range entry, reference `main.cpp:621-641`
        parts = _read_line("Input range to display in form 'MIN space MAX'").split()
        try:
            lo, hi = float(parts[0]), float(parts[1])
        except (IndexError, ValueError):
            log.info("Bad range syntax!")
        else:
            log.info(f"displaying range [{lo:.2f}, {hi:.2f}]")
            cfg.display_min, cfg.display_max = lo, hi
            if set_range is not None:
                set_range(lo, hi)
    elif k == "p":
        # speed-multiplier entry, reference `main.cpp:643-657`
        parts = _read_line("Input simulation speed modifier in form 'NUM'").split()
        try:
            vs.step_by = float(parts[0])
        except (IndexError, ValueError):
            log.info("Bad speed syntax!")
        else:
            log.info(f"using simulation speed {vs.step_by:.2f}")
    elif k in ("f9", "f10"):
        # cycle rendered map, reference `main.cpp:668-669`
        step = 1 if k == "f10" else -1
        vs.render_target = (vs.render_target + step) % max(vs.map_count, 1)
        log.info(f"rendering map slot {vs.render_target}")
    elif k.startswith("f") and k[1:].isdigit():
        vs.render_target = int(k[1:]) - 1


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
    if p.dtype == "float64" and not jax.config.read("jax_enable_x64"):
        # same contract as run_simulation: f64 configs need x64 semantics
        jax.config.update("jax_enable_x64", True)
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

    def set_range(lo, hi):
        nonlocal vmin, vmax
        vmin, vmax = lo, hi
        im.set_clim(vmin, vmax)

    def on_key(event):
        k = (event.key or "").lower()
        if k == "up":
            nonlocal_range(+1)
        elif k == "down":
            nonlocal_range(-1)
        else:
            handle_key(
                k, vs, cfg, set_range=set_range,
                set_filtering=lambda lin: im.set_interpolation(
                    "bilinear" if lin else "nearest"),
                rebuild_stepper=lambda: stepper_box.__setitem__(
                    0, jax.jit(make_stepper(cfg.params))))

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
        vs.map_count = len(names)
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

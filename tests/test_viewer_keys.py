"""Viewer keybind parity with the reference's `glfw_key_func`
(`main.cpp:585-677`): every binding in the reference's case table has a
counterpart, including the stdin-driven R (display range) and P (speed)
prompts and the F9/F10 map-cycling slots."""
import pytest

import bachelors_tpu.app.viewer as viewer
from bachelors_tpu.app.viewer import ViewerState, handle_key
from bachelors_tpu.io.config import parse_config

from test_io_driver import CONFIG_TEXT


@pytest.fixture
def cfg():
    return parse_config(CONFIG_TEXT)


def test_speed_key_reads_multiplier(cfg, monkeypatch):
    """P: prompt for a step multiplier (`main.cpp:643-657`)."""
    vs = ViewerState()
    monkeypatch.setattr(viewer, "_read_line", lambda prompt: "2.5")
    handle_key("p", vs, cfg)
    assert vs.step_by == 2.5
    # enter then queues step_by steps (`main.cpp:594-595`)
    handle_key("enter", vs, cfg)
    assert vs.remaining_steps == 2.5


def test_speed_key_bad_syntax_keeps_old(cfg, monkeypatch):
    vs = ViewerState(step_by=3.0)
    monkeypatch.setattr(viewer, "_read_line", lambda prompt: "not-a-number")
    handle_key("p", vs, cfg)
    assert vs.step_by == 3.0


def test_range_key_sets_display_range(cfg, monkeypatch):
    """R: prompt 'MIN space MAX' (`main.cpp:621-641`)."""
    got = []
    monkeypatch.setattr(viewer, "_read_line", lambda prompt: "-0.25 0.75")
    handle_key("r", ViewerState(), cfg, set_range=lambda lo, hi: got.append((lo, hi)))
    assert cfg.display_min == -0.25 and cfg.display_max == 0.75
    assert got == [(-0.25, 0.75)]


def test_range_key_bad_syntax_keeps_old(cfg, monkeypatch):
    old = (cfg.display_min, cfg.display_max)
    monkeypatch.setattr(viewer, "_read_line", lambda prompt: "0.5")  # one number
    handle_key("r", ViewerState(), cfg)
    assert (cfg.display_min, cfg.display_max) == old


def test_f_keys_direct_and_cycle(cfg):
    """F1-F8 select slots directly; F9/F10 cycle mod map count
    (`main.cpp:659-677`)."""
    vs = ViewerState(map_count=5)
    handle_key("f3", vs, cfg)
    assert vs.render_target == 2
    handle_key("f10", vs, cfg)
    assert vs.render_target == 3
    handle_key("f10", vs, cfg)
    assert vs.render_target == 4
    handle_key("f10", vs, cfg)  # wrap forward
    assert vs.render_target == 0
    handle_key("f9", vs, cfg)  # wrap backward
    assert vs.render_target == 4


def test_toggles(cfg):
    vs = ViewerState()
    assert vs.paused
    handle_key(" ", vs, cfg)
    assert not vs.paused
    handle_key("d", vs, cfg)
    assert vs.debug
    handle_key("s", vs, cfg)
    assert vs.want_snapshot
    rebuilt = []
    before = cfg.params.do_corrector_loop
    handle_key("c", vs, cfg, rebuild_stepper=lambda: rebuilt.append(1))
    assert cfg.params.do_corrector_loop != before
    assert rebuilt == [1]
    flt = []
    before = cfg.linear_filtering
    handle_key("l", vs, cfg, set_filtering=flt.append)
    assert cfg.linear_filtering != before and flt == [cfg.linear_filtering]

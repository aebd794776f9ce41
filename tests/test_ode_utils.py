"""Scalar ODE playground + utils (timing harness, profiling, logging)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from bachelors_tpu.solvers.ode import euler, rk4, rk_merson, semi_implicit_euler
from bachelors_tpu.utils.logging import format_bytes, get_logger, log_grouped
from bachelors_tpu.utils.profiling import StepTimer
from bachelors_tpu.utils.timing import benchmark_median


class TestODE:
    """Order checks against x' = x, x(0)=1 -> x(t) = e^t (plus the
    reference's own T^2/2 case, `integration_methods.h`)."""

    f_exp = staticmethod(lambda t, x: x)
    f_t = staticmethod(lambda t, x: t)  # x(t) = t^2/2

    def test_euler_first_order(self):
        errs = [abs(float(euler(self.f_exp, 1.0, 0, 1, dt)) - math.e)
                for dt in (0.01, 0.005)]
        assert errs[0] / errs[1] == pytest.approx(2.0, rel=0.2)

    def test_rk4_fourth_order(self):
        errs = [abs(float(rk4(self.f_exp, 1.0, 0, 1, dt)) - math.e)
                for dt in (0.1, 0.05)]
        assert errs[0] / errs[1] == pytest.approx(16.0, rel=0.3)

    def test_quadratic_case_exact_for_rk(self):
        # x' = t integrated exactly by any >=2nd order scheme
        got = float(rk4(self.f_t, 0.0, 0, 2, 0.1))
        assert got == pytest.approx(2.0, rel=1e-12)

    def test_semi_implicit_converges(self):
        got = float(semi_implicit_euler(self.f_exp, 1.0, 0, 1, 0.001))
        assert got == pytest.approx(math.e, rel=1e-2)

    def test_merson_adapts_to_tolerance(self):
        x, steps = rk_merson(self.f_exp, 1.0, 0.0, 1.0, 0.5, tolerance=1e-10)
        assert float(x) == pytest.approx(math.e, rel=1e-7)
        x2, steps2 = rk_merson(self.f_exp, 1.0, 0.0, 1.0, 0.5, tolerance=1e-4)
        assert int(steps2) < int(steps)


class TestUtils:
    def test_benchmark_median_shape(self):
        stats = benchmark_median(lambda: jnp.ones(8) * 2, warmup=1,
                                 max_time_s=0.05, min_runs=3)
        assert stats.runs >= 3
        assert stats.min <= stats.median <= stats.max

    def test_step_timer(self):
        t = StepTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b", sync_on=jnp.ones(4)):
            pass
        assert t.count["a"] == 2
        assert "a" in t.report() and "b" in t.report()

    def test_format_bytes(self):
        assert format_bytes(512) == "512B"
        assert format_bytes(2048) == "2.00KB"
        assert "MB" in format_bytes(5 * 1024 * 1024)

    def test_log_group_indent(self, capsys):
        log = get_logger("t")
        with log_grouped():
            log.info("inner")
        err = capsys.readouterr().err
        assert "> inner" in err

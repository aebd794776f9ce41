from .base import Stepper, make_stepper
from .cg import CGResult, cg_solve
from .run import advance_collect, advance_n, advance_until, jit_stepper

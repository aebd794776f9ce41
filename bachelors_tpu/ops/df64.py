"""Double-f32 ("df64" / double-double) arithmetic for Pallas kernels.

The TPU VPU has no f64 hardware; XLA emulates float64 in software,
per-op and unfused (measured: an UNFUSED f64 Euler step at 2048^2 costs
24x its f32 twin, RESULTS.md).  This module provides the classic
error-free-transformation toolkit (Dekker 1971, Knuth TwoSum, and the
QD library's operation set) over PAIRS of f32 arrays, written in plain
`jnp` elementwise ops so the same code runs inside Mosaic kernels, under
the Pallas CPU interpreter, and in ordinary XLA graphs.

A value x is represented as (hi, lo) with x = hi + lo and
|lo| <= ulp(hi)/2, giving ~2^-48 relative precision (f64 is 2^-53; both
are far below the reference's 5e-9 tolerances).  The reference itself
runs "f64" with f32 transcendentals (`simulation.cu` uses sqrtf/cosf
throughout), so df64-with-refined-sqrt meets or beats its effective
precision.

Used by `ops/pallas_dd.py` (fused df64 integrator kernels).  Exact-
arithmetic requirement: IEEE round-to-nearest f32 adds/muls with NO
FMA contraction inside the EFT sequences.  XLA:CPU's LLVM codegen
contracts `multiply` feeding `add`/`subtract` into fmuladd by default
(fp-contract on, independent of every fast-math/excess-precision flag),
which silently voids TwoSum: measured, `s = p + err` with p a raw
product compiles to fma(a, b, err), whose different rounding collapses
the pair to plain-f32 accuracy.  reduce_precision(8, 23), double
bitcasts, and even lax.optimization_barrier are all folded away before
emission; the one value-identity XLA currently keeps opaque to the
contractor is `copysign(|x|, x)`.  The `eft_guards` context (used by
the CPU/interpret path) routes both inputs of each two_sum /
quick_two_sum through that guard -- the EFT adds are the only
contraction-sensitive spots, because `_split` is exact (every product
in the error accumulations is exactly representable, so contracting
those is rounding-neutral).  Mosaic/TPU traces with the flag off; the
on-device A/B against the XLA f64 oracle decides whether the VPU path
needs the guards too (tests/test_pallas_dd.py exercises the CPU side).
"""
from __future__ import annotations

import contextlib
import math

import jax.lax
import jax.numpy as jnp

_HI_MASK = 0xFFFFF000  # sign+exp+top 11 explicit mantissa bits = 12-bit significand

_GUARD = False  # route EFT-add inputs through the anti-FMA-contraction guard


@contextlib.contextmanager
def eft_guards(on: bool = True):
    """Trace-time switch: make every two_sum/quick_two_sum input opaque
    to FMA contraction.  Wrap KERNEL TRACING (e.g. the `pl.pallas_call`
    invocation) when the executor's codegen contracts mul+add (XLA:CPU;
    see module docstring)."""
    global _GUARD
    old = _GUARD
    _GUARD = on
    try:
        yield
    finally:
        _GUARD = old


def _g(x):
    """Contraction guard: copysign(|x|, x) == x for every float incl.
    NaN/Inf/-0, but XLA does not fold it, so a raw product routed through
    it can no longer be FMA-contracted into a following add."""
    return jnp.copysign(jnp.abs(x), x) if _GUARD else x


def two_sum(a, b):
    """Error-free a + b = s + err for any a, b (Knuth, 6 flops)."""
    a = _g(a)
    b = _g(b)
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Error-free a + b = s + err assuming |a| >= |b| (3 flops)."""
    a = _g(a)
    b = _g(b)
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Exact 12/12-bit significand split: a = hi + lo with hi*hi', hi*lo'
    etc. all exact in f32.  Uses an integer mantissa MASK, not Dekker's
    (2^12+1)-multiply trick: XLA:CPU's LLVM codegen contracts the Dekker
    sequence `t - (t - a)` into an FMA (fp-contract is on by default,
    independent of fast-math flags), which silently un-splits the value
    and voids two_prod's error term (measured: the fused product's lo
    plane collapses to ~ulp(p), costing the df64 state f32-level accuracy
    after 2 steps).  Bitwise ops cannot be contracted or reassociated by
    ANY float rewrite, and with an exact split every remaining mul+add in
    the error accumulation is contraction-safe (the products are exact,
    so fma(x, y, z) == round(xy) + z rounding-for-rounding)."""
    if jnp.ndim(a) == 0:
        # Mosaic's tpu.bitcast accepts only vectors; scalars (trace-time
        # constants, SMEM tau weights) take the classic Dekker multiply
        # split, with `_g` blocking the contraction that would un-split it
        t = _g(a * jnp.float32(4097.0))  # 2^12 + 1
        hi = _g(t - _g(t - a))
        return hi, a - hi
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(ai & jnp.uint32(_HI_MASK), jnp.float32)
    return hi, a - hi  # lo: bottom 12 mantissa bits, exact by construction


def two_prod(a, b):
    """Error-free a * b = p + err via exact bitmask splitting (~10 flops)."""
    # guard p here too: `(a_hi*b_hi) - p` may contract on p's multiply
    # (harmful: round(hh - ab_exact) != hh - p); contraction on hh's own
    # multiply is harmless because hh is exactly representable
    p = _g(a * b)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((((a_hi * b_hi) - p) + (a_hi * b_lo))
           + (a_lo * b_hi)) + (a_lo * b_lo)
    return p, err


def const(x: float):
    """Python float -> df64 constant (hi, lo) as python floats.

    lo is the f32-rounded residual of the f64 value; hi+lo reproduces x
    to the pair's ~2^-49 relative precision (a pair holds ~49 of f64's
    53 mantissa bits).  numpy (not jnp) on purpose: this is a host-side
    constant helper that must stay concrete under tracing."""
    import numpy as _np

    hi = float(_np.float32(x))
    lo = float(_np.float32(x - hi))
    return hi, lo


def is_pow2(x: float) -> bool:
    m, _ = math.frexp(abs(x))
    return x != 0 and m == 0.5


def add(x, y):
    """Sloppy df64 add (Dekker add2, 11 flops): error-free on the hi
    parts (TwoSum works for any signs), one f32 rounding on the lo
    accumulation -- absolute error O(2^-48 * max|operand|), same
    absolute-error law as f64's 2^-53.  Use `add_acc` where the RESULT
    of a cancellation must keep full relative precision."""
    s, e = two_sum(x[0], y[0])
    e = (e + (x[1] + y[1]))
    return quick_two_sum(s, e)


def add_acc(x, y):
    """Accurate (IEEE-style) df64 add (20 flops): also error-frees the
    lo-part addition, keeping ~2^-47 RELATIVE error through severe hi
    cancellation (QD's ieee_add)."""
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = (s2 + t1)
    s1, s2 = quick_two_sum(s1, s2)
    s2 = (s2 + t2)
    return quick_two_sum(s1, s2)


def neg(x):
    return (-x[0], -x[1])


def sub(x, y):
    return add(x, neg(y))


def add_f32(x, b):
    """df64 + f32 (b exact, e.g. an integer-valued field or constant)."""
    s, e = two_sum(x[0], b)
    e = (e + x[1])
    return quick_two_sum(s, e)


def mul(x, y):
    """df64 * df64 (Dekker mul2, ~24 flops)."""
    p, e = two_prod(x[0], y[0])
    e = e + ((x[0] * y[1]) + (x[1] * y[0]))
    return quick_two_sum(p, e)


def sqr(x):
    """df64 square (saves one split + one cross term vs mul)."""
    p = _g(x[0] * x[0])  # see two_prod: protect `hh - p` from contraction
    a_hi, a_lo = _split(x[0])
    err = (((a_hi * a_hi) - p) + 2.0 * (a_hi * a_lo)) + (a_lo * a_lo)
    err = err + 2.0 * (x[0] * x[1])
    return quick_two_sum(p, err)


def mul_f32(x, b):
    """df64 * exact-f32 scalar/array b (~19 flops)."""
    p, e = two_prod(x[0], b)
    e = (e + (x[1] * b))
    return quick_two_sum(p, e)


def mul_pow2(x, c: float):
    """df64 * power-of-two constant: EXACT, 2 flops."""
    return (x[0] * c, x[1] * c)


def mul_const(x, c: float):
    """df64 * python-float constant, picking the cheapest exact form."""
    if is_pow2(c):
        return mul_pow2(x, c)
    hi, lo = const(c)
    if lo == 0.0:
        return mul_f32(x, hi)
    return mul(x, (jnp.float32(hi), jnp.float32(lo)))


def div(x, y):
    """df64 x / y via reciprocal seed + one Karp-Markstein refinement
    (~2^-46 relative): q0 = x * (1/y_hi) is f32-accurate, the residual
    x - q0*y is computed in df64 (that difference IS the information),
    and its quotient by y needs only f32 accuracy since it scales a
    ~2^-24-small correction."""
    r = jnp.float32(1.0) / y[0]
    q0 = mul_f32(x, r)
    e = sub(x, mul(q0, y))
    return add(q0, (e[0] * r, e[1] * r))


def sqrt(x):
    """df64 sqrt: f32 rsqrt seed + one df64 Newton correction
    (Karp-Markstein style), ~2^-47 relative.  Domain x > 0; callers
    mask zeros like the f32 path does (`_g_theta_vpu`)."""
    r = jnp.float32(1.0) / jnp.sqrt(x[0])          # ~2^-24 seed
    y = mul_f32(x, r)                              # y ~ sqrt(x), f32-accurate
    # y' = y + r/2 * (x - y^2): the residual is computed in df64 (the
    # cancellation x - y^2 is the information), the correction factor in
    # f32 (it scales a ~2^-24-small quantity).
    d = sub(x, sqr(y))
    return add(y, ((0.5 * r) * d[0], (0.5 * r) * d[1]))


def sqrt0(x):
    """`sqrt` with the gradient-norm guard the kernels need: returns 0
    where x <= 0 (matching jnp.sqrt(0) on the f32 path) instead of the
    NaN the rsqrt seed would produce."""
    safe = x[0] > 0
    r = jnp.where(safe, 1.0 / jnp.sqrt(jnp.where(safe, x[0], 1.0)), 0.0)
    y = mul_f32(x, r)
    d = sub(x, sqr(y))
    return add(y, ((0.5 * r) * d[0], (0.5 * r) * d[1]))


def cadd(x, c: float):
    """df64 + python-float constant (exact split of c)."""
    hi, lo = const(c)
    if lo == 0.0:
        return add_f32(x, jnp.float32(hi))
    return add(x, (jnp.float32(hi), jnp.float32(lo)))


def to_f32(x):
    return x[0]


# --- host/XLA-side conversions (not for use inside Mosaic kernels) ---

def from_f64(a):
    """f64 array -> (hi, lo) f32 pair (XLA graph or host; exact)."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(x):
    """(hi, lo) -> f64 array (XLA graph or host)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)

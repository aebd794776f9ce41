"""df64 (double-f32) arithmetic vs numpy float64 ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest

from bachelors_tpu.ops import df64

RNG = np.random.default_rng(42)


def dd_of(a64):
    return df64.from_f64(jnp.asarray(a64, jnp.float64))


def back(x):
    return np.asarray(df64.to_f64(x))


def rand(n=4096, scale=1.0, offset=0.0):
    return (RNG.standard_normal(n) * scale + offset).astype(np.float64)


class TestRepresentation:
    def test_split_roundtrip(self):
        # a pair holds ~49 of f64's 53 mantissa bits: roundtrip is exact
        # to the pair's own precision, and lo is normalized
        a = rand(scale=1e6)
        hi, lo = dd_of(a)
        assert np.abs(back((hi, lo)) - a).max() <= 2.0 ** -48 * np.abs(a).max()
        assert np.all(np.abs(np.asarray(lo)) <= np.spacing(np.abs(np.asarray(hi))) / 2 + 1e-300)

    def test_const(self):
        for v in (0.1, 1 / 3, 5e-6 / 6, 3.141592653589793):
            hi, lo = df64.const(v)
            assert abs((hi + lo) - v) <= 2.0 ** -48 * abs(v)
            assert float(np.float32(hi)) == hi and float(np.float32(lo)) == lo

    def test_two_sum_error_free(self):
        a = np.float32(RNG.standard_normal(1000))
        b = np.float32(RNG.standard_normal(1000) * 1e-4)
        s, e = df64.two_sum(jnp.asarray(a), jnp.asarray(b))
        exact = a.astype(np.float64) + b.astype(np.float64)
        assert np.array_equal(np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)

    def test_two_prod_error_free(self):
        a = np.float32(RNG.standard_normal(1000))
        b = np.float32(RNG.standard_normal(1000))
        p, e = df64.two_prod(jnp.asarray(a), jnp.asarray(b))
        exact = a.astype(np.float64) * b.astype(np.float64)
        assert np.array_equal(np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


REL = 2.0 ** -44  # comfortably inside the ~2^-47 design precision


class TestArithmetic:
    def test_add(self):
        a, b = rand(scale=3.0), rand(scale=2.0)
        got = back(df64.add(dd_of(a), dd_of(b)))
        np.testing.assert_allclose(got, a + b, rtol=0, atol=REL * np.abs(a + b).max())

    def test_add_cancellation_absolute(self):
        # adjacent-cell style cancellation: absolute error stays 2^-48-scale
        a = rand(scale=1e6, offset=3e6)
        b = -(a + RNG.standard_normal(a.size) * 1e-3)
        got = back(df64.add(dd_of(a), dd_of(b)))
        assert np.abs(got - (a + b)).max() <= 2.0 ** -46 * np.abs(a).max()

    def test_add_acc_relative_through_cancellation(self):
        # exactly-representable pairs whose hi parts cancel completely:
        # the result is carried entirely by the lo parts.  add_acc keeps
        # it to full pair precision; the sloppy add rounds it to one f32.
        h = np.float32(rand(scale=1e5))
        l1 = np.float32(rand(scale=1e-3))
        l2 = np.float32(rand(scale=1e-3))
        x = (jnp.asarray(h), jnp.asarray(l1))
        y = (jnp.asarray(-h), jnp.asarray(l2))
        want = l1.astype(np.float64) + l2.astype(np.float64)
        got = back(df64.add_acc(x, y))
        np.testing.assert_allclose(got, want, rtol=2 ** -44)

    def test_mul(self):
        a, b = rand(scale=7.0), rand(scale=0.3)
        got = back(df64.mul(dd_of(a), dd_of(b)))
        np.testing.assert_allclose(got, a * b, rtol=0, atol=REL * np.abs(a * b).max())

    def test_sqr(self):
        a = rand(scale=5.0)
        got = back(df64.sqr(dd_of(a)))
        np.testing.assert_allclose(got, a * a, rtol=0, atol=REL * (a * a).max())

    def test_mul_f32_and_pow2(self):
        a = rand(scale=2.0)
        # pow2 scaling is exact on the pair itself
        got = back(df64.mul_pow2(dd_of(a), 16384.0))
        assert np.array_equal(got, back(dd_of(a)) * 16384.0)
        got = back(df64.mul_f32(dd_of(a), jnp.float32(3.0)))
        np.testing.assert_allclose(got, a * 3.0, rtol=0, atol=REL * np.abs(a).max() * 3)

    def test_mul_const_inexact(self):
        a = rand(scale=2.0)
        for c in (0.1, 1 / 3, 1.0 / 6.0):
            got = back(df64.mul_const(dd_of(a), c))
            np.testing.assert_allclose(got, a * c, rtol=2 ** -44)

    def test_sqrt(self):
        a = np.abs(rand(scale=4.0)) + 1e-8
        got = back(df64.sqrt(dd_of(a)))
        np.testing.assert_allclose(got, np.sqrt(a), rtol=2 ** -44)

    def test_chained_laplacian_style(self):
        # (W - 2C + E) * inv_dx2 against f64: the PDE hot pattern
        f = rand(n=4098, scale=1.0, offset=0.5)
        C, W, E = f[1:-1], f[:-2], f[2:]
        dd = df64.mul_pow2(
            df64.add(df64.add(dd_of(W), df64.mul_pow2(dd_of(C), -2.0)),
                     dd_of(E)), 16384.0)
        want = (W - 2 * C + E) * 16384.0
        assert np.abs(back(dd) - want).max() <= 2 ** -45 * np.abs(f).max() * 16384.0


class TestVsFloat64Emulation:
    def test_euler_style_update_precision(self):
        """x + dt*rhs accumulated 100 times tracks f64 to ~2^-45."""
        x64 = rand(n=512, scale=0.5, offset=0.3)
        x = dd_of(x64)
        dt = df64.const(5e-6)
        dtdd = (jnp.float32(dt[0]), jnp.float32(dt[1]))
        for _ in range(100):
            r64 = x64 * (1 - x64) * (x64 - 0.5)
            r = df64.mul(df64.mul(x, df64.add_f32(df64.neg(x), 1.0)),
                         df64.add_f32(x, -0.5))
            x64 = x64 + 5e-6 * r64
            x = df64.add(x, df64.mul(r, dtdd))
        np.testing.assert_allclose(back(x), x64, rtol=0, atol=2 ** -40)


class TestCompiledEFTIntegrity:
    """Regression for the XLA:CPU FMA-contraction hazard (round 3).

    LLVM contracts `multiply` feeding `add`/`subtract` into fmuladd
    inside compiled fusions (fp-contract on by default, unaffected by
    every XLA numeric flag we probed -- fast_math, algsimp,
    excess_precision, optimization_barrier).  That voids TwoSum whenever
    an EFT add consumes a raw product, which collapsed fused df64
    kernels to plain-f32 accuracy while eager runs were exact.  With
    `eft_guards` on, jitted df64 chains must match the f64 ground truth
    at pair precision.
    """

    def test_jitted_mul_chain_exact(self):
        import jax

        a64 = rand(n=2048, scale=3.0, offset=0.2)
        b64 = rand(n=2048, scale=0.7, offset=1.1)

        def chain(ah, al, bh, bl):
            x, y = (ah, al), (bh, bl)
            z = df64.mul(x, y)                     # raw products -> EFT adds
            z = df64.add(z, df64.sqr(x))
            z = df64.mul_const(z, 1.0 / 3.0)
            z = df64.sub(z, df64.mul_f32(y, jnp.float32(0.125)))
            return z

        x, y = dd_of(a64), dd_of(b64)
        with df64.eft_guards(True):
            jitted = jax.jit(chain).lower(x[0], x[1], y[0], y[1]).compile()
        got = back(jitted(x[0], x[1], y[0], y[1]))
        want = (a64 * b64 + a64 * a64) / 3.0 - b64 * 0.125
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 2 ** -44 * scale

    def test_unguarded_jit_would_collapse(self):
        """Documents the hazard: without guards, the same jitted chain
        degrades by orders of magnitude (if this starts PASSING at pair
        precision, the toolchain stopped contracting and the guards can
        be retired)."""
        import jax

        a64 = rand(n=2048, scale=3.0, offset=0.2)

        def chain(ah, al):
            x = (ah, al)
            z = df64.sqr(x)
            z = df64.add(z, df64.mul_const(x, 1.0 / 3.0))
            return z

        x = dd_of(a64)
        got = back(jax.jit(chain)(x[0], x[1]))
        want = a64 * a64 + a64 / 3.0
        err = np.abs(got - want).max() / np.abs(want).max()
        eager = back(chain(x[0], x[1]))
        eager_err = np.abs(eager - want).max() / np.abs(want).max()
        assert eager_err <= 2 ** -44  # eager is always exact
        # the unguarded jit is known-collapsed on current XLA:CPU; accept
        # either outcome but fail if it lands in-between (silent drift)
        assert err <= 2 ** -44 or err > 2 ** -30


class TestDivision:
    def test_div_accuracy(self):
        a = rand(n=4096, scale=5.0, offset=0.1)
        b = rand(n=4096, scale=2.0, offset=3.5)  # bounded away from 0
        got = back(df64.div(dd_of(a), dd_of(b)))
        np.testing.assert_allclose(got, a / b, rtol=2 ** -44)

    def test_div_jitted_with_guards(self):
        import jax

        a = rand(n=2048, scale=5.0, offset=0.1)
        b = rand(n=2048, scale=2.0, offset=3.5)
        x, y = dd_of(a), dd_of(b)
        with df64.eft_guards(True):
            f = jax.jit(lambda xh, xl, yh, yl: df64.div((xh, xl), (yh, yl)))
            got = back(f(x[0], x[1], y[0], y[1]))
        np.testing.assert_allclose(got, a / b, rtol=2 ** -44)

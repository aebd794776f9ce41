"""df64 fused integrator kernels vs the true-f64 XLA oracle.

The oracle is the staged `ops.rhs.eval_rhs` path in float64 (XLA's
software f64 -- also what `[tpu] backend = xla` runs in production).
The df64 pair representation carries ~2^-48 relative precision, so
agreement bounds are set at ~1e-12 of the field scale -- eight orders
below the f32 path's tolerances and far below the reference's 5e-9
controller tolerances (the claim under test).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bachelors_tpu as bt
from bachelors_tpu.core.params import BoundaryType
from bachelors_tpu.ops import pallas_dd
from bachelors_tpu.ops.pallas_dd import (euler_steps_dd, rk4_full_dd,
                                         rkm_attempt_dd, supports_dd)
from bachelors_tpu.ops.rhs import eval_rhs
from bachelors_tpu.parallel.topology import Topology

TOPO = Topology()


@pytest.fixture(autouse=True)
def small_tiles():
    # force 2 grid programs on tiny arrays so halo seams are exercised
    pallas_dd.TILE_OVERRIDE = 32
    yield
    pallas_dd.TILE_OVERRIDE = None


def make_p(**kw):
    kw.setdefault("nx", 128)
    kw.setdefault("ny", 64)
    kw.setdefault("dt", 5e-6)
    kw.setdefault("S", 0.0)
    kw.setdefault("dtype", "float64")
    kw.setdefault("backend", "xla")  # oracle side; dd calls are explicit
    # full-precision sqrt on BOTH sides for the strict 1e-12 agreements;
    # the reference's f32-transcendental semantics get their own test
    kw.setdefault("f32_transcendentals", False)
    return bt.SimParams(**kw)


def fields(p, seed=3):
    rng = np.random.default_rng(seed)
    F = jnp.asarray(0.5 + 0.4 * np.sin(rng.normal(size=(p.ny, p.nx))),
                    jnp.float64)
    U = jnp.asarray(0.1 * rng.normal(size=(p.ny, p.nx)), jnp.float64)
    return F, U


def relerr(got, want):
    scale = float(jnp.max(jnp.abs(want))) or 1.0
    return float(jnp.max(jnp.abs(got - want))) / scale


BCS = [BoundaryType.NEUMANN, BoundaryType.PERIODIC, BoundaryType.DIRICHLET]


class TestEulerDD:
    @pytest.mark.parametrize("bc", BCS)
    def test_one_step_matches_f64_oracle(self, bc):
        p = make_p(Phi_boundary=bc, T_boundary=bc)
        F, U = fields(p)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < 1e-12
        assert relerr(nU, U + p.dt * dU) < 1e-12

    @pytest.mark.dd_compile_heavy  # T=4 interpret graph: ~20 min compile
    def test_four_fused_steps_match_four_single(self):
        p = make_p()
        F, U = fields(p, seed=7)
        nF4, nU4 = euler_steps_dd(F, U, p, T=4, interpret=True)
        wF, wU = F, U
        for _ in range(4):
            dF, dU = eval_rhs([(wF, wU)], [1.0], p, TOPO)
            wF, wU = wF + p.dt * dF, wU + p.dt * dU
        assert relerr(nF4, wF) < 1e-12
        assert relerr(nU4, wU) < 1e-12

    def test_vmapped_pair_kernel_matches_oracle_per_member(self):
        """Ensembles ([tpu] ensemble = N) vmap the stepper
        (`parallel/sharded.make_ensemble_stepper`), which vmaps the pair
        kernels -- pallas_call lifts the batch axis into a leading grid
        dim.  Each member must integrate independently at pair precision."""
        p = make_p()
        rng = np.random.default_rng(3)
        F = jnp.asarray(0.5 + 0.4 * np.sin(rng.normal(size=(2, p.ny, p.nx))),
                        jnp.float64)
        U = jnp.asarray(0.1 * rng.normal(size=(2, p.ny, p.nx)), jnp.float64)

        def one(F, U):
            pair = pallas_dd.state_to_pair(F, U)
            out = pallas_dd.euler_steps_dd_pair(pair, p, T=1, interpret=True)
            return pallas_dd.pair_to_state(out)

        nF, nU = jax.vmap(one)(F, U)
        for b in range(2):
            dF, dU = eval_rhs([(F[b], U[b])], [1.0], p, TOPO)
            assert relerr(nF[b], F[b] + p.dt * dF) < 1e-12
            assert relerr(nU[b], U[b] + p.dt * dU) < 1e-12

    def test_f32_transcendentals_semantics(self):
        """With the reference's sqrtf-in-f64 semantics (the default), the
        dd kernel and the f64 oracle both round |grad| to f32 and agree
        to f32-transcendental level.  They round r2 at DIFFERENT points
        (kernel: hi-plane products summed in f32; oracle: f64 sum cast
        once), so agreement is ~ulp_f32 of the k2 term's contribution --
        orders above the 1e-12 full-precision bounds but exactly the
        precision the reference's own f64 solver carries here."""
        p = make_p(f32_transcendentals=True)
        F, U = fields(p, seed=23)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < 1e-7
        assert relerr(nU, U + p.dt * dU) < 1e-7

    def test_anisotropic_matches_f64_oracle(self):
        """S != 0: the dd kernel evaluates g(theta) in f32 via the
        Chebyshev recurrence (the reference's own f64 build uses
        cosf/sqrtf, so f32 here IS reference precision); agreement with
        the f64-oracle-with-f32-transcendentals is at that level."""
        p = make_p(S=0.25, m0=6.0, f32_transcendentals=True)
        assert supports_dd(p)
        F, U = fields(p, seed=41)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < 2e-7
        assert relerr(nU, U + p.dt * dU) < 2e-7

    def test_anisotropic_strict_sqrt_pair_precision(self):
        """Strict transcendentals + S != 0: _g_theta_dd runs the
        angle-addition recurrence in pair arithmetic; oracle agreement
        at near-pair precision (the oracle computes atan2+cos in f64, a
        different but mathematically identical formulation)."""
        p = make_p(S=0.25, m0=6.0)
        assert supports_dd(p)
        F, U = fields(p, seed=53)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < 1e-11
        assert relerr(nU, U + p.dt * dU) < 1e-11

    def test_corrector_guess_matches_f64_oracle(self):
        """do_corrector_guess: the implicit-in-U guess divides by
        corr = 1 + k2*dt*L; df64 division (Karp-Markstein) keeps the
        oracle agreement at the f32-transcendental level the |grad|
        rounding already imposes."""
        p = make_p(do_corrector_guess=True, f32_transcendentals=True)
        assert supports_dd(p)
        F, U = fields(p, seed=43)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < 2e-7
        assert relerr(nU, U + p.dt * dU) < 2e-7

    def test_corrector_guess_strict_sqrt(self):
        """With full-precision transcendentals the guess path holds pair
        precision end-to-end (div included)."""
        p = make_p(do_corrector_guess=True)
        F, U = fields(p, seed=47)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < 1e-12
        assert relerr(nU, U + p.dt * dU) < 1e-12

    @pytest.mark.parametrize("S,f32t,bound", [
        (0.0, False, 1e-12),    # folded lap + k2 constants, pair sqrt
        (0.25, False, 1e-11),   # raw-ratio _g_theta_dd (scale-invariant)
        (0.25, True, 2e-7),     # raw-ratio _g_theta_vpu + folded k2_32
    ])
    def test_square_cells_fold(self, S, f32t, bound):
        """dx == dy engages the folded stencil + gradient constants in
        `_make_physics_dd` (the production branch -- every shipped config
        is square; the default test geometry here is non-square)."""
        p = make_p(ny=128, S=S, m0=6.0 if S else 4.0,
                   f32_transcendentals=f32t)
        assert p.dx == p.dy and supports_dd(p)
        F, U = fields(p, seed=71)
        nF, nU = euler_steps_dd(F, U, p, T=1, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO)
        assert relerr(nF, F + p.dt * dF) < bound
        assert relerr(nU, U + p.dt * dU) < bound

    def test_forcing_term(self):
        p = make_p()
        F, U = fields(p, seed=11)
        fu = 0.037
        nF, nU = euler_steps_dd(F, U, p, T=1, fu=fu, interpret=True)
        dF, dU = eval_rhs([(F, U)], [1.0], p, TOPO, fu)
        assert relerr(nU, U + p.dt * dU) < 1e-12
        assert relerr(nF, F + p.dt * dF) < 1e-12

    def test_corrector_rebase_matches_f64_oracle(self):
        """The corrector re-step (same_base=False: RHS at (F, U), U
        integrated from the frozen U_base, `simulation.cu:928-1008`) rides
        the dd kernel via the exact pair rebase
        next_U = U_base + (out_U - U)."""
        from bachelors_tpu.solvers.explicit import euler_step_based

        p_dd = make_p(backend="pallas")
        F, U = fields(p_dd, seed=61)
        rng = np.random.default_rng(67)
        U_base = U + jnp.asarray(1e-4 * rng.normal(size=U.shape), jnp.float64)
        pallas_dd.FORCE_INTERPRET = True
        try:
            nF, nU = euler_step_based(F, U, U_base, p_dd, TOPO,
                                      same_base=False)
        finally:
            pallas_dd.FORCE_INTERPRET = False
        dF, dU = eval_rhs([(F, U)], [1.0], p_dd.replace(backend="xla"), TOPO)
        assert relerr(nF, F + p_dd.dt * dF) < 1e-12
        assert relerr(nU, U_base + p_dd.dt * dU) < 1e-12


@pytest.mark.dd_compile_heavy  # 4-stage interpret graph: ~20+ min compile
class TestRK4DD:
    # one BC: the BC/seam machinery is the same code across schemes and
    # gets its 3-BC coverage from the cheap Euler T=1 graphs + RKM
    @pytest.mark.parametrize("bc", [BoundaryType.NEUMANN])
    def test_whole_step_matches_staged_f64(self, bc):
        p = make_p(Phi_boundary=bc, T_boundary=bc)
        F, U = fields(p, seed=5)
        nF, nU = rk4_full_dd(F, U, p, interpret=True)
        dt, one = p.dt, 1.0
        k1 = eval_rhs([(F, U)], [one], p, TOPO)
        k2 = eval_rhs([(F, U), k1], [one, dt / 2], p, TOPO)
        k3 = eval_rhs([(F, U), k2], [one, dt / 2], p, TOPO)
        k4 = eval_rhs([(F, U), k3], [one, dt], p, TOPO)
        wF = F + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        wU = U + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        assert relerr(nF, wF) < 1e-12
        assert relerr(nU, wU) < 1e-12


def staged_rkm_oracle(F, U, tau, p, fu=0.0):
    one = 1.0
    k1 = eval_rhs([(F, U)], [one], p, TOPO, fu)
    k2 = eval_rhs([(F, U), k1], [one, tau / 3], p, TOPO, fu)
    k3 = eval_rhs([(F, U), k1, k2], [one, tau / 6, tau / 6], p, TOPO, fu)
    k4 = eval_rhs([(F, U), k1, k3], [one, tau / 8, 3 * tau / 8], p, TOPO, fu)
    k5 = eval_rhs([(F, U), k1, k3, k4],
                  [one, tau / 2, -3 * tau / 2, 2 * tau], p, TOPO, fu)
    wF = F + tau / 6 * (k1[0] + 4 * k4[0] + k5[0])
    wU = U + tau / 6 * (k1[1] + 4 * k4[1] + k5[1])
    eF = jnp.max(jnp.abs(0.2 * k1[0] - 0.9 * k3[0] + 0.8 * k4[0] - 0.1 * k5[0]))
    eU = jnp.max(jnp.abs(0.2 * k1[1] - 0.9 * k3[1] + 0.8 * k4[1] - 0.1 * k5[1]))
    return wF, wU, float(eF), float(eU), float(jnp.max(jnp.abs(k1[0])))


@pytest.mark.dd_compile_heavy  # 5-stage interpret graph: the heaviest compile
class TestRKMDD:
    # one BC: BC/seam machinery gets 3-BC coverage from the Euler graphs;
    # the anisotropy/BC matrix is also exercised on real hardware (the f64
    # ladder's 9539-step controller parity is the end-to-end evidence)
    @pytest.mark.parametrize("bc", [BoundaryType.NEUMANN])
    def test_attempt_matches_staged_f64(self, bc):
        p = make_p(Phi_boundary=bc, T_boundary=bc)
        F, U = fields(p, seed=9)
        tau = 3.7e-6
        nF, nU, eF, eU = rkm_attempt_dd(F, U, jnp.float64(tau), p,
                                        interpret=True)
        wF, wU, weF, weU, maxk = staged_rkm_oracle(F, U, tau, p)
        assert relerr(nF, wF) < 1e-12
        assert relerr(nU, wU) < 1e-12
        # THE df64 claim: the catastrophically-cancelling Merson error
        # combination agrees with true f64 far below the f32 noise floor
        # (~6e-8 * max|k|, RESULTS.md).  The kernel REPORTS the maxima as
        # f32 scalars (the controller compares them against tolerances
        # orders above ulp), so the bound is the f32 REPRESENTATION of
        # the f64 value (ulp(want)/2) plus the ~2^-45 * max|k| evaluation
        # term -- measured: got == float32(want) bit-exactly.
        for got, want in ((float(eF), weF), (float(eU), weU)):
            assert abs(got - want) <= 6e-8 * want + 3e-13 * maxk


class TestSolverPlumbingDD:
    """Solver-level dd integration with the KERNELS mocked by pair-level
    oracles: checks gating, pair carry, while_loop pytrees and tau logic
    without the multi-minute XLA:CPU interpret compiles.  The real
    kernels are covered by the (slow) kernel tests and by the on-device
    f64 ladder (controller step counts match the reference's)."""

    def test_solver_level_dd_path(self):
        """rkm_adaptive_step engages the df64 path (backend='pallas' +
        FORCE_INTERPRET on CPU) and matches the f64 XLA solver's step.

        The dd ATTEMPT itself is mocked with a pair-level oracle (the
        real kernel is covered by test_attempt_matches_staged_f64 and
        validated on hardware); this test checks the solver plumbing --
        gating, the one-split-per-step pair carry, the while_loop
        candidate pytree, tau decisions -- without paying another
        multi-minute XLA:CPU interpret compile."""
        from bachelors_tpu.ops import pallas_dd as pd
        from bachelors_tpu.solvers.explicit import rkm_adaptive_step

        p_dd = make_p(backend="pallas",
                      solver=bt.SolverType.EXPLICIT_RK4_ADAPTIVE)
        p_or = p_dd.replace(backend="xla")
        F, U = fields(p_or, seed=13)
        tau0 = jnp.float64(2e-6)

        def fake_attempt(pair, tau, p, fu=0.0, dirichlet_value=0.0,
                         interpret=False):
            F64, U64 = pd.pair_to_state(pair)
            one = 1.0
            k1 = eval_rhs([(F64, U64)], [one], p_or, TOPO)
            k2 = eval_rhs([(F64, U64), k1], [one, tau / 3], p_or, TOPO)
            k3 = eval_rhs([(F64, U64), k1, k2], [one, tau / 6, tau / 6],
                          p_or, TOPO)
            k4 = eval_rhs([(F64, U64), k1, k3], [one, tau / 8, 3 * tau / 8],
                          p_or, TOPO)
            k5 = eval_rhs([(F64, U64), k1, k3, k4],
                          [one, tau / 2, -3 * tau / 2, 2 * tau], p_or, TOPO)
            nF = F64 + tau / 6 * (k1[0] + 4 * k4[0] + k5[0])
            nU = U64 + tau / 6 * (k1[1] + 4 * k4[1] + k5[1])
            eF = jnp.max(jnp.abs(0.2 * k1[0] - 0.9 * k3[0] + 0.8 * k4[0]
                                 - 0.1 * k5[0])).astype(jnp.float32)
            eU = jnp.max(jnp.abs(0.2 * k1[1] - 0.9 * k3[1] + 0.8 * k4[1]
                                 - 0.1 * k5[1])).astype(jnp.float32)
            return pd.state_to_pair(nF, nU), eF, eU

        orig = pd.rkm_attempt_dd_pair
        pd.rkm_attempt_dd_pair = fake_attempt
        pallas_dd.FORCE_INTERPRET = True
        try:
            assert supports_dd(p_dd)
            got = rkm_adaptive_step(F, U, tau0, p_dd, TOPO)
        finally:
            pd.rkm_attempt_dd_pair = orig
            pallas_dd.FORCE_INTERPRET = False
        want = rkm_adaptive_step(F, U, tau0, p_or, TOPO)
        # pair split/join quantizes the state at ~2^-49; through the k
        # values' 1e5 dynamic range that reaches a few e-11
        assert relerr(got[0], want[0]) < 1e-9
        assert relerr(got[1], want[1]) < 1e-9
        # same tau decision (to the f32 rounding of the error maxima the
        # kernel reports) and same iteration count
        np.testing.assert_allclose(float(got[3]), float(want[3]), rtol=1e-6)
        assert int(got[4]) == int(want[4])
        assert bool(got[5]) == bool(want[5])

    def test_euler_pair_stepper_dd(self):
        """make_euler_pair_stepper returns the df64 4-step advancer for
        f64 configs and it matches 4 oracle steps (kernel mocked)."""
        from bachelors_tpu.ops import pallas_dd as pd
        from bachelors_tpu.solvers.explicit import make_euler_pair_stepper

        p_dd = make_p(backend="pallas", solver=bt.SolverType.EXPLICIT_EULER)
        p_or = p_dd.replace(backend="xla")
        F, U = fields(p_dd, seed=17)
        state = bt.make_state(F, U, p_dd)

        def fake_euler(F64, U64, p, T=4, fu=0.0, dirichlet_value=0.0,
                       interpret=False):
            for _ in range(T):
                dF, dU = eval_rhs([(F64, U64)], [1.0], p_or, TOPO, fu)
                F64, U64 = F64 + p.dt * dF, U64 + p.dt * dU
            return F64, U64

        orig = pd.euler_steps_dd
        import bachelors_tpu.solvers.explicit as ex
        pd.euler_steps_dd = fake_euler
        pallas_dd.FORCE_INTERPRET = True
        try:
            pair = make_euler_pair_stepper(p_dd, TOPO)
            assert pair is not None and pair.block_steps == 4
            out = pair(state)
        finally:
            pd.euler_steps_dd = orig
            pallas_dd.FORCE_INTERPRET = False
        wF, wU = F, U
        for _ in range(4):
            dF, dU = eval_rhs([(wF, wU)], [1.0], p_or, TOPO)
            wF, wU = wF + p_or.dt * dF, wU + p_or.dt * dU
        assert relerr(out.F, wF) < 1e-12
        assert relerr(out.U, wU) < 1e-12
        assert int(out.iter) == 4


class TestGating:
    def test_supports_dd(self):
        assert supports_dd(make_p())
        assert not supports_dd(make_p(dtype="float32"))
        assert supports_dd(make_p(S=0.25, m0=6.0))  # strict: _g_theta_dd
        assert supports_dd(make_p(S=0.25, m0=6.0, f32_transcendentals=True))
        assert not supports_dd(make_p(S=0.25, m0=5.5, f32_transcendentals=True))
        assert not supports_dd(make_p(nx=100))
        assert supports_dd(make_p(do_corrector_guess=True))

    def test_wants_dd_respects_xla_optout(self):
        from bachelors_tpu.ops.pallas_dd import wants_dd

        assert not wants_dd(make_p(backend="xla"), TOPO)
        assert wants_dd(make_p(backend="pallas"), TOPO)

    def test_euler_dd_block_steps_policy(self):
        """Depth 8 in the HBM regime, 4 cache-resident (hardware-measured
        crossover between 512^2 and 1024^2, ops/pallas_dd.py)."""
        from bachelors_tpu.ops.pallas_dd import euler_dd_block_steps
        from bachelors_tpu.solvers.explicit import make_euler_pair_stepper

        assert euler_dd_block_steps(512 * 512) == 4
        assert euler_dd_block_steps(1024 * 1024) == 8
        # the stepper's loop math sees the policy depth (closure only;
        # the kernel is not built until the first call)
        p_big = make_p(backend="pallas", nx=2048, ny=2048,
                       solver=bt.SolverType.EXPLICIT_EULER)
        pair = make_euler_pair_stepper(p_big, TOPO)
        assert pair is not None and pair.block_steps == 8
        p_small = make_p(backend="pallas", nx=256, ny=256,
                         solver=bt.SolverType.EXPLICIT_EULER)
        pair = make_euler_pair_stepper(p_small, TOPO)
        assert pair is not None and pair.block_steps == 4


class TestSemiImplicitDD:
    def make_si_p(self, **kw):
        kw.setdefault("solver", bt.SolverType.SEMI_IMPLICIT)
        kw.setdefault("Phi_tolerance", 5e-9)
        kw.setdefault("T_tolerance", 5e-9)
        kw.setdefault("Phi_max_iters", 20)
        kw.setdefault("T_max_iters", 20)
        return make_p(**kw)

    def test_prepare_matches_f64(self):
        """dd si-prepare == the f64 XLA prepare, to f32 rounding of the
        O(dt)-scale residuals."""
        from bachelors_tpu.models.allen_cahn import semi_implicit_prepare
        from bachelors_tpu.ops.pallas_dd import si_prepare_dd_pair, state_to_pair
        from bachelors_tpu.solvers.semi_implicit import _lap_from_padded

        p = self.make_si_p()
        F, U = fields(p, seed=31)
        r0_pair, ut_pair = si_prepare_dd_pair(state_to_pair(F, U), p,
                                              interpret=True)
        Fp = TOPO.pad(F, p.Phi_boundary)
        Up = TOPO.pad(U, p.T_boundary)
        w_r0, _s = semi_implicit_prepare(Fp, Up, p)
        w_ut = p.dt * _lap_from_padded(Up, p)
        sc_r = float(jnp.max(jnp.abs(w_r0)))
        sc_u = float(jnp.max(jnp.abs(w_ut)))
        r0 = r0_pair[0].astype(jnp.float64) + r0_pair[1].astype(jnp.float64)
        ut = ut_pair[0].astype(jnp.float64) + ut_pair[1].astype(jnp.float64)
        # the PAIR residuals agree at pair precision (the refinement
        # depends on this; the hi planes alone only reach f32 rounding)
        assert float(jnp.max(jnp.abs(r0 - w_r0))) < 1e-11 * sc_r
        assert float(jnp.max(jnp.abs(ut - w_ut))) < 1e-11 * sc_u

    def test_step_matches_f64_solver(self):
        """The full dd S-I step (prepare + f32 delta CG + pair add-back)
        tracks the f64 XLA S-I step to delta-f32 accuracy -- far below
        the 5e-9 residual tolerance both converge to."""
        from bachelors_tpu.solvers.semi_implicit import semi_implicit_step_based
        from bachelors_tpu.ops.pallas_dd import wants_dd_si

        p_dd = self.make_si_p(backend="pallas")
        p_or = p_dd.replace(backend="xla")
        F, U = fields(p_or, seed=37)
        pallas_dd.FORCE_INTERPRET = True
        try:
            assert wants_dd_si(p_dd, TOPO)
            nF, nU, rF, rU = semi_implicit_step_based(F, U, U, p_dd, TOPO)
        finally:
            pallas_dd.FORCE_INTERPRET = False
        wF, wU, wrF, wrU = semi_implicit_step_based(F, U, U, p_or, TOPO)
        # states agree to a few ulp_f32 of the per-step DELTA (the rough
        # random ICs make the delta O(0.04) here; physical fields sit far
        # lower) -- the loose sanity bound
        dF_scale = float(jnp.max(jnp.abs(wF - F)))
        dU_scale = float(jnp.max(jnp.abs(wU - U)))
        assert float(jnp.max(jnp.abs(nF - wF))) < 1e-6 * dF_scale + 1e-12
        assert float(jnp.max(jnp.abs(nU - wU))) < 1e-6 * dU_scale + 1e-12
        # THE equal-precision contract: the dd solution's TRUE residual
        # (back-substituted in f64) meets the same RMS <= tolerance bound
        # the reference's f64 CG stops at (`simulation.cu:608`)
        from bachelors_tpu.solvers.semi_implicit import back_substitution_error

        eF64, eU64 = back_substitution_error(nF, nU, F, U, U, p_or, TOPO)
        # with one round of pair-precision iterative refinement the f32
        # rounding floor of r0/e is corrected away; small multiple covers
        # the Lmax-vs-RMS gap of the stopping criterion
        assert float(eF64) < 5 * p_or.Phi_tolerance
        assert float(eU64) < 5 * p_or.T_tolerance
        # converged on both paths
        assert bool(rF.converged) and bool(rU.converged)
        assert bool(wrF.converged) and bool(wrU.converged)

    def test_gating(self):
        from bachelors_tpu.ops.pallas_dd import wants_dd_si

        # corrector loop and gamma != 1 are COVERED by the dd path since
        # round 4 (extra heat-rhs pair); only the differentiable path and
        # the explicit xla opt-out fall back to XLA f64
        assert wants_dd_si(self.make_si_p(backend="pallas",
                                          do_corrector_loop=True,
                                          corrector_max_iters=2), TOPO)
        assert wants_dd_si(self.make_si_p(backend="pallas", gamma=0.9), TOPO)
        assert not wants_dd_si(self.make_si_p(backend="pallas",
                                              differentiable=True), TOPO)
        assert not wants_dd_si(self.make_si_p(backend="xla"), TOPO)

        # sharded meshes ride the ghost-slab prepare + ghost-row/column
        # residuals: y-only (round 4) and x/2D (round 5) alike
        class _Topo:
            is_sharded = True
            axis_y = "y"
            axis_x = None

        p_sh = self.make_si_p(backend="pallas")
        assert wants_dd_si(p_sh, _Topo(), 64, 128)
        assert not wants_dd_si(p_sh, _Topo())  # no local shape supplied
        _Topo.axis_x = "x"
        assert wants_dd_si(p_sh, _Topo(), 64, 128)

    def test_step_gamma_blend(self):
        """gamma != 1 (`simulation.cu:798-871,893-899`): gamma scales the
        phase operator s AND adds the dt*(1-gamma)*U_base heat-rhs term;
        the dd step must track the f64 XLA step."""
        from bachelors_tpu.solvers.semi_implicit import semi_implicit_step_based
        from bachelors_tpu.ops.pallas_dd import wants_dd_si

        p_dd = self.make_si_p(backend="pallas", gamma=0.7)
        p_or = p_dd.replace(backend="xla")
        F, U = fields(p_or, seed=71)
        pallas_dd.FORCE_INTERPRET = True
        try:
            assert wants_dd_si(p_dd, TOPO)
            nF, nU, rF, rU = semi_implicit_step_based(F, U, U, p_dd, TOPO)
        finally:
            pallas_dd.FORCE_INTERPRET = False
        wF, wU, wrF, wrU = semi_implicit_step_based(F, U, U, p_or, TOPO)
        dF_scale = float(jnp.max(jnp.abs(wF - F))) + 1e-30
        dU_scale = float(jnp.max(jnp.abs(wU - U))) + 1e-30
        assert float(jnp.max(jnp.abs(nF - wF))) < 1e-6 * dF_scale + 1e-12
        assert float(jnp.max(jnp.abs(nU - wU))) < 1e-6 * dU_scale + 1e-12
        assert bool(rF.converged) and bool(rU.converged)

    def test_step_corrector_loop(self):
        """The corrector loop (`simulation.cu:928-1008`) on the dd path:
        the full make_stepper step with do_corrector_loop re-solves with
        the frozen U_base threaded through the extra heat-rhs pair, and
        must track the f64 XLA stepper."""
        from bachelors_tpu.ops.pallas_dd import wants_dd_si
        from bachelors_tpu.solvers.base import make_stepper

        p_dd = self.make_si_p(backend="pallas", do_corrector_loop=True,
                              corrector_max_iters=2)
        p_or = p_dd.replace(backend="xla")
        F, U = fields(p_or, seed=73)
        state = bt.make_state(F, U, p_or)
        pallas_dd.FORCE_INTERPRET = True
        try:
            assert wants_dd_si(p_dd, TOPO)
            got, _stats = make_stepper(p_dd, TOPO)(state)
        finally:
            pallas_dd.FORCE_INTERPRET = False
        want, _wstats = make_stepper(p_or, TOPO)(state)
        dF_scale = float(jnp.max(jnp.abs(want.F - F))) + 1e-30
        dU_scale = float(jnp.max(jnp.abs(want.U - U))) + 1e-30
        assert float(jnp.max(jnp.abs(got.F - want.F))) < 1e-6 * dF_scale + 1e-12
        assert float(jnp.max(jnp.abs(got.U - want.U))) < 1e-6 * dU_scale + 1e-12

    def test_cross_residual_kernel(self):
        """cross_residual_dd == r0 - A e computed in f64, to the f32
        rounding of the (tiny) result."""
        from bachelors_tpu.ops.pallas_dd import cross_residual_dd
        from bachelors_tpu.ops.stencil import CrossMatrix, cross_matvec

        p = self.make_si_p()
        rng = np.random.default_rng(43)
        e = jnp.asarray(rng.normal(size=(p.ny, p.nx)) * 1e-3, jnp.float32)
        r0v = rng.normal(size=(p.ny, p.nx)) * 1e-3
        r0h = jnp.asarray(r0v, jnp.float32)
        r0l = jnp.asarray(r0v - np.asarray(r0h, np.float64), jnp.float32)
        A = CrossMatrix(C=1.02, X=-0.005, Y=-0.005, boundary=p.Phi_boundary)
        got = cross_residual_dd((r0h, r0l), e, A, interpret=True)
        want = (jnp.asarray(r0v)
                - cross_matvec(A, e.astype(jnp.float64), TOPO))
        scale = float(jnp.max(jnp.abs(want)))
        assert float(jnp.max(jnp.abs(got.astype(jnp.float64) - want))) \
            < 1e-7 * scale

    def test_heat_residual_kernel(self):
        from bachelors_tpu.ops.pallas_dd import heat_residual_dd
        from bachelors_tpu.ops.stencil import CrossMatrix, cross_matvec

        p = self.make_si_p()
        rng = np.random.default_rng(47)
        e = jnp.asarray(rng.normal(size=(p.ny, p.nx)) * 1e-3, jnp.float32)
        e1F = jnp.asarray(rng.normal(size=(p.ny, p.nx)) * 1e-3, jnp.float32)
        e2F = jnp.asarray(rng.normal(size=(p.ny, p.nx)) * 1e-10, jnp.float32)
        utv = rng.normal(size=(p.ny, p.nx)) * 1e-4
        uth = jnp.asarray(utv, jnp.float32)
        utl = jnp.asarray(utv - np.asarray(uth, np.float64), jnp.float32)
        A = CrossMatrix.implicit_heat(p)
        got = heat_residual_dd((uth, utl), (e1F, e2F), e, A, p.L,
                               interpret=True)
        eF64 = e1F.astype(jnp.float64) + e2F.astype(jnp.float64)
        want = (p.L * eF64 + jnp.asarray(utv)
                - cross_matvec(A, e.astype(jnp.float64), TOPO))
        scale = float(jnp.max(jnp.abs(want)))
        assert float(jnp.max(jnp.abs(got.astype(jnp.float64) - want))) \
            < 1e-7 * scale

    @pytest.mark.parametrize("kw", [
        dict(S=0.25, m0=6.0, f32_transcendentals=True),   # anisotropic
        dict(do_corrector_guess=True, f32_transcendentals=True),
    ])
    def test_step_variable_s(self, kw):
        """Variable-s families (anisotropy / corrector-guess): the dd
        prepare emits the per-cell s map; CG + refinement use it
        self-consistently and track the f64 XLA step at delta-f32 level."""
        from bachelors_tpu.solvers.semi_implicit import semi_implicit_step_based
        from bachelors_tpu.ops.pallas_dd import wants_dd_si

        p_dd = self.make_si_p(backend="pallas", **kw)
        p_or = p_dd.replace(backend="xla")
        F, U = fields(p_or, seed=59)
        pallas_dd.FORCE_INTERPRET = True
        try:
            assert wants_dd_si(p_dd, TOPO)
            nF, nU, rF, rU = semi_implicit_step_based(F, U, U, p_dd, TOPO)
        finally:
            pallas_dd.FORCE_INTERPRET = False
        wF, wU, wrF, wrU = semi_implicit_step_based(F, U, U, p_or, TOPO)
        dF_scale = float(jnp.max(jnp.abs(wF - F))) + 1e-30
        dU_scale = float(jnp.max(jnp.abs(wU - U))) + 1e-30
        assert float(jnp.max(jnp.abs(nF - wF))) < 1e-6 * dF_scale + 1e-12
        assert float(jnp.max(jnp.abs(nU - wU))) < 1e-6 * dU_scale + 1e-12
        assert bool(rF.converged) and bool(rU.converged)

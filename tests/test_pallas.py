"""Fused Pallas RHS kernel vs the jnp oracle (interpret mode on CPU).

Randomized equivalence in the spirit of the reference's tiled-for tests
(`cuda_for.cuh:440-628`): random fields, every BC, blends of 1-4 states,
euler mode, dirichlet values, forcing.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from bachelors_tpu.core.params import BoundaryType, SimParams
from bachelors_tpu.models.allen_cahn import blend, rhs_padded
from bachelors_tpu.core.boundary import pad2
from bachelors_tpu.ops.pallas_rhs import blend_rhs_pallas, supports

BCS = [BoundaryType.PERIODIC, BoundaryType.NEUMANN, BoundaryType.DIRICHLET]


def params(bc=BoundaryType.NEUMANN, **kw):
    base = dict(nx=128, ny=32, L0=4.0, dt=5e-6, S=0.3, m0=6.0, theta0=0.1,
                T_boundary=bc, Phi_boundary=bc, dtype="float32")
    base.update(kw)
    return SimParams(**base)


def oracle(states, weights, p, fu=0.0, d=0.0, is_euler=False):
    Fb = blend([jnp.asarray(s[0], jnp.float32) for s in states], weights)
    Ub = blend([jnp.asarray(s[1], jnp.float32) for s in states], weights)
    Fp = pad2(Fb, p.Phi_boundary, d)
    Up = pad2(Ub, p.T_boundary, d)
    dF, dU = rhs_padded(Fp, Up, p, fu)
    if is_euler:
        return Fb + p.dt * dF, Ub + p.dt * dU
    return dF, dU


def rand_states(rng, p, n):
    return [(rng.normal(size=(p.ny, p.nx)).astype(np.float32),
             rng.normal(size=(p.ny, p.nx)).astype(np.float32))
            for _ in range(n)]


def assert_match(got, want, atol=2e-5):
    a, b = np.asarray(got), np.asarray(want)
    scale = max(np.abs(b).max(), 1.0)
    np.testing.assert_allclose(a, b, atol=atol * scale, rtol=1e-4)


@pytest.mark.parametrize("bc", BCS)
def test_kernel_single_state(bc, rng):
    p = params(bc)
    assert supports(p)
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, interpret=True)
    want = oracle([(F, U)], [1.0], p)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


@pytest.mark.parametrize("n", [2, 3, 4])
def test_kernel_blends(n, rng):
    p = params(BoundaryType.NEUMANN)
    states = rand_states(rng, p, n)
    weights = [1.0] + [float(rng.normal()) * 1e-2 for _ in range(n - 1)]
    got = blend_rhs_pallas(states, weights, p, interpret=True)
    want = oracle(states, weights, p)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


def test_kernel_euler_mode(rng):
    p = params(BoundaryType.PERIODIC, S=0.0)
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, is_euler=True, interpret=True)
    want = oracle([(F, U)], [1.0], p, is_euler=True)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


def test_kernel_corrector_guess_and_fu(rng):
    p = params(BoundaryType.NEUMANN, do_corrector_guess=True)
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, fu=0.321, interpret=True)
    want = oracle([(F, U)], [1.0], p, fu=0.321)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


def test_kernel_dirichlet_value(rng):
    p = params(BoundaryType.DIRICHLET)
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, dirichlet_value=0.25, interpret=True)
    want = oracle([(F, U)], [1.0], p, d=0.25)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


def test_kernel_multi_tile(rng):
    """ny large enough for several grid programs; seam rows must be exact."""
    p = params(BoundaryType.NEUMANN, ny=256, nx=128, S=0.0)
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, interpret=True)
    want = oracle([(F, U)], [1.0], p)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


@pytest.mark.parametrize("S,guess", [(0.0, False), (0.25, False), (0.0, True)])
def test_kernel_square_cells_fold(S, guess, rng):
    """dx == dy engages the folded stencil/gradient constants in
    `_make_physics` (every shipped/benchmark config is square); the
    default test geometry here is NON-square (nx=128, ny=32, one L0), so
    pin the folded branch against the per-axis XLA oracle explicitly."""
    p = params(BoundaryType.NEUMANN, ny=128, nx=128, S=S,
               do_corrector_guess=guess)
    assert p.dx == p.dy
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, interpret=True)
    want = oracle([(F, U)], [1.0], p)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


def test_supports_gates():
    assert not supports(params(dtype="float64"))
    assert not supports(params(nx=100))
    assert not supports(params(ny=12))
    assert supports(params(nx=2048, ny=2048))


def test_rk4_combine_mode(rng):
    """Fused stage-4 + combination == explicit k4 + combine."""
    import jax.numpy as jnp
    from bachelors_tpu.ops.pallas_rhs import rk4_final_stage_pallas

    p = params(BoundaryType.NEUMANN, S=0.25)
    x = rand_states(rng, p, 1)[0]
    k1, k2, k3 = rand_states(rng, p, 3)
    got = rk4_final_stage_pallas(x, k1, k2, k3, p, interpret=True)
    k4 = oracle([x, k3], [1.0, p.dt], p)
    dt = p.dt
    want_F = x[0] + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
    want_U = x[1] + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
    assert_match(got[0], want_F)
    assert_match(got[1], want_U)


def test_rkm_final_mode(rng):
    """Fused Merson stage 5 + update + error partials == explicit path."""
    import jax.numpy as jnp
    from bachelors_tpu.ops.pallas_rhs import rkm_final_stage_pallas

    p = params(BoundaryType.PERIODIC, S=0.0)
    x = rand_states(rng, p, 1)[0]
    k1, k3, k4 = rand_states(rng, p, 3)
    tau = 3.7e-6
    nF, nU, emax_F, emax_U = rkm_final_stage_pallas(x, k1, k3, k4, tau, p,
                                                    interpret=True)
    k5 = oracle([x, k1, k3, k4], [1.0, tau / 2, -3 * tau / 2, 2 * tau], p)
    want_F = x[0] + tau / 6 * (k1[0] + 4 * k4[0] + k5[0])
    want_U = x[1] + tau / 6 * (k1[1] + 4 * k4[1] + k5[1])
    assert_match(nF, want_F)
    assert_match(nU, want_U)
    want_eF = np.abs(0.2 * k1[0] - 0.9 * k3[0] + 0.8 * k4[0] - 0.1 * np.asarray(k5[0])).max()
    want_eU = np.abs(0.2 * k1[1] - 0.9 * k3[1] + 0.8 * k4[1] - 0.1 * np.asarray(k5[1])).max()
    assert float(emax_F) == pytest.approx(want_eF, rel=1e-4)
    assert float(emax_U) == pytest.approx(want_eU, rel=1e-4)


class TestFusedCG:
    def test_cross_matvec_pAp(self, rng):
        from bachelors_tpu.ops.pallas_cg import cross_matvec_pAp
        from bachelors_tpu.ops.stencil import CrossMatrix, cross_matvec
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.NEUMANN)
        A = CrossMatrix(C=3.1, X=-0.4, Y=-0.7, boundary=BoundaryType.NEUMANN)
        v = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        Av, pAp = cross_matvec_pAp(A, jnp.asarray(v), interpret=True)
        want = np.asarray(cross_matvec(A, v, Topology()))
        assert_match(Av, want)
        assert float(pAp) == pytest.approx(float((v * want).sum()), rel=1e-4)

    def test_aniso_matvec_pAp(self, rng):
        from bachelors_tpu.ops.pallas_cg import aniso_matvec_pAp
        from bachelors_tpu.ops.stencil import AnisotropyMatrix, anisotropy_matvec
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.PERIODIC)
        A = AnisotropyMatrix.implicit_phase(p)
        v = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        s = np.abs(rng.normal(size=(p.ny, p.nx))).astype(np.float32)
        Av, pAp = aniso_matvec_pAp(A, jnp.asarray(s), jnp.asarray(v), interpret=True)
        want = np.asarray(anisotropy_matvec(A, s, v, Topology()))
        assert_match(Av, want)
        assert float(pAp) == pytest.approx(float((v * want).sum()), rel=1e-4)

    def test_update_xr_rr(self, rng):
        from bachelors_tpu.ops.pallas_cg import update_xr_rr

        shape = (32, 128)
        x, r, pv, Ap = (rng.normal(size=shape).astype(np.float32) for _ in range(4))
        alpha = 0.37
        xo, ro, rr = update_xr_rr(*map(jnp.asarray, (x, r, pv, Ap)), alpha,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(xo), x + alpha * pv, rtol=1e-5, atol=1e-6)
        want_r = r - alpha * Ap
        np.testing.assert_allclose(np.asarray(ro), want_r, rtol=1e-5, atol=1e-6)
        assert float(rr) == pytest.approx(float((want_r * want_r).sum()), rel=1e-4)

    def test_cg_with_fused_ops(self, rng):
        """Full CG with fused kernels (interpret) == plain CG."""
        from bachelors_tpu.ops.pallas_cg import cross_matvec_pAp
        from bachelors_tpu.ops.stencil import CrossMatrix, cross_matvec
        from bachelors_tpu.parallel.topology import Topology
        from bachelors_tpu.solvers.cg import cg_solve
        import bachelors_tpu.ops.pallas_cg as pcg
        import bachelors_tpu.solvers.cg as cgmod

        topo = Topology()
        p = params(BoundaryType.NEUMANN, dt=1e-3)
        A = CrossMatrix.implicit_heat(p)
        xs = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        b = cross_matvec(A, xs, topo)

        # monkeypatch the in-loop fused kernels to interpret mode
        orig = pcg.update_xr_rr
        orig_axpby = pcg.axpby_inplace
        try:
            pcg.update_xr_rr = lambda *a: orig(*a, interpret=True)
            pcg.axpby_inplace = lambda *a: orig_axpby(*a, interpret=True)
            x_f, res_f = cg_solve(
                lambda v: cross_matvec(A, v, topo), b,
                tolerance=1e-5, max_iters=100, topo=topo,
                matvec_pAp=lambda v, out=None: cross_matvec_pAp(
                    A, v, interpret=True, out=out))
        finally:
            pcg.update_xr_rr = orig
            pcg.axpby_inplace = orig_axpby
        x_p, res_p = cg_solve(lambda v: cross_matvec(A, v, topo), b,
                              tolerance=1e-5, max_iters=100, topo=topo)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_p),
                                   rtol=1e-3, atol=1e-5)

    def test_axpby_inplace(self, rng):
        from bachelors_tpu.ops.pallas_cg import axpby_inplace

        r = rng.normal(size=(16, 128)).astype(np.float32)
        pv = rng.normal(size=(16, 128)).astype(np.float32)
        got = axpby_inplace(1.0, 0.43, jnp.asarray(r), jnp.asarray(pv),
                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), r + 0.43 * pv,
                                   rtol=1e-6, atol=1e-7)
        # the done-iteration coefficient collapse: (0, 1) -> p unchanged
        keep = axpby_inplace(0.0, 1.0, jnp.asarray(r), jnp.asarray(pv),
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(keep), pv)

    def test_advance_p_matvec(self, rng):
        from bachelors_tpu.ops.pallas_cg import cross_advance_p_matvec
        from bachelors_tpu.ops.stencil import CrossMatrix, cross_matvec
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.NEUMANN)
        A = CrossMatrix(C=2.7, X=-0.3, Y=-0.5, boundary=BoundaryType.NEUMANN)
        r = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        pv = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        beta = 0.43
        p2, Ap2, pAp2 = cross_advance_p_matvec(A, jnp.asarray(r), jnp.asarray(pv),
                                               beta, interpret=True)
        want_p = r + beta * pv
        want_Ap = np.asarray(cross_matvec(A, want_p, Topology()))
        assert_match(p2, want_p)
        assert_match(Ap2, want_Ap)
        assert float(pAp2) == pytest.approx(float((want_p * want_Ap).sum()), rel=1e-4)

    def test_cg_solve_fused_matches_plain(self, rng):
        from bachelors_tpu.ops.pallas_cg import (cross_advance_p_matvec,
                                                 cross_matvec_pAp)
        from bachelors_tpu.ops.stencil import CrossMatrix, cross_matvec
        from bachelors_tpu.parallel.topology import Topology
        from bachelors_tpu.solvers.cg import cg_solve, cg_solve_fused
        import bachelors_tpu.ops.pallas_cg as pcg

        topo = Topology()
        p = params(BoundaryType.NEUMANN, dt=1e-3)
        A = CrossMatrix.implicit_heat(p)
        xs = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        b = cross_matvec(A, xs, topo)

        orig = pcg.update_xr_rr
        pcg.update_xr_rr = lambda *a: orig(*a, interpret=True)
        try:
            x_f, res_f = cg_solve_fused(
                lambda v: cross_matvec(A, v, topo),
                lambda v, out=None: cross_matvec_pAp(A, v, interpret=True,
                                                     out=out),
                lambda r, pv, beta, out=None: cross_advance_p_matvec(
                    A, r, pv, beta, interpret=True, out=out),
                b, tolerance=1e-5, max_iters=100, topo=topo)
        finally:
            pcg.update_xr_rr = orig
        x_p, res_p = cg_solve(lambda v: cross_matvec(A, v, topo), b,
                              tolerance=1e-5, max_iters=100, topo=topo)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_p),
                                   rtol=1e-3, atol=1e-5)
        assert abs(int(res_f.iters) - int(res_p.iters)) <= 2


class TestShardedPallas:
    """Ghost-row kernel variant inside shard_map (interpret mode, CPU mesh)."""

    @pytest.mark.parametrize("bc", BCS)
    def test_ghost_kernel_matches_topo_path(self, bc, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import blend_rhs_pallas_sharded
        from bachelors_tpu.ops.rhs import eval_rhs
        from bachelors_tpu.parallel.mesh import make_mesh
        from bachelors_tpu.parallel.topology import Topology

        p = params(bc, ny=64, nx=128, S=0.25, m0=6.0)
        F = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        U = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        kF = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        kU = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        w = [1.0, 0.371]

        mesh, topo = make_mesh(shards_y=4)

        def sharded_fn(F, U, kF, kU):
            return blend_rhs_pallas_sharded(
                [(F, U), (kF, kU)], w, p, topo.axis_y, fu=0.05,
                interpret=True)

        run = jax.shard_map(sharded_fn, mesh=mesh,
                            in_specs=(P("y"),) * 4,
                            out_specs=(P("y"), P("y")), check_vma=False)
        with jax.set_mesh(mesh):
            gF, gU = run(F, U, kF, kU)

        want = eval_rhs([(F, U), (kF, kU)], w, p, Topology(), fu=0.05)
        assert_match(gF, want[0])
        assert_match(gU, want[1])

    def test_ghost_kernel_euler_mode(self, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import blend_rhs_pallas_sharded
        from bachelors_tpu.ops.rhs import euler_eval
        from bachelors_tpu.parallel.mesh import make_mesh
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.NEUMANN, ny=64, nx=128, S=0.0)
        F = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        U = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        mesh, topo = make_mesh(shards_y=4)
        run = jax.shard_map(
            lambda F, U: blend_rhs_pallas_sharded(
                [(F, U)], [1.0], p, topo.axis_y, is_euler=True, interpret=True),
            mesh=mesh, in_specs=(P("y"), P("y")),
            out_specs=(P("y"), P("y")), check_vma=False)
        with jax.set_mesh(mesh):
            gF, gU = run(F, U)
        want = euler_eval([(F, U)], [1.0], p, Topology())
        assert_match(gF, want[0])
        assert_match(gU, want[1])

    def test_supports_sharded_gates(self):
        from bachelors_tpu.ops.pallas_rhs import supports_sharded

        p = params(BoundaryType.NEUMANN)
        assert supports_sharded(p, 64)
        assert not supports_sharded(p, 12)   # local rows not multiple of 8
        assert not supports_sharded(p.replace(dtype="float64"), 64)

    def test_rk4_final_stage_sharded(self, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import (rk4_final_stage_pallas,
                                                  rk4_final_stage_pallas_sharded)
        from bachelors_tpu.parallel.mesh import make_mesh

        p = params(BoundaryType.NEUMANN, ny=64, nx=128, S=0.25, m0=6.0)
        arrs = rand_states(rng, p, 4)
        x, k1, k2, k3 = arrs
        mesh, topo = make_mesh(shards_y=4)
        run = jax.shard_map(
            lambda *a: rk4_final_stage_pallas_sharded(
                (a[0], a[1]), (a[2], a[3]), (a[4], a[5]), (a[6], a[7]),
                p, topo.axis_y, interpret=True),
            mesh=mesh, in_specs=(P("y"),) * 8, out_specs=(P("y"), P("y")),
            check_vma=False)
        flat = [f for pair in arrs for f in pair]
        with jax.set_mesh(mesh):
            gF, gU = run(*flat)
        wF, wU = rk4_final_stage_pallas(x, k1, k2, k3, p, interpret=True)
        assert_match(gF, wF)
        assert_match(gU, wU)

    def test_rkm_final_stage_sharded(self, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import (rkm_final_stage_pallas,
                                                  rkm_final_stage_pallas_sharded)
        from bachelors_tpu.parallel.mesh import make_mesh

        p = params(BoundaryType.PERIODIC, ny=64, nx=128, S=0.0)
        arrs = rand_states(rng, p, 4)
        x, k1, k3, k4 = arrs
        tau = 2.3e-6
        mesh, topo = make_mesh(shards_y=4)

        def fn(*a):
            import jax.lax as lax
            nF, nU, eF, eU = rkm_final_stage_pallas_sharded(
                (a[0], a[1]), (a[2], a[3]), (a[4], a[5]), (a[6], a[7]),
                tau, p, topo.axis_y, interpret=True)
            return nF, nU, lax.pmax(eF, "y"), lax.pmax(eU, "y")

        run = jax.shard_map(fn, mesh=mesh, in_specs=(P("y"),) * 8,
                            out_specs=(P("y"), P("y"), P(), P()),
                            check_vma=False)
        flat = [f for pair in arrs for f in pair]
        with jax.set_mesh(mesh):
            gF, gU, geF, geU = run(*flat)
        wF, wU, weF, weU = rkm_final_stage_pallas(x, k1, k3, k4, tau, p,
                                                  interpret=True)
        assert_match(gF, wF)
        assert_match(gU, wU)
        assert float(geF) == pytest.approx(float(weF), rel=1e-4)
        assert float(geU) == pytest.approx(float(weU), rel=1e-4)

    def test_cg_matvec_sharded(self, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_cg import (aniso_matvec_pAp_sharded,
                                                 cross_matvec_pAp_sharded)
        from bachelors_tpu.ops.stencil import (AnisotropyMatrix, CrossMatrix,
                                               anisotropy_matvec, cross_matvec)
        from bachelors_tpu.parallel.mesh import make_mesh
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.NEUMANN, ny=64, nx=128, dt=1e-3)
        v = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        sm = np.abs(rng.normal(size=(p.ny, p.nx))).astype(np.float32)
        mesh, topo = make_mesh(shards_y=4)
        A_U = CrossMatrix.implicit_heat(p)
        A_F = AnisotropyMatrix.implicit_phase(p)

        def fn(v, sm):
            import jax.lax as lax
            Av, pAp = cross_matvec_pAp_sharded(A_U, v, topo.axis_y,
                                               interpret=True)
            Bv, pBp = aniso_matvec_pAp_sharded(A_F, sm, v, topo.axis_y,
                                               interpret=True)
            return Av, Bv, lax.psum(pAp, "y"), lax.psum(pBp, "y")

        run = jax.shard_map(fn, mesh=mesh, in_specs=(P("y"), P("y")),
                            out_specs=(P("y"), P("y"), P(), P()),
                            check_vma=False)
        with jax.set_mesh(mesh):
            Av, Bv, pAp, pBp = run(v, sm)
        wA = np.asarray(cross_matvec(A_U, v, Topology()))
        wB = np.asarray(anisotropy_matvec(A_F, sm, v, Topology()))
        assert_match(Av, wA)
        assert_match(Bv, wB)
        assert float(pAp) == pytest.approx(float((v * wA).sum()), rel=1e-4)
        assert float(pBp) == pytest.approx(float((v * wB).sum()), rel=1e-4)


def test_rk4_fused_gate_uses_full_capacity():
    """Regression: the rk4_combine kernel holds 2 blend states + 4 extra
    blocks; backend resolution for that stage must use the full VMEM
    footprint (n_states=4) or wide grids crash with ty=0 (review finding)."""
    from bachelors_tpu.ops.rhs import _resolve_backend
    from bachelors_tpu.parallel.topology import Topology

    # supports(p, 2) is True but supports(p, 4) is False at this width
    p = params(BoundaryType.NEUMANN, nx=16384, ny=16, backend="pallas")
    assert supports(p, 2) and not supports(p, 4)
    # the gate the rk4 fused stage uses (capacity 4) must reject loudly
    with pytest.raises(ValueError, match="unsupported"):
        _resolve_backend(p, Topology(), 4, ny_local=16)
    # while plain 2-state stages remain eligible
    assert _resolve_backend(p, Topology(), 2, ny_local=16) == "pallas"


def test_kernel_mixed_boundary_conditions(rng):
    """The fused kernel handles per-field BCs (independent halo index maps
    and x fixups for Phi and T)."""
    p = params(BoundaryType.NEUMANN, ny=64)
    p = p.replace(Phi_boundary=BoundaryType.PERIODIC,
                  T_boundary=BoundaryType.DIRICHLET)
    (F, U), = rand_states(rng, p, 1)
    got = blend_rhs_pallas([(F, U)], [1.0], p, interpret=True)
    want = oracle([(F, U)], [1.0], p)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


@pytest.mark.parametrize("T", [2, 4])
@pytest.mark.parametrize("bc", BCS)
def test_euler2_pair_matches_two_single_steps(bc, T, rng):
    """Fused 2-step Euler (temporal blocking) vs two single fused steps:
    identical in exact arithmetic; compared at f32-rounding tolerance (the
    env's --xla_allow_excess_precision lets FMA contraction differ between
    the two kernel graphs)."""
    from bachelors_tpu.ops.pallas_rhs import euler2_pallas, supports_euler2

    p = params(bc, ny=64, S=0.3)
    assert supports_euler2(p)
    (F, U), = rand_states(rng, p, 1)
    d = 0.3 if bc == BoundaryType.DIRICHLET else 0.0
    F2, U2 = jnp.asarray(F, jnp.float32), jnp.asarray(U, jnp.float32)
    for _ in range(T):
        F2, U2 = blend_rhs_pallas([(F2, U2)], [1.0], p, dirichlet_value=d,
                                  is_euler=True, interpret=True)
    Fp, Up = euler2_pallas(jnp.asarray(F, jnp.float32),
                           jnp.asarray(U, jnp.float32), p,
                           dirichlet_value=d, interpret=True, T=T)
    assert_match(Fp, F2)
    assert_match(Up, U2)


def test_euler2_multi_tile_and_isotropic(rng):
    """Pair kernel across several row-tiles + the S=0 benchmark physics."""
    from bachelors_tpu.ops.pallas_rhs import euler2_pallas

    p = params(BoundaryType.NEUMANN, ny=256, nx=128, S=0.0)
    (F, U), = rand_states(rng, p, 1)
    F1, U1 = blend_rhs_pallas([(F, U)], [1.0], p, is_euler=True, interpret=True)
    F2, U2 = blend_rhs_pallas([(F1, U1)], [1.0], p, is_euler=True, interpret=True)
    Fp, Up = euler2_pallas(jnp.asarray(F, jnp.float32),
                           jnp.asarray(U, jnp.float32), p, interpret=True)
    assert_match(Fp, F2)
    assert_match(Up, U2)


def test_advance_n_pair_stepper_exact_step_count(rng):
    """advance_n with a pair stepper lands on exactly n steps for odd and
    even n and matches the single-step path."""
    import bachelors_tpu as bt
    from bachelors_tpu.parallel.topology import Topology
    from bachelors_tpu.solvers.run import advance_n

    p = params(BoundaryType.NEUMANN, ny=32, S=0.0,
               solver=bt.SolverType.EXPLICIT_EULER)
    (F, U), = rand_states(rng, p, 1)
    st0 = bt.make_state(F, U, p)
    step = bt.make_stepper(p)

    # a fake pair stepper built from two single steps (the pallas pair
    # kernel itself is interpret-tested above; here we test the loop math)
    def pair(s):
        s1, _ = step(s)
        s2, _ = step(s1)
        return s2

    pair.block_steps = 2
    for n in (4, 7, 1, 0):
        a = advance_n(step, st0, n)
        b = advance_n(step, st0, n, pair_stepper=pair)
        assert int(a.iter) == int(b.iter) == n
        np.testing.assert_array_equal(np.asarray(a.F), np.asarray(b.F))

    # width-4 blocks: 4*(n//4) + n%4 singles still land on exactly n
    def quad(s):
        for _ in range(4):
            s, _ = step(s)
        return s

    quad.block_steps = 4
    for n in (8, 9, 3):
        a = advance_n(step, st0, n)
        b = advance_n(step, st0, n, pair_stepper=quad)
        assert int(a.iter) == int(b.iter) == n
        np.testing.assert_array_equal(np.asarray(a.F), np.asarray(b.F))


def test_pallas_stats_rival_matches_xla(rng):
    """The independent Pallas fused-stats kernel (the microbench 'custom'
    rival, analog of `simulation.cu:1300-1358`'s custom-vs-thrust race)
    agrees with the production XLA stats pass."""
    from bachelors_tpu.ops.pallas_stats import pallas_field_stats
    from bachelors_tpu.ops.reductions import field_stats
    from bachelors_tpu.parallel.topology import Topology

    x = rng.normal(size=(256 * 1024,)).astype(np.float32) * 3.7
    a = pallas_field_stats(jnp.asarray(x), interpret=True)
    b = field_stats(jnp.asarray(x), Topology())
    for k in ("sum", "L1", "L2", "min", "max"):
        got, want = float(getattr(a, k)), float(getattr(b, k))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4), k


def test_pallas_stats_rejects_ragged():
    from bachelors_tpu.ops.pallas_stats import pallas_field_stats

    with pytest.raises(ValueError, match="divisible"):
        pallas_field_stats(jnp.ones(1000), interpret=True)


class TestSharded2D:
    """Ghost-row + ghost-COLUMN kernel on a 2D (y, x) mesh (round 2: the
    x-sharded fused path, previously an XLA fallback)."""

    @pytest.mark.parametrize("bc", BCS)
    def test_2d_ghost_kernel_matches_oracle(self, bc, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import blend_rhs_pallas_sharded
        from bachelors_tpu.ops.rhs import eval_rhs
        from bachelors_tpu.parallel.mesh import make_mesh
        from bachelors_tpu.parallel.topology import Topology

        p = params(bc, ny=32, nx=256, S=0.25, m0=6.0)
        F = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        U = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        kF = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        kU = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        w = [1.0, 0.371]
        d = 0.3 if bc == BoundaryType.DIRICHLET else 0.0

        mesh, topo = make_mesh(shards_y=2, shards_x=2)
        run = jax.shard_map(
            lambda *a: blend_rhs_pallas_sharded(
                [(a[0], a[1]), (a[2], a[3])], w, p, topo.axis_y, fu=0.05,
                dirichlet_value=d * sum(w), interpret=True,
                axis_x=topo.axis_x),
            mesh=mesh, in_specs=(P("y", "x"),) * 4,
            out_specs=(P("y", "x"), P("y", "x")), check_vma=False)
        with jax.set_mesh(mesh):
            gF, gU = run(F, U, kF, kU)

        want = eval_rhs([(F, U), (kF, kU)], w, p, Topology(), fu=0.05,
                        dirichlet_value=d)
        assert_match(gF, want[0])
        assert_match(gU, want[1])

    def test_x_only_mesh(self, rng):
        """1D column decomposition: ghost columns only, y handled by BCs."""
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import blend_rhs_pallas_sharded
        from bachelors_tpu.ops.rhs import euler_eval
        from bachelors_tpu.parallel.mesh import make_mesh
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.NEUMANN, ny=32, nx=512, S=0.0)
        F = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        U = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        mesh, topo = make_mesh(shards_x=4)
        run = jax.shard_map(
            lambda F, U: blend_rhs_pallas_sharded(
                [(F, U)], [1.0], p, topo.axis_y, is_euler=True,
                interpret=True, axis_x=topo.axis_x),
            mesh=mesh, in_specs=(P(None, "x"),) * 2,
            out_specs=(P(None, "x"), P(None, "x")), check_vma=False)
        with jax.set_mesh(mesh):
            gF, gU = run(F, U)
        want = euler_eval([(F, U)], [1.0], p, Topology())
        assert_match(gF, want[0])
        assert_match(gU, want[1])


@pytest.mark.parametrize("bc", BCS)
def test_rk4_full_step_matches_staged_oracle(bc, rng):
    """Whole-RK4-step fusion (one HBM pass) vs the staged XLA oracle."""
    from bachelors_tpu.core.params import SimParams
    from bachelors_tpu.ops.pallas_rhs import rk4_full_pallas, supports_fullstep
    from bachelors_tpu.parallel.topology import Topology
    from bachelors_tpu.solvers.explicit import rk4_step

    p = params(bc, ny=64, S=0.3)
    assert supports_fullstep(p)
    (F, U), = rand_states(rng, p, 1)
    want = rk4_step(jnp.asarray(F), jnp.asarray(U), p.replace(backend="xla"),
                    Topology(), fu=0.03)
    got = rk4_full_pallas(jnp.asarray(F, jnp.float32),
                          jnp.asarray(U, jnp.float32), p, fu=0.03,
                          interpret=True)
    assert_match(got[0], want[0])
    assert_match(got[1], want[1])


@pytest.mark.parametrize("bc", BCS)
def test_rkm_attempt_matches_staged_oracle(bc, rng):
    """Whole-Merson-attempt fusion vs the staged XLA oracle: next state AND
    the Lmax error combination."""
    from bachelors_tpu.ops.pallas_rhs import rkm_attempt_pallas, supports_fullstep
    from bachelors_tpu.ops.rhs import eval_rhs
    from bachelors_tpu.parallel.topology import Topology

    p = params(bc, ny=64, S=0.3)
    assert supports_fullstep(p)
    (F, U), = rand_states(rng, p, 1)
    F = jnp.asarray(F, jnp.float32)
    U = jnp.asarray(U, jnp.float32)
    tau = 3.7e-6
    topo = Topology()
    one = 1.0
    k1 = eval_rhs([(F, U)], [one], p, topo, 0.03)
    k2 = eval_rhs([(F, U), k1], [one, tau / 3], p, topo, 0.03)
    k3 = eval_rhs([(F, U), k1, k2], [one, tau / 6, tau / 6], p, topo, 0.03)
    k4 = eval_rhs([(F, U), k1, k3], [one, tau / 8, 3 * tau / 8], p, topo, 0.03)
    k5 = eval_rhs([(F, U), k1, k3, k4], [one, tau / 2, -3 * tau / 2, 2 * tau],
                  p, topo, 0.03)
    want_F = F + tau / 6 * (k1[0] + 4 * k4[0] + k5[0])
    want_U = U + tau / 6 * (k1[1] + 4 * k4[1] + k5[1])
    want_eF = float(jnp.max(jnp.abs(0.2 * k1[0] - 0.9 * k3[0] + 0.8 * k4[0] - 0.1 * k5[0])))
    want_eU = float(jnp.max(jnp.abs(0.2 * k1[1] - 0.9 * k3[1] + 0.8 * k4[1] - 0.1 * k5[1])))

    nF, nU, eF, eU = rkm_attempt_pallas(F, U, tau, p, fu=0.03, interpret=True)
    assert_match(nF, want_F)
    assert_match(nU, want_U)
    np.testing.assert_allclose(float(eF), want_eF, rtol=2e-4)
    np.testing.assert_allclose(float(eU), want_eU, rtol=2e-4)


def test_rkm_attempt_compensated_err_hook(rng, monkeypatch):
    """The COMPENSATED_ERR A/B hook: identical state update, error estimate
    equal to the plain form within f32 combination rounding (the compensated
    evaluation is exact up to the final 0.1 scale)."""
    import bachelors_tpu.ops.pallas_rhs as prhs

    p = params(BoundaryType.NEUMANN, ny=32, S=0.3)
    (F, U), = rand_states(rng, p, 1)
    F = jnp.asarray(F, jnp.float32)
    U = jnp.asarray(U, jnp.float32)
    tau = 3.7e-6
    nF0, nU0, eF0, eU0 = prhs.rkm_attempt_pallas(F, U, tau, p, fu=0.03,
                                                 interpret=True)
    monkeypatch.setattr(prhs, "COMPENSATED_ERR", True)
    prhs._fullstep_call.clear_cache()
    try:
        nF1, nU1, eF1, eU1 = prhs.rkm_attempt_pallas(F, U, tau, p, fu=0.03,
                                                     interpret=True)
    finally:
        # drop programs traced with the flag on before it is restored
        prhs._fullstep_call.clear_cache()
    np.testing.assert_array_equal(np.asarray(nF0), np.asarray(nF1))
    np.testing.assert_array_equal(np.asarray(nU0), np.asarray(nU1))
    np.testing.assert_allclose(float(eF1), float(eF0), rtol=1e-3)
    np.testing.assert_allclose(float(eU1), float(eU0), rtol=1e-3)


class TestSiPrepare:
    """Fused semi-implicit prepare kernel (r0_F, dt*lap(U)[, s]) vs the XLA
    oracle `models.allen_cahn.semi_implicit_prepare` (interpret mode)."""

    @staticmethod
    def _oracle(F, U, p):
        from bachelors_tpu.core.boundary import pad2
        from bachelors_tpu.models.allen_cahn import semi_implicit_prepare
        from bachelors_tpu.solvers.semi_implicit import _lap_from_padded

        Fp = pad2(jnp.asarray(F, jnp.float32), p.Phi_boundary)
        Up = pad2(jnp.asarray(U, jnp.float32), p.T_boundary)
        r0, s = semi_implicit_prepare(Fp, Up, p)
        return r0, p.dt * _lap_from_padded(Up, p), s

    @pytest.mark.parametrize("bc", BCS)
    @pytest.mark.parametrize("S,guess", [(0.0, False), (0.3, False),
                                         (0.3, True), (0.0, True)])
    def test_matches_oracle(self, bc, S, guess, rng):
        from bachelors_tpu.ops.pallas_rhs import si_prepare_pallas, si_s_varies

        p = params(bc, ny=64, S=S, do_corrector_guess=guess)
        (F, U), = rand_states(rng, p, 1)
        want_r0, want_ut, want_s = self._oracle(F, U, p)
        out = si_prepare_pallas(jnp.asarray(F), jnp.asarray(U), p,
                                interpret=True)
        # r0 values are O(dt): compare at absolute scale of the field terms
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want_r0),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want_ut),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        if si_s_varies(p):
            assert len(out) == 3
            assert_match(out[2], want_s)
        else:
            assert len(out) == 2
            # the oracle's s map is exactly the constant the solver folds in
            np.testing.assert_array_equal(np.asarray(want_s),
                                          np.float32(p.gamma / p.alpha))

    @pytest.mark.parametrize("S,guess", [(0.0, False), (0.3, True)])
    def test_matches_oracle_square_cells(self, S, guess, rng):
        """Square cells engage `_make_si_terms`'s folded stencil/gradient
        constants (the production branch; the default geometry is
        non-square)."""
        from bachelors_tpu.ops.pallas_rhs import si_prepare_pallas, si_s_varies

        p = params(BoundaryType.NEUMANN, ny=128, nx=128, S=S,
                   do_corrector_guess=guess)
        assert p.dx == p.dy
        (F, U), = rand_states(rng, p, 1)
        want_r0, want_ut, want_s = self._oracle(F, U, p)
        out = si_prepare_pallas(jnp.asarray(F), jnp.asarray(U), p,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want_r0),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want_ut),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        if si_s_varies(p):
            assert_match(out[2], want_s)

    def test_sharded_ghost_rows(self, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import si_prepare_pallas_sharded
        from bachelors_tpu.parallel.mesh import make_mesh

        p = params(BoundaryType.NEUMANN, ny=64, nx=128, S=0.3,
                   do_corrector_guess=True)
        (F, U), = rand_states(rng, p, 1)
        want = self._oracle(F, U, p)
        mesh, topo = make_mesh(shards_y=4)
        run = jax.shard_map(
            lambda F, U: si_prepare_pallas_sharded(F, U, p, topo.axis_y,
                                                   interpret=True),
            mesh=mesh, in_specs=(P("y"), P("y")),
            out_specs=(P("y"),) * 3, check_vma=False)
        with jax.set_mesh(mesh):
            out = run(jnp.asarray(F), jnp.asarray(U))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want[1]),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        assert_match(out[2], want[2])

    def test_sharded_2d_mesh(self, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.ops.pallas_rhs import si_prepare_pallas_sharded
        from bachelors_tpu.parallel.mesh import make_mesh

        p = params(BoundaryType.PERIODIC, ny=32, nx=256, S=0.3)
        (F, U), = rand_states(rng, p, 1)
        want = self._oracle(F, U, p)
        mesh, topo = make_mesh(shards_y=2, shards_x=2)
        run = jax.shard_map(
            lambda F, U: si_prepare_pallas_sharded(
                F, U, p, topo.axis_y, axis_x=topo.axis_x, interpret=True),
            mesh=mesh, in_specs=(P("y", "x"), P("y", "x")),
            out_specs=(P("y", "x"),) * 3, check_vma=False)
        with jax.set_mesh(mesh):
            out = run(jnp.asarray(F), jnp.asarray(U))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want[1]),
                                   atol=2e-5 * p.dt / 5e-6, rtol=1e-4)
        assert_match(out[2], want[2])

    def test_si_step_with_fused_prepare_matches_xla(self, rng):
        """End-to-end semi-implicit step: fused prepare + constant-s
        cross-form CG vs the all-XLA path (monkeypatched interpret mode)."""
        import bachelors_tpu.ops.rhs as rhs_mod
        import bachelors_tpu.ops.pallas_rhs as prhs
        import bachelors_tpu.ops.pallas_cg as pcg
        from bachelors_tpu.parallel.topology import Topology
        from bachelors_tpu.solvers.semi_implicit import semi_implicit_step_based

        p = params(BoundaryType.NEUMANN, ny=64, S=0.0,
                   Phi_tolerance=1e-7, T_tolerance=1e-7,
                   Phi_max_iters=10, T_max_iters=10)
        (F, U), = rand_states(rng, p, 1)
        F = jnp.asarray(0.5 + 0.1 * F, jnp.float32)
        U = jnp.asarray(0.1 * U, jnp.float32)
        topo = Topology()

        want_F, want_U, res_F, res_U = semi_implicit_step_based(F, U, U, p, topo)

        orig_resolve = rhs_mod._resolve_backend
        orig_prep = prhs.si_prepare_pallas
        orig_cross = pcg.cross_matvec_pAp
        orig_update = pcg.update_xr_rr
        orig_axpby = pcg.axpby_inplace
        try:
            rhs_mod._resolve_backend = lambda *a, **k: "pallas"
            prhs.si_prepare_pallas = lambda *a, **k: orig_prep(*a, **{**k, "interpret": True})
            pcg.cross_matvec_pAp = lambda *a, **k: orig_cross(*a, **{**k, "interpret": True})
            pcg.update_xr_rr = lambda *a, **k: orig_update(*a, **{**k, "interpret": True})
            pcg.axpby_inplace = lambda *a, **k: orig_axpby(*a, **{**k, "interpret": True})
            got_F, got_U, gres_F, gres_U = semi_implicit_step_based(F, U, U, p, topo)
        finally:
            rhs_mod._resolve_backend = orig_resolve
            prhs.si_prepare_pallas = orig_prep
            pcg.cross_matvec_pAp = orig_cross
            pcg.update_xr_rr = orig_update
            pcg.axpby_inplace = orig_axpby

        assert_match(got_F, want_F, atol=1e-6)
        assert_match(got_U, want_U, atol=1e-6)
        # both paths must converge below tolerance, in a similar iteration count
        assert int(gres_F.iters) <= p.Phi_max_iters
        assert abs(int(gres_F.iters) - int(res_F.iters)) <= 1


class TestShardedFullstep:
    """Whole-integrator fusion on a y-sharded mesh: 8-row ghost SLABS carry
    the neighbor's x once per step; the stage chain recomputes in VMEM
    (interpret mode, CPU mesh, vs the single-device staged oracle)."""

    @staticmethod
    def _mesh4():
        import jax
        from bachelors_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        return make_mesh(shards_y=4)

    @pytest.mark.parametrize("bc", BCS)
    def test_rk4_full_sharded(self, bc, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        mesh, topo = self._mesh4()
        from bachelors_tpu.ops.pallas_rhs import (rk4_full_pallas_sharded,
                                                  supports_fullstep_sharded)
        from bachelors_tpu.parallel.topology import Topology
        from bachelors_tpu.solvers.explicit import rk4_step

        p = params(bc, ny=64, nx=128, S=0.3)
        assert supports_fullstep_sharded(p, p.ny // 4, p.nx)
        (F, U), = rand_states(rng, p, 1)
        run = jax.shard_map(
            lambda F, U: rk4_full_pallas_sharded(F, U, p, topo.axis_y,
                                                 fu=0.02, interpret=True),
            mesh=mesh, in_specs=(P("y"), P("y")),
            out_specs=(P("y"), P("y")), check_vma=False)
        with jax.set_mesh(mesh):
            gF, gU = run(jnp.asarray(F), jnp.asarray(U))
        wF, wU = rk4_step(jnp.asarray(F, jnp.float32),
                          jnp.asarray(U, jnp.float32), p, Topology(), fu=0.02)
        assert_match(gF, wF)
        assert_match(gU, wU)

    @pytest.mark.parametrize("bc", BCS)
    def test_rkm_attempt_sharded(self, bc, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        mesh, topo = self._mesh4()
        from bachelors_tpu.ops.pallas_rhs import rkm_attempt_pallas_sharded
        from bachelors_tpu.ops.rhs import eval_rhs
        from bachelors_tpu.parallel.topology import Topology

        p = params(bc, ny=64, nx=128, S=0.3)
        (F, U), = rand_states(rng, p, 1)
        F = jnp.asarray(F, jnp.float32)
        U = jnp.asarray(U, jnp.float32)
        tau = 3.7e-6

        def attempt(F, U):
            nF, nU, eF, eU = rkm_attempt_pallas_sharded(
                F, U, tau, p, topo.axis_y, fu=0.03, interpret=True)
            # the kernel's maxima are shard-local; apply the solver's pmax
            # contract so the assertion sees the GLOBAL maxima (P() output
            # takes shard 0's value, which need not hold the max)
            return nF, nU, jax.lax.pmax(eF, "y"), jax.lax.pmax(eU, "y")

        run = jax.shard_map(
            attempt, mesh=mesh, in_specs=(P("y"), P("y")),
            out_specs=(P("y"), P("y"), P(), P()), check_vma=False)
        with jax.set_mesh(mesh):
            nF, nU, eF, eU = run(F, U)

        topo0 = Topology()
        one = 1.0
        k1 = eval_rhs([(F, U)], [one], p, topo0, 0.03)
        k2 = eval_rhs([(F, U), k1], [one, tau / 3], p, topo0, 0.03)
        k3 = eval_rhs([(F, U), k1, k2], [one, tau / 6, tau / 6], p, topo0, 0.03)
        k4 = eval_rhs([(F, U), k1, k3], [one, tau / 8, 3 * tau / 8], p, topo0, 0.03)
        k5 = eval_rhs([(F, U), k1, k3, k4], [one, tau / 2, -3 * tau / 2, 2 * tau],
                      p, topo0, 0.03)
        want_F = F + tau / 6 * (k1[0] + 4 * k4[0] + k5[0])
        want_U = U + tau / 6 * (k1[1] + 4 * k4[1] + k5[1])
        want_eF = float(jnp.max(jnp.abs(0.2 * k1[0] - 0.9 * k3[0] + 0.8 * k4[0] - 0.1 * k5[0])))
        want_eU = float(jnp.max(jnp.abs(0.2 * k1[1] - 0.9 * k3[1] + 0.8 * k4[1] - 0.1 * k5[1])))

        assert_match(nF, want_F)
        assert_match(nU, want_U)
        # shard-local maxima pmax to the global values; the sharded runner
        # applies topo.allmax -- emulate it here by maxing the replicated out
        np.testing.assert_allclose(float(jnp.max(eF)), want_eF, rtol=2e-4)
        np.testing.assert_allclose(float(jnp.max(eU)), want_eU, rtol=2e-4)

    @pytest.mark.parametrize("bc", BCS)
    def test_euler2_sharded(self, bc, rng):
        """Ghost-slab temporal blocking == T sequential fused Euler steps."""
        import jax
        from jax.sharding import PartitionSpec as P

        mesh, topo = self._mesh4()
        from bachelors_tpu.ops.pallas_rhs import (blend_rhs_pallas,
                                                  euler2_pallas_sharded)

        p = params(bc, ny=64, nx=128, S=0.25, m0=6.0)
        (F, U), = rand_states(rng, p, 1)
        T = 4
        run = jax.shard_map(
            lambda F, U: euler2_pallas_sharded(F, U, p, topo.axis_y,
                                               interpret=True, T=T),
            mesh=mesh, in_specs=(P("y"), P("y")),
            out_specs=(P("y"), P("y")), check_vma=False)
        with jax.set_mesh(mesh):
            gF, gU = run(jnp.asarray(F), jnp.asarray(U))

        wF, wU = jnp.asarray(F, jnp.float32), jnp.asarray(U, jnp.float32)
        for _ in range(T):
            wF, wU = blend_rhs_pallas([(wF, wU)], [1.0], p, is_euler=True,
                                      interpret=True)
        assert_match(gF, wF)
        assert_match(gU, wU)


class TestShardedCG2D:
    """Fused CG matvecs with ghost COLUMNS (x-only and 2D meshes; round-2
    closes the last deliberate XLA fallback)."""

    @pytest.mark.parametrize("mesh_kind", ["x_only", "yx"])
    @pytest.mark.parametrize("bc", BCS)
    def test_matvec_pAp_ghost_cols(self, bc, mesh_kind, rng):
        import jax
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from bachelors_tpu.core.params import SimParams
        from bachelors_tpu.ops.pallas_cg import (aniso_matvec_pAp_sharded,
                                                 cross_matvec_pAp_sharded)
        from bachelors_tpu.ops.stencil import (AnisotropyMatrix, CrossMatrix,
                                               anisotropy_matvec, cross_matvec)
        from bachelors_tpu.parallel.mesh import make_mesh
        from bachelors_tpu.parallel.topology import Topology

        p = params(bc, ny=32, nx=512)
        if mesh_kind == "x_only":
            mesh, topo = make_mesh(shards_x=4)
            spec = P(None, "x")
        else:
            mesh, topo = make_mesh(shards_y=2, shards_x=2)
            spec = P("y", "x")
        v = rng.normal(size=(p.ny, p.nx)).astype(np.float32)
        sm = (0.3 + 0.1 * rng.random((p.ny, p.nx))).astype(np.float32)
        A_U = CrossMatrix.implicit_heat(p)
        A_F = AnisotropyMatrix.implicit_phase(p)

        def body(v, sm):
            # psum the shard-local partials exactly like cg_solve does via
            # topo.allsum
            Av, pAp = cross_matvec_pAp_sharded(A_U, v, topo.axis_y,
                                               axis_x=topo.axis_x,
                                               interpret=True)
            Bv, pBp = aniso_matvec_pAp_sharded(A_F, sm, v, topo.axis_y,
                                               axis_x=topo.axis_x,
                                               interpret=True)
            return ((Av, topo.allsum(pAp)), (Bv, topo.allsum(pBp)))

        run = jax.shard_map(
            body, mesh=mesh, in_specs=(spec, spec),
            out_specs=((spec, P()), (spec, P())), check_vma=False)
        with jax.set_mesh(mesh):
            (Av, pAp), (Bv, pBp) = run(jnp.asarray(v), jnp.asarray(sm))

        topo0 = Topology()
        want_A = cross_matvec(A_U, jnp.asarray(v), topo0)
        want_B = anisotropy_matvec(A_F, jnp.asarray(sm), jnp.asarray(v), topo0)
        assert_match(Av, want_A)
        assert_match(Bv, want_B)
        np.testing.assert_allclose(float(pAp), float(jnp.vdot(v, want_A)),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(pBp), float(jnp.vdot(v, want_B)),
                                   rtol=2e-4)

    def test_resolver_routes_x_only_mesh(self):
        from bachelors_tpu.core.params import SimParams
        from bachelors_tpu.ops.rhs import _resolve_backend
        from bachelors_tpu.parallel.topology import Topology

        p = params(BoundaryType.NEUMANN, ny=32, nx=512, backend="pallas")
        topo = Topology(axis_x="x")
        assert _resolve_backend(p, topo, 1, ny_local=32, nx_local=128) \
            == "pallas_sharded"
        # CG resolution no longer forces XLA on x-sharded meshes
        assert _resolve_backend(p, topo, 3, ny_local=32, nx_local=128,
                                for_cg=True) == "pallas_sharded"

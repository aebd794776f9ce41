"""Boundary padding vs per-sample oracle (reference semantics
`simulation.cu:29-85`)."""
import numpy as np
import pytest

from bachelors_tpu.core.boundary import pad2, pad_axis
from bachelors_tpu.core.params import BoundaryType

from oracle import pad_oracle

BCS = [BoundaryType.PERIODIC, BoundaryType.NEUMANN, BoundaryType.DIRICHLET]
SIZES = [(1, 1), (1, 5), (4, 4), (3, 7), (8, 8), (5, 16)]


@pytest.mark.parametrize("bc", BCS)
@pytest.mark.parametrize("shape", SIZES)
def test_pad2_matches_oracle(bc, shape, rng):
    A = rng.normal(size=shape)
    got = np.asarray(pad2(A, bc))
    want = pad_oracle(A, bc.value)
    if bc == BoundaryType.PERIODIC:
        # corners are unused by the 5-point stencil; compare edges+interior only
        mask = np.ones_like(want, bool)
        for cy in (0, -1):
            for cx in (0, -1):
                mask[cy, cx] = False
        np.testing.assert_allclose(got[mask], want[mask], rtol=0, atol=0)
    else:
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("bc", BCS)
def test_pad2_dirichlet_value(bc, rng):
    A = rng.normal(size=(6, 6))
    d = 0.37
    got = np.asarray(pad2(A, bc, dirichlet_value=d))
    want = pad_oracle(A, bc.value, dirichlet=d)
    if bc == BoundaryType.PERIODIC:
        np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1])
    else:
        interior_and_edges = np.ones_like(want, bool)
        np.testing.assert_allclose(got[1:-1, :], want[1:-1, :])
        np.testing.assert_allclose(got[:, 1:-1], want[:, 1:-1])


@pytest.mark.parametrize("bc", BCS)
def test_pad_axis_composition(bc, rng):
    """pad_axis(0) then pad_axis(1) agrees with pad2 away from corners."""
    A = rng.normal(size=(5, 9))
    both = np.asarray(pad_axis(pad_axis(A, bc, 0), bc, 1))
    full = np.asarray(pad2(A, bc))
    np.testing.assert_allclose(both[1:-1, :], full[1:-1, :])
    np.testing.assert_allclose(both[:, 1:-1], full[:, 1:-1])

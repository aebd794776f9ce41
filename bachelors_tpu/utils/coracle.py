"""ctypes loader for the native CPU oracle (csrc/phasefield_ref.c).

Compiles the shared library on demand (cached next to the source) and
exposes numpy-friendly wrappers.  Used by the test suite to cross-validate
the JAX/Pallas compute path against an independent native implementation --
the role `cojugate_gradient.c` plays for the reference (SURVEY.md #25).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_BC = {"periodic": 0, "dirichlet": 1, "neumann": 2}


class _PfParams(ctypes.Structure):
    _fields_ = [
        ("nx", ctypes.c_int), ("ny", ctypes.c_int),
        ("phi_bc", ctypes.c_int), ("t_bc", ctypes.c_int),
        ("L0", ctypes.c_double), ("dt", ctypes.c_double),
        ("L", ctypes.c_double), ("xi", ctypes.c_double),
        ("a", ctypes.c_double), ("b", ctypes.c_double),
        ("alpha", ctypes.c_double), ("beta", ctypes.c_double),
        ("gamma", ctypes.c_double), ("Tm", ctypes.c_double),
        ("S", ctypes.c_double), ("m0", ctypes.c_double),
        ("theta0", ctypes.c_double),
        ("corrector_guess", ctypes.c_int),
        ("fu", ctypes.c_double),
    ]


_lib = None


def _src_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "phasefield_ref.c")


def build(force: bool = False) -> str:
    src = _src_path()
    so = src[:-2] + ".so"
    if force or not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", so, src, "-lm"],
            check=True, capture_output=True)
    return so


def load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    D = ctypes.POINTER(ctypes.c_double)
    lib.pf_rhs.argtypes = [D, D, D, D, ctypes.POINTER(_PfParams)]
    lib.pf_cross_matvec.argtypes = [D, D, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int] + [ctypes.c_double] * 3
    lib.pf_aniso_matvec.argtypes = [D, D, D, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int] + [ctypes.c_double] * 3
    lib.pf_cross_matvec_padded.argtypes = [D, D, ctypes.c_int, ctypes.c_int] + \
        [ctypes.c_double] * 3
    lib.pf_cg_cross.argtypes = [D, D, D, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_double, ctypes.c_double,
                                ctypes.c_double, ctypes.c_double, ctypes.c_int,
                                ctypes.c_double, D, D]
    lib.pf_cg_cross.restype = ctypes.c_int
    lib.pf_stats_delta.argtypes = [D, D, ctypes.c_size_t, D]
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.float64))


def rhs(F, U, p, fu: float = 0.0):
    """Evaluate the PDE RHS with the C oracle.  ``p`` is a SimParams."""
    lib = load()
    F = _c64(F)
    U = _c64(U)
    dF = np.zeros_like(F)
    dU = np.zeros_like(U)
    cp = _PfParams(
        nx=p.nx, ny=p.ny,
        phi_bc=_BC[p.Phi_boundary.value], t_bc=_BC[p.T_boundary.value],
        L0=p.L0, dt=p.dt, L=p.L, xi=p.xi, a=p.a, b=p.b, alpha=p.alpha,
        beta=p.beta, gamma=p.gamma, Tm=p.Tm, S=p.S, m0=p.m0, theta0=p.theta0,
        corrector_guess=int(p.do_corrector_guess), fu=fu)
    lib.pf_rhs(_ptr(F), _ptr(U), _ptr(dF), _ptr(dU), ctypes.byref(cp))
    return dF, dU


def cross_matvec(v, bc: str, C: float, X: float, Y: float):
    lib = load()
    v = _c64(v)
    out = np.zeros_like(v)
    ny, nx = v.shape
    lib.pf_cross_matvec(_ptr(v), _ptr(out), nx, ny, _BC[bc], C, X, Y)
    return out


def aniso_matvec(v, s, bc: str, Cm1: float, X: float, Y: float):
    lib = load()
    v = _c64(v)
    s = _c64(s)
    out = np.zeros_like(v)
    ny, nx = v.shape
    lib.pf_aniso_matvec(_ptr(v), _ptr(s), _ptr(out), nx, ny, _BC[bc], Cm1, X, Y)
    return out


def cross_matvec_padded(vpad, C: float, X: float, Y: float):
    lib = load()
    vpad = _c64(vpad)
    ny, nx = vpad.shape[0] - 2, vpad.shape[1] - 2
    out = np.zeros((ny, nx))
    lib.pf_cross_matvec_padded(_ptr(vpad), _ptr(out), nx, ny, C, X, Y)
    return out


def cg_cross(b, bc: str, C: float, X: float, Y: float, x0=None,
             tol: float = 1e-9, max_iters: int = 300, eps: float = 1e-12):
    lib = load()
    b = _c64(b)
    ny, nx = b.shape
    x = np.zeros_like(b)
    scratch = np.zeros(3 * b.size)
    err = ctypes.c_double()
    x0a = _c64(x0) if x0 is not None else None
    iters = lib.pf_cg_cross(
        _ptr(b), _ptr(x), _ptr(x0a) if x0a is not None else None,
        nx, ny, _BC[bc], C, X, Y, tol, max_iters, eps,
        ctypes.byref(err), _ptr(scratch))
    return x, iters, err.value


def stats_delta(a: Optional[np.ndarray], b: np.ndarray):
    lib = load()
    b = _c64(b).ravel()
    out = np.zeros(5)
    if a is None:
        lib.pf_stats_delta(None, _ptr(b), b.size, _ptr(out))
    else:
        a = _c64(a).ravel()
        lib.pf_stats_delta(_ptr(a), _ptr(b), b.size, _ptr(out))
    return dict(sum=out[0], L1=out[1], L2=out[2], min=out[3], max=out[4])

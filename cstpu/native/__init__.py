"""Native (C++) runtime components, loaded via ctypes.

The reference's only native code is binary solver dependencies (COIN-OR Clp
C++ simplex, ECOS C interior point) reached through JuMP
(/root/reference/src/CompressedSensing.jl:15-20). cstpu's equivalents:

  * `simplex_solve` — dense two-phase revised simplex (simplex.cpp), the
    exact LP path for basis pursuit (`bp(..., method="simplex")`) and the
    conformance oracle for the XLA-native ADMM solver.
  * `lasso_homotopy` / `bpd_homotopy` — exact weighted-LASSO path solver
    (lars.cpp); `bpd_homotopy` stops at the ||Ax-b|| = delta crossing,
    the machine-precision equivalent of the SOCP the reference ships to
    ECOS (`bpd(..., method="homotopy")`).

The shared library is built on demand with g++ (no pybind11/setuptools
required) and cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "simplex.cpp"), os.path.join(_HERE, "lars.cpp")]
_LIB = os.path.join(_HERE, "libcstpu_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    """Compile the native library if missing or stale.

    The compiler writes to a process-unique temp file that is atomically
    os.replace'd into place: concurrent importing processes (pytest-xdist
    workers, batch jobs) must never dlopen a half-written .so. The
    staleness test uses <= so a source touched within the same filesystem
    timestamp tick as the cached library still triggers a rebuild."""
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) <= max(os.path.getmtime(s)
                                             for s in _SRCS)):
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
               "-o", tmp, *_SRCS]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, _LIB)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return _LIB


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.cstpu_simplex_solve.restype = ctypes.c_int
            lib.cstpu_simplex_solve.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_double,
            ]
            lib.cstpu_lars_solve.restype = ctypes.c_int
            lib.cstpu_lars_solve.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.cstpu_lars_solve_batch.restype = ctypes.c_int
            lib.cstpu_lars_solve_batch.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
    return _lib


class SimplexError(RuntimeError):
    pass


_STATUS = {1: "infeasible", 2: "unbounded", 3: "iteration limit",
           4: "numerical failure"}


def simplex_solve(A, b, c, max_iter: int = 0, tol: float = 1e-9):
    """Solve min c'x s.t. Ax = b, x >= 0 exactly (vertex solution).

    Returns (x, objective). Raises SimplexError on infeasible/unbounded/
    failed problems.
    """
    lib = _load()
    A = np.ascontiguousarray(A, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    c = np.ascontiguousarray(c, np.float64)
    n, N = A.shape
    if b.shape != (n,) or c.shape != (N,):
        raise ValueError("shape mismatch")
    x = np.zeros(N, np.float64)
    obj = ctypes.c_double(0.0)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.cstpu_simplex_solve(
        n, N,
        A.ctypes.data_as(dp), b.ctypes.data_as(dp), c.ctypes.data_as(dp),
        x.ctypes.data_as(dp), ctypes.byref(obj), int(max_iter), float(tol))
    if rc in _STATUS:
        raise SimplexError(f"simplex: {_STATUS[rc]}")
    return x, obj.value


def bp_simplex(A, b, w=None):
    """Exact (weighted) basis pursuit via the native simplex:
    min w'(x+ + x-) s.t. A(x+ - x-) = b — the same LP the reference ships
    to Clp (/root/reference/src/basispursuit.jl:6-16). Returns a dense x
    with exact zeros off the optimal vertex support."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    n, m = A.shape
    w = np.ones(m) if w is None else np.asarray(w, np.float64)
    Astd = np.concatenate([A, -A], axis=1)
    cstd = np.concatenate([w, w])
    x, _ = simplex_solve(Astd, b, cstd)
    return x[:m] - x[m:]


class HomotopyError(RuntimeError):
    pass


_LARS_STATUS = {1: "iteration limit", 2: "numerical failure",
                3: "bad argument",
                4: "target unreachable (infeasible delta)"}


def _lars(A, b, w, mode: int, target: float, max_iter: int):
    lib = _load()
    A = np.ascontiguousarray(A, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    n, m = A.shape
    if b.shape != (n,):
        raise ValueError("shape mismatch")
    w = np.ones(m) if w is None else np.ascontiguousarray(w, np.float64)
    if w.shape != (m,):
        raise ValueError("weights shape mismatch")
    x = np.zeros(m, np.float64)
    lam = ctypes.c_double(0.0)
    iters = ctypes.c_int(0)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.cstpu_lars_solve(
        n, m, A.ctypes.data_as(dp), b.ctypes.data_as(dp),
        w.ctypes.data_as(dp), int(mode), float(target),
        x.ctypes.data_as(dp), ctypes.byref(lam), ctypes.byref(iters),
        int(max_iter))
    if rc:
        raise HomotopyError(f"homotopy: {_LARS_STATUS.get(rc, rc)}")
    return x, lam.value


def lasso_homotopy(A, b, lam: float, w=None, max_iter: int = 0):
    """Exact weighted-LASSO solution of
    min_x 0.5||Ax-b||^2 + lam * sum_j w_j |x_j|
    by walking the piecewise-linear homotopy path (lars.cpp). Returns a
    dense x with exact zeros off-support — the conformance oracle for
    cstpu.ista/fista (parity target: src/basispursuit.jl:139-183)."""
    x, _ = _lars(A, b, w, 0, float(lam), max_iter)
    return x


def _lars_batch(A, Bs, w, mode: int, target: float, max_iter: int,
                n_threads: int):
    lib = _load()
    A = np.ascontiguousarray(A, np.float64)
    Bs = np.ascontiguousarray(Bs, np.float64)
    n, m = A.shape
    if Bs.ndim != 2 or Bs.shape[1] != n:
        raise ValueError("Bs must be (B, n)")
    B = Bs.shape[0]
    w = np.ones(m) if w is None else np.ascontiguousarray(w, np.float64)
    if w.shape != (m,):
        raise ValueError("weights shape mismatch")
    X = np.zeros((B, m), np.float64)
    lams = np.zeros(B, np.float64)
    statuses = np.zeros(B, np.int32)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    rc = lib.cstpu_lars_solve_batch(
        n, m, A.ctypes.data_as(dp), Bs.ctypes.data_as(dp), B,
        w.ctypes.data_as(dp), int(mode), float(target),
        X.ctypes.data_as(dp), lams.ctypes.data_as(dp),
        statuses.ctypes.data_as(ip), int(max_iter), int(n_threads))
    if rc:
        raise HomotopyError(f"homotopy batch: {_LARS_STATUS.get(rc, rc)}")
    return X, lams, statuses


def lasso_homotopy_batch(A, Bs, lam: float, w=None, max_iter: int = 0,
                         n_threads: int = 0):
    """Exact weighted-LASSO solutions for a batch of measurement rows,
    solved in parallel on host threads (the reference is single-threaded
    even on host — src/CompressedSensing.jl:12 imports Base.Threads and
    never uses it). Returns (X (B, m), statuses (B,)) — per-instance
    statuses (0 ok) instead of a batch abort."""
    X, _, st = _lars_batch(A, Bs, w, 0, float(lam), max_iter, n_threads)
    return X, st


def bpd_homotopy_batch(A, Bs, delta: float, w=None, max_iter: int = 0,
                       n_threads: int = 0):
    """Exact BPD solutions for a batch of measurement rows (threaded; see
    lasso_homotopy_batch). Returns (X, lams, statuses)."""
    return _lars_batch(A, Bs, w, 1, float(delta), max_iter, n_threads)


def bpd_homotopy(A, b, delta: float, w=None, max_iter: int = 0):
    """Exact (weighted) basis-pursuit denoising via the homotopy path:
    min sum_j w_j |x_j| s.t. ||Ax - b||_2 <= delta — the same SOCP the
    reference ships to ECOS (/root/reference/src/basispursuit.jl:83-99).
    The path is left at the exact ||r|| = delta crossing (a quadratic
    root inside one linear segment), so x is exact to rounding. Returns
    (x, lam) with lam the equivalent LASSO multiplier."""
    return _lars(A, b, w, 1, float(delta), max_iter)

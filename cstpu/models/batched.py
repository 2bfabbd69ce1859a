"""Batched-first public entry points.

Every cstpu solver is vmap-compatible; these wrappers make the batched
path explicit and documented: a shared dictionary with a batch of
measurements is THE high-throughput TPU workload (the per-step correlation
becomes one (B x n)(n x m) GEMM that reads A once for the whole batch).
The reference has no batching at all — one (A, b) at a time.
"""

from __future__ import annotations

import jax

from cstpu.models.matching_pursuit import mp, omp, gomp, oblivious
from cstpu.models.forward import fr
from cstpu.models.backward import br, fbr, lace
from cstpu.models.twostage import sp, ompr, srr
from cstpu.models.stepwise import rmp, foba
from cstpu.models.sbl import sbl, fsbl, rmps


def batch(solver, **fixed):
    """vmap `solver(A, b, ...)` over a leading batch axis of b.

    Example: `batch(omp, k=8)(A, Bs)` solves all rows of Bs at once.
    """
    def batched(A, Bs, **kw):
        merged = {**fixed, **kw}
        return jax.vmap(lambda bb: solver(A, bb, **merged))(Bs)
    return batched


def omp_batch(A, Bs, k=None, max_residual: float = 0.0):
    """Batched OMP over measurement rows Bs (B, n)."""
    return jax.vmap(lambda bb: omp(A, bb, k, max_residual))(Bs)


def fr_batch(A, Bs, max_residual: float = 0.0, min_decrease: float = 0.0,
             sparsity=None):
    """Batched forward regression over measurement rows Bs (B, n)."""
    return jax.vmap(
        lambda bb: fr(A, bb, max_residual, min_decrease, sparsity))(Bs)


def sp_batch(A, Bs, k, delta: float = 1e-12, maxiter=None):
    """Batched subspace pursuit over measurement rows Bs (B, n)."""
    return jax.vmap(lambda bb: sp(A, bb, k, delta, maxiter))(Bs)


def gomp_batch(A, Bs, l, k=None, max_residual: float = 0.0):
    """Batched generalized OMP over measurement rows Bs (B, n)."""
    return jax.vmap(lambda bb: gomp(A, bb, l, k, max_residual))(Bs)


def rmps_batch(A, Bs, sigma, **kw):
    """Batched RMPS over measurement rows Bs (B, n)."""
    return jax.vmap(lambda bb: rmps(A, bb, sigma, **kw))(Bs)

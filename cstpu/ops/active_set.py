"""Fixed-shape masked active-set engine — the kernel layer of the framework.

This replaces the reference's dynamic `SparseVector` + `UpdatableQR`
bookkeeping (/root/reference/src/util.jl:117-170,
/root/reference/src/matchingpursuit.jl:150-227) with a static-shape,
jit/vmap/shard-friendly state:

  * `idx`/`mask`   — padded support (insertion order; sorted at extraction)
  * `cols`         — cached active columns of A (zeros where inactive)
  * `G`            — Gram matrix of the active columns, identity-padded so a
                     single fixed-shape Cholesky is always well-posed
  * `Atb`          — A_i' b for the active columns
  * `chol`, `coef` — Cholesky factor of G and the current LS coefficients

Everything the greedy algorithms need falls out of this one factorization:

  * LS refit (`ldiv!` on the QR in the reference) = cho_solve against Atb
  * forward-regression OLS rescaling ||a_j||^2 - ||Q' a_j||^2
    (/root/reference/src/forward.jl:100-114) = colnorm^2 - ||L^-1 Ai' a_j||^2
  * backward-regression gamma = diag((R'R)^-1)
    (/root/reference/src/backward.jl:69-74) = column sums of (L^-1)^2

Appends are O(n*k + k^2); support changes re-factorize the padded Gram with
one kmax^3 Cholesky — a single fused XLA/MXU op, preferred on TPU over the
reference's scalar Givens-rotation updates which cannot tile. The engine is
dtype-generic (f64 on CPU for conformance tests, f32/bf16 on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, solve_triangular


class ActiveSet(NamedTuple):
    idx: jax.Array    # i32[kmax] support indices (insertion order), pad = m
    mask: jax.Array   # bool[kmax]
    k: jax.Array      # i32[] number of active slots
    cols: jax.Array   # f[n, kmax] active columns of A, zero where inactive
    G: jax.Array      # f[kmax, kmax] Gram, identity on inactive slots
    Atb: jax.Array    # f[kmax]
    chol: jax.Array   # f[kmax, kmax] lower Cholesky of G
    coef: jax.Array   # f[kmax] current LS coefficients


def empty(n: int, kmax: int, m: int, dtype) -> ActiveSet:
    """Empty active set with capacity kmax over an n x m dictionary."""
    eye = jnp.eye(kmax, dtype=dtype)
    return ActiveSet(
        idx=jnp.full((kmax,), m, jnp.int32),
        mask=jnp.zeros((kmax,), bool),
        k=jnp.zeros((), jnp.int32),
        cols=jnp.zeros((n, kmax), dtype),
        G=eye,
        Atb=jnp.zeros((kmax,), dtype),
        chol=eye,
        coef=jnp.zeros((kmax,), dtype),
    )


def contains(st: ActiveSet, i) -> jax.Array:
    """True if atom index i is in the active set."""
    return jnp.any(st.mask & (st.idx == i))


def append_col(a, b, st: ActiveSet, i) -> ActiveSet:
    """Add the explicit column `a` as atom index i (no refit).

    This is the primitive used by the sharded solvers, where the owning
    shard broadcasts the selected column and every replica appends it.
    """
    p = st.k
    cols = st.cols.at[:, p].set(a)
    g = cols.T @ a                      # zeros at inactive slots, a'a at p
    G = st.G.at[p, :].set(g).at[:, p].set(g)
    return ActiveSet(
        idx=st.idx.at[p].set(jnp.asarray(i, jnp.int32)),
        mask=st.mask.at[p].set(True),
        k=st.k + 1,
        cols=cols,
        G=G,
        Atb=st.Atb.at[p].set(a @ b),
        chol=st.chol,
        coef=st.coef,
    )


def append(A, b, st: ActiveSet, i) -> ActiveSet:
    """Add atom i at the first free slot (no refit). Caller must `refit`.

    Unconditional fixed-shape scatter; callers guard capacity/duplicates.
    """
    return append_col(jnp.take(A, i, axis=1), b, st, i)


def delete(st: ActiveSet, pos, m: int) -> ActiveSet:
    """Remove the active slot at position `pos`, compacting left (no refit)."""
    kmax = st.idx.shape[0]
    ar = jnp.arange(kmax)
    src = jnp.where(ar >= pos, ar + 1, ar)
    src = jnp.minimum(src, kmax - 1)
    newmask = ar < (st.k - 1)
    dtype = st.G.dtype
    eye = jnp.eye(kmax, dtype=dtype)
    G = st.G[src][:, src]
    G = jnp.where(newmask[:, None] & newmask[None, :], G, eye)
    return ActiveSet(
        idx=jnp.where(newmask, st.idx[src], m),
        mask=newmask,
        k=st.k - 1,
        cols=jnp.where(newmask[None, :], st.cols[:, src], 0),
        G=G,
        Atb=jnp.where(newmask, st.Atb[src], 0),
        chol=st.chol,
        coef=jnp.where(newmask, st.coef[src], 0),
    )


def rebuild(A, b, idx, mask) -> ActiveSet:
    """Construct the state for a given padded support in one shot (GEMMs).

    Used for bulk (re)initialization: backward regression's full start
    (/root/reference/src/backward.jl:34), subspace pursuit's prune step
    (/root/reference/src/twostage.jl:75-83), oblivious acquisition.
    """
    kmax = idx.shape[0]
    dtype = A.dtype
    safe = jnp.where(mask, idx, 0)
    cols = jnp.take(A, safe, axis=1) * mask[None, :].astype(dtype)
    G = cols.T @ cols
    G = jnp.where(mask[:, None] & mask[None, :], G, jnp.eye(kmax, dtype=dtype))
    eye = jnp.eye(kmax, dtype=dtype)
    return ActiveSet(
        idx=jnp.where(mask, idx, A.shape[1]).astype(jnp.int32),
        mask=mask,
        k=jnp.sum(mask).astype(jnp.int32),
        cols=cols,
        G=G,
        Atb=cols.T @ b,
        chol=eye,
        coef=jnp.zeros((kmax,), dtype),
    )


def refit(st: ActiveSet) -> ActiveSet:
    """Re-factorize the padded Gram and solve the active LS problem.

    Equivalent of the reference's `ldiv!!(x.nzval, AiQR, b, r)`
    (/root/reference/src/matchingpursuit.jl:170-176) via normal equations.
    """
    L = jnp.linalg.cholesky(st.G)
    coef = cho_solve((L, True), jnp.where(st.mask, st.Atb, 0))
    coef = jnp.where(st.mask, coef, 0)
    return st._replace(chol=L, coef=coef)


def residual(st: ActiveSet, b) -> jax.Array:
    """r = b - A_active @ coef, using the cached active columns."""
    return b - st.cols @ st.coef


def gamma(st: ActiveSet) -> jax.Array:
    """diag(G^-1) over active slots (junk elsewhere; callers mask).

    The backward-regression leverage quantity, parity with `get_gamma`
    (/root/reference/src/backward.jl:69-74): G^-1 = L^-T L^-1 so
    diag(G^-1)_i = sum_r (L^-1)_{ri}^2.
    """
    kmax = st.chol.shape[0]
    Linv = solve_triangular(st.chol, jnp.eye(kmax, dtype=st.chol.dtype),
                            lower=True)
    return jnp.sum(Linv * Linv, axis=0)


def ols_rescaling(A, st: ActiveSet, colnorm2) -> jax.Array:
    """Squared energetic norms ||a_j||^2 - ||proj_active a_j||^2 for all j.

    Forward-regression selection denominator, parity with `ols_rescaling!`
    (/root/reference/src/forward.jl:100-114) — but computed from the Gram
    Cholesky as colnorm^2 - ||L^-1 (Ai' a_j)||^2, which is a (k x m) GEMM +
    triangular solve instead of the reference's (n x n)(n x m) GEMM.
    """
    W = st.cols.T @ A                      # rows are zero at inactive slots
    U = solve_triangular(st.chol, W, lower=True)
    return colnorm2 - jnp.sum(U * U, axis=0)


def active_marker(st: ActiveSet, m: int) -> jax.Array:
    """Dense boolean (m,) marking active atom indices."""
    safe = jnp.where(st.mask, st.idx, m)
    z = jnp.zeros((m + 1,), bool).at[safe].set(st.mask)
    return z[:m]


def finalize(st: ActiveSet, m: int):
    """Sort the active set by atom index and return a SparseSolution
    (matching the reference's sorted `nzind` invariant)."""
    from cstpu.utils.sparse import SparseSolution

    key = jnp.where(st.mask, st.idx, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    return SparseSolution(
        idx=jnp.where(st.mask[order], st.idx[order], m).astype(jnp.int32),
        val=jnp.where(st.mask[order], st.coef[order], 0),
        mask=st.mask[order],
        m=int(m),
    )

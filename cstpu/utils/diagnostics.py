"""Structured per-iteration solver diagnostics.

The reference has no observability (stray debug printlns only,
/root/reference/src/backward.jl:170-171). Here every traced solve returns a
fixed-shape `SolveTrace` pytree — residual-norm history, selected atoms,
acceptance mask, per-step marginal decrease — that lives on device, costs
one extra carry in the solver loop, and vmaps/shards with the solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from cstpu.ops import active_set as aset
from cstpu.ops.select import abs_correlate, top1


class SolveTrace(NamedTuple):
    """Fixed-shape per-step history of a greedy solve (padded past the
    step where the solver stopped)."""
    residual_norm: jax.Array  # f[k] residual norm after each step
    selected: jax.Array       # i32[k] atom chosen at each step (-1 if none)
    accepted: jax.Array       # bool[k] whether the step changed the state
    score: jax.Array          # f[k] selection score (|<a,r>| for OMP)


class RMPSTrace(NamedTuple):
    """Per-OUTER-iteration history of the staged RMPS coordinate ascent
    (acquisition stage to exhaustion, then deletion/update —
    src/sbl.jl:381-406). Padded past convergence."""
    n_active: jax.Array   # i32[T] active atoms after the iteration
    n_added: jax.Array    # i32[T] acquisitions this iteration
    n_deleted: jax.Array  # i32[T] deletions this iteration
    n_updated: jax.Array  # i32[T] re-estimated (changed) alphas


class SBLTrace(NamedTuple):
    """Fixed-shape per-action history of a marginal-likelihood ascent
    (fsbl): the delta-likelihood of each greedy action — the reference's
    `delta` quantity (src/sbl.jl:209-223) — plus which atom and action."""
    likelihood_delta: jax.Array  # f[T] marginal-likelihood change
    selected: jax.Array          # i32[T] atom acted on (-1 if none)
    action: jax.Array            # i32[T] 0 add / 1 delete / 2 update / -1
    n_active: jax.Array          # i32[T] active-set size after the step


@partial(jax.jit, static_argnames=("k",))
def _omp_traced(A, b, k: int, eps):
    n, m = A.shape
    st0 = aset.empty(n, k, m, A.dtype)
    tr0 = SolveTrace(
        residual_norm=jnp.zeros((k,), A.dtype),
        selected=jnp.full((k,), -1, jnp.int32),
        accepted=jnp.zeros((k,), bool),
        score=jnp.zeros((k,), A.dtype),
    )

    def cond(carry):
        st, tr, t, done = carry
        return (t < k) & ~done

    def body(carry):
        st, tr, t, done = carry
        r = aset.residual(st, b)
        i, sc = top1(abs_correlate(A, r))
        present = aset.contains(st, i)
        full = st.k >= jnp.minimum(n, k)
        ok = ~present & ~full
        st2 = aset.refit(aset.append_gated(A, b, st, i, ok))
        # record what actually happened: append_gated's internal
        # degeneracy gate can reject a wanted atom (see forward_step),
        # and a stale accepted=True would both lie in the trace and keep
        # the loop re-selecting the same atom
        acc = ok & (st2.k > st.k)
        rn = jnp.linalg.norm(aset.residual(st2, b))
        tr = SolveTrace(
            residual_norm=tr.residual_norm.at[t].set(rn),
            selected=tr.selected.at[t].set(jnp.where(acc, i, -1)),
            accepted=tr.accepted.at[t].set(acc),
            score=tr.score.at[t].set(sc),
        )
        return st2, tr, t + 1, ~acc | (rn < eps)

    st, tr, _, _ = lax.while_loop(
        cond, body, (st0, tr0, jnp.int32(0), jnp.bool_(False)))
    return aset.finalize(st, m), tr


def omp_traced(A, b, k: int | None = None, max_residual: float = 0.0):
    """OMP returning (solution, SolveTrace) — cstpu.omp plus observability."""
    n, m = A.shape
    k = int(min(k if k is not None else n, n, m))
    return _omp_traced(A, b, k, jnp.asarray(max_residual, A.dtype))


@partial(jax.jit, static_argnames=("k",))
def _fr_traced(A, b, k: int, max_eps, min_delta):
    from cstpu.models.forward import forward_step

    n, m = A.shape
    colnorm2 = jnp.sum(A * A, axis=0)
    st0 = aset.refit(aset.empty(n, k, m, A.dtype))
    tr0 = SolveTrace(
        residual_norm=jnp.zeros((k,), A.dtype),
        selected=jnp.full((k,), -1, jnp.int32),
        accepted=jnp.zeros((k,), bool),
        score=jnp.zeros((k,), A.dtype),
    )

    def cond(carry):
        st, tr, t, stop = carry
        return (t < k) & ~stop

    def body(carry):
        st, tr, t, _ = carry
        st2, ok, d2 = forward_step(A, b, st, max_eps, min_delta,
                                   colnorm2, m)
        i, maxd2 = top1(d2)
        rn = jnp.linalg.norm(aset.residual(st2, b))
        tr = SolveTrace(
            residual_norm=tr.residual_norm.at[t].set(rn),
            selected=tr.selected.at[t].set(jnp.where(ok, i, -1)),
            accepted=tr.accepted.at[t].set(ok),
            score=tr.score.at[t].set(maxd2),
        )
        return st2, tr, t + 1, ~ok

    st, tr, _, _ = lax.while_loop(
        cond, body, (st0, tr0, jnp.int32(0), jnp.bool_(False)))
    return aset.finalize(st, m), tr


def fr_traced(A, b, sparsity: int | None = None, max_residual: float = 0.0,
              min_decrease: float = 0.0):
    """Forward regression returning (solution, SolveTrace): the `score`
    channel is the best squared residual decrease δ² per step — the OLS
    selection quantity of src/forward.jl:74-81. Same exhaustion-floor
    rule as cstpu.fr (models/forward.py): without an explicit sparsity
    the run must stop at the rounding floor, or the post-exact-fit junk
    additions corrupt the Gram inverse and the trace itself (observed:
    residual CLIMBING in the trace of a noiseless solve)."""
    from cstpu.models.forward import exhaustion_floor

    n, m = A.shape
    k = int(min(sparsity if sparsity is not None else n, n, m))
    max_eps = jnp.asarray(max_residual, A.dtype)
    if sparsity is None:
        max_eps = jnp.maximum(max_eps, exhaustion_floor(A, b))
    return _fr_traced(A, b, k, max_eps, jnp.asarray(min_decrease, A.dtype))

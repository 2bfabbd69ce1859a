"""Forward stepwise regression (a.k.a. OLS / OOMP / ORMP).

Capability parity with /root/reference/src/forward.jl: greedy selection of
the atom maximizing the decrease in squared residual norm,
delta_j^2 = <a_j, r>^2 / (||a_j||^2 - ||proj_active a_j||^2), with dual
stopping criteria (residual tolerance `max_residual`, minimum marginal
decrease `min_decrease`) and a sparsity cap.

TPU-first: the selection rule is one (k x m) GEMM + triangular solve per
step (see cstpu.ops.active_set.ols_rescaling) instead of the reference's
(n x n)(n x m) `Q'A` GEMM, and the whole solve is a single jitted
while_loop. `forward_step` is shared by SRR/RMP/FoBa exactly as
`forward_step!` is in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from cstpu.ops import active_set as aset
from cstpu.ops.select import top1
from cstpu.utils.sparse import SparseSolution


def forward_deltas(A, b, st, colnorm2, m: int):
    """delta^2 for every atom: squared-residual decrease if added.

    Parity: `forward_delta!` (/root/reference/src/forward.jl:74-81). Active
    atoms score 0; non-positive rescalings (atoms numerically inside the
    active span) score -inf so they are never selected.
    """
    r = aset.residual(st, b)
    q = r @ A  # == A'r without transposing the dictionary
    resc = aset.ols_rescaling(A, st, colnorm2)
    # dtype-realistic version of the reference's `rescaling > 0`: below
    # ~8n ulps of the column norm the energetic norm is numerical noise
    # (an f32 Gram cannot distinguish such an atom from the active span)
    rtol = 8.0 * A.shape[0] * jnp.finfo(A.dtype).eps
    d2 = jnp.where(resc > rtol * colnorm2, q * q / resc, -jnp.inf)
    act = aset.active_marker(st, m)
    return jnp.where(act, 0.0, d2), jnp.linalg.norm(r)


def forward_step(A, b, st, max_eps, min_delta, colnorm2, m: int):
    """One forward step; returns (state, accepted, deltas).

    Accepts the best atom iff nnz < n, capacity remains, the residual norm
    still exceeds `max_eps`, and the best squared decrease beats
    `min_delta^2`. Parity: `forward_step!`
    (/root/reference/src/forward.jl:56-72).
    """
    n = A.shape[0]
    kmax = st.idx.shape[0]
    d2, normr = forward_deltas(A, b, st, colnorm2, m)
    i, maxd2 = top1(d2)
    want = ((st.k < n) & (st.k < kmax) & (normr > max_eps)
            & (min_delta * min_delta < maxd2))
    st2 = aset.refit(aset.append_gated(A, b, st, i, want))
    # report what actually happened: append_gated's internal degeneracy
    # gate (d > 1e-12 * ||a||^2) is slightly stricter than the forward
    # rescaling's 8n-ulp rule in f64, so a wanted atom can still be
    # rejected — a stale accepted=True would spin the caller's loop on
    # the same atom and feed FoBa a phantom forward decrease
    accepted = want & (st2.k > st.k)
    return st2, accepted, d2


@partial(jax.jit, static_argnames=("k",))
def _fr(A, b, k: int, max_eps, min_delta):
    n, m = A.shape
    colnorm2 = jnp.sum(A * A, axis=0)
    st0 = aset.refit(aset.empty(n, k, m, A.dtype))

    def cond(carry):
        st, t, stop = carry
        return (t < k) & ~stop

    def body(carry):
        st, t, _ = carry
        st2, accepted, _ = forward_step(A, b, st, max_eps, min_delta,
                                        colnorm2, m)
        return st2, t + 1, ~accepted

    st, _, _ = lax.while_loop(cond, body, (st0, jnp.int32(0), jnp.bool_(False)))
    return aset.finalize(st, m)


def fr(A, b, max_residual: float = 0.0, min_decrease: float = 0.0,
       sparsity: int | None = None) -> SparseSolution:
    """Forward (stepwise) regression. Parity: src/forward.jl:33-51.

    Stops at whichever hits first: `sparsity` atoms, residual norm below
    `max_residual`, or best marginal decrease below `min_decrease`.
    """
    n, m = A.shape
    k = int(min(sparsity if sparsity is not None else m, n, m))
    return _fr(A, b, k, jnp.asarray(max_residual, A.dtype),
               jnp.asarray(min_decrease, A.dtype))


# reference aliases (src/forward.jl:13-18, :52-54)
ols = fr
oomp = fr
ormp = fr


def fr_warm(A, b, nzind) -> SparseSolution:
    """Restricted LS fit on a given support — the warm-start constructor
    `FR(A, b, nzind)` of the reference (src/forward.jl:20-31), exposed for
    parity tests and for seeding SRR/RMP."""
    nz = jnp.asarray(nzind, jnp.int32)
    st = aset.refit(aset.rebuild(A, b, nz, jnp.ones(nz.shape, bool)))
    return aset.finalize(st, A.shape[1])

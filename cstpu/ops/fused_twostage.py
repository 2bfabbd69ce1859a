"""Whole-solve fused two-stage pursuit kernels (Pallas TPU).

Subspace Pursuit needs what the greedy kernels in cstpu.ops.fused_solve do
not: support DELETION. With the inverse-Gram representation a deletion is a
rank-one Schur downdate — with q = Ginv e_p and qpp = q_p,

    Ginv'  =  Ginv - q q' / qpp   (+ e_p e_p' to restore the identity pad)

zeroes row/column p exactly and leaves the inverse of the remaining active
Gram, all in (B, 2k, 2k)-shaped broadcasts: no solves, no data-dependent
shapes. Appends go to the first free slot (a per-instance one-hot), so the
support can develop holes and refill them.

The SP iteration (parity /root/reference/src/twostage.jl:42-107) then runs
entirely in VMEM with the dictionary pinned:

  acquisition   top-k of |A'r| by iteratively-masked argmax, appended
                sequentially with the bordered block-inverse update
                (sp_acquisition!, src/twostage.jl:67-72)
  refit         coef = Ginv Atb (one broadcast-reduce)
  prune         keep the k largest |coef|; the dropped slots are removed by
                sequential rank-one downdates (Ginv only — cheap), then one
                bulk masked pass zeroes their columns (src/twostage.jl:75-83)
  stop          residual <= delta, or no improvement over the previous
                iteration; the final pruned iterate is kept either way
                (src/twostage.jl:92-99). Converged instances no-op through
                the remaining trips (per-instance done latch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cstpu.ops.fused_solve import _degeneracy_rtol

INT_MAX = jnp.iinfo(jnp.int32).max


def _sp_kernel(k: int, maxiter: int, delta2: float,
               A_ref, Bs_ref, idx_ref, coef_ref, r_ref,
               cols, Ginv, Atbs, coefs, idxs, r):
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    K2 = 2 * k
    f32 = jnp.float32
    cdt = A_ref.dtype
    deg = _degeneracy_rtol(n)

    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, K2, K2), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, K2, K2), 2)
    Ginv[:, :, :] = (ii == jj).astype(f32)
    Atbs[:, :] = jnp.zeros_like(Atbs)
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, K2), 1)
    BIG = jnp.int32(K2 + 1)

    def append(i, gate):
        """Append atom i (B,1) at each instance's first free slot."""
        oh = (col_iota == i).astype(cdt)
        acol = lax.dot_general(oh, A_ref[:, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)      # (B, n)
        free = jnp.where(idxs[:, :] >= m, slot_iota, BIG)
        fs = jnp.min(free, axis=1, keepdims=True)               # (B, 1)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)   # (B, K2)
        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        ok = gate & (~dup) & (fs < BIG) & (d > deg * ata)
        okf = ok.astype(f32)
        et = (slot_iota == fs).astype(f32) * okf                # (B, K2)
        dinv = okf / jnp.where(d > 0, d, 1.0)

        w = u - et
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - et[:, :, None] * et[:, None, :] * okf[:, :, None]
        Atbs[:, :] = Atbs[:, :] + beta * et
        idxs[:, :] = jnp.where(et > 0, jnp.broadcast_to(i, (B, K2)),
                               idxs[:, :])
        cols[:, :, :] = cols[:, :, :] + acol[:, None, :] * et[:, :, None]

    def topk_append(sc, gate):
        def one(_, sc):
            smax = jnp.max(sc, axis=1, keepdims=True)
            i = jnp.min(jnp.where(sc == smax, col_iota, INT_MAX),
                        axis=1, keepdims=True)
            sc = jnp.where(col_iota == i, -jnp.inf, sc)
            append(i, smax > -jnp.inf if gate is None else gate)
            return sc

        lax.fori_loop(0, k, one, sc)

    def refit_residual():
        coefs[:, :] = jnp.sum(Ginv[:, :, :] * Atbs[:, :][:, None, :],
                              axis=2)
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted

    # --- init: oblivious acquisition (src/twostage.jl + :190) ------------
    sc0 = jnp.abs(lax.dot_general(Bs_ref[:, :].astype(cdt), A_ref[:, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32))
    topk_append(sc0, None)
    refit_residual()
    prev0 = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)

    def body(carry):
        t, prev, done = carry
        gate = done < 0.5

        sc = jnp.abs(lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32))
        topk_append(sc, gate)
        refit_residual()

        # --- prune to the k largest |coef| among active slots ------------
        def pick(_, carry):
            cscore, keep = carry
            cmax = jnp.max(cscore, axis=1, keepdims=True)
            p = jnp.min(jnp.where(cscore == cmax, slot_iota, BIG),
                        axis=1, keepdims=True)
            sel = (slot_iota == p) & (cmax > -jnp.inf)
            return jnp.where(sel, -jnp.inf, cscore), keep + sel.astype(f32)

        cscore = jnp.where(idxs[:, :] < m, jnp.abs(coefs[:, :]), -jnp.inf)
        _, keep = lax.fori_loop(0, k, pick,
                                (cscore, jnp.zeros((B, K2), f32)))
        drop0 = ((idxs[:, :] < m) & (keep < 0.5) & gate).astype(f32)

        def drop_one(_, drop):  # at most k slots get dropped
            ds = jnp.min(jnp.where(drop > 0.5, slot_iota, BIG), axis=1,
                         keepdims=True)                          # (B, 1)
            has = (ds < BIG).astype(f32)
            ep = (slot_iota == ds).astype(f32) * has             # (B, K2)
            qv = jnp.sum(Ginv[:, :, :] * ep[:, None, :], axis=2)  # column p
            qpp = jnp.sum(qv * ep, axis=1, keepdims=True)
            inv = has / jnp.where(qpp > 0, qpp, 1.0)
            Ginv[:, :, :] = Ginv[:, :, :] \
                - inv[:, :, None] * qv[:, :, None] * qv[:, None, :] \
                + ep[:, :, None] * ep[:, None, :]
            idxs[:, :] = jnp.where(ep > 0, m, idxs[:, :])
            Atbs[:, :] = Atbs[:, :] * (1.0 - ep)
            return drop * (1.0 - ep)

        lax.fori_loop(0, k, drop_one, drop0)

        act = (idxs[:, :] < m).astype(f32)
        cols[:, :, :] = cols[:, :, :] * act[:, :, None]
        refit_residual()

        res = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)
        res = jnp.where(gate, res, prev)
        done2 = jnp.where((res <= delta2) | (prev <= res), 1.0, done)
        return t + 1, res, done2

    def cond(carry):  # early exit once every instance has converged
        t, prev, done = carry
        return (t < maxiter) & (jnp.min(done) < 0.5)

    lax.while_loop(cond, body,
                   (jnp.int32(0), prev0, jnp.zeros((B, 1), f32)))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


# ---------------------------------------------------------------------------
# OMP with Replacement (OMPR), whole-solve fused
# ---------------------------------------------------------------------------

def _ompr_kernel(k: int, maxiter: int, delta2: float, eta: float,
                 A_ref, Bs_ref, idx_ref, coef_ref, r_ref,
                 cols, Ginv, Atbs, coefs, idxs, r, amask):
    """OMPR (parity /root/reference/src/twostage.jl:110-202), fused.

    Per iteration: select the best PASSIVE atom by |eta A'r| (for passive
    atoms the reference's gradient score x + eta A'r reduces to eta A'r —
    no dense scatter needed), append it, gradient-step every active
    coefficient (coef += eta a_s'r, a lane reduction over the cached
    columns — no gathers), delete the min-|coefficient| slot by Schur
    downdate, LS-refit. Stops on no-passive-atom, residual <= delta, or
    no improvement (per-instance done latch; in-kernel while exits when
    the whole batch is done).
    """
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    K = k + 1
    f32 = jnp.float32
    cdt = A_ref.dtype
    deg = _degeneracy_rtol(n)

    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, K, K), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, K, K), 2)
    eye = (ii == jj).astype(f32)
    Ginv[:, :, :] = eye
    Atbs[:, :] = jnp.zeros_like(Atbs)
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)
    amask[:, :] = jnp.zeros_like(amask)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    BIG = jnp.int32(K + 1)

    def append(i, gate):
        oh = (col_iota == i).astype(cdt)
        acol = lax.dot_general(oh, A_ref[:, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
        fs = jnp.min(jnp.where(idxs[:, :] >= m, slot_iota, BIG), axis=1,
                     keepdims=True)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)
        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        ok = gate & (~dup) & (fs < BIG) & (d > deg * ata)
        okf = ok.astype(f32)
        et = (slot_iota == fs).astype(f32) * okf
        dinv = okf / jnp.where(d > 0, d, 1.0)
        s = dinv * (beta - jnp.sum(g * coefs[:, :], axis=1, keepdims=True))

        w = u - et
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - et[:, :, None] * et[:, None, :] * okf[:, :, None]
        Atbs[:, :] = Atbs[:, :] + beta * et
        idxs[:, :] = jnp.where(et > 0, jnp.broadcast_to(i, (B, K)),
                               idxs[:, :])
        cols[:, :, :] = cols[:, :, :] + acol[:, None, :] * et[:, :, None]
        amask[:, :] = amask[:, :] + oh.astype(f32) * okf
        return ok

    def refit_residual():
        coefs[:, :] = jnp.sum(Ginv[:, :, :] * Atbs[:, :][:, None, :],
                              axis=2)
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted

    # --- init: oblivious top-k ------------------------------------------
    sc0 = jnp.abs(lax.dot_general(Bs_ref[:, :].astype(cdt), A_ref[:, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32))

    def init_one(_, sc):
        smax = jnp.max(sc, axis=1, keepdims=True)
        i = jnp.min(jnp.where(sc == smax, col_iota, INT_MAX),
                    axis=1, keepdims=True)
        sc = jnp.where(col_iota == i, -jnp.inf, sc)
        append(i, smax > -jnp.inf)
        return sc

    lax.fori_loop(0, k, init_one, sc0)
    refit_residual()
    prev0 = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)

    def body(carry):
        t, prev, done = carry
        gate = done < 0.5

        q = lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)          # (B, m)
        sc = jnp.where(amask[:, :] > 0, -jnp.inf, jnp.abs(eta * q))
        best = jnp.max(sc, axis=1, keepdims=True)
        i = jnp.min(jnp.where(sc == best, col_iota, INT_MAX),
                    axis=1, keepdims=True)
        change = best > 0                       # twostage.jl:153 bail-out
        ok = append(i, gate & change)
        okf = ok.astype(f32)

        # gradient step on all active slots: coef += eta * (a_s' r)
        act = (idxs[:, :] < m).astype(f32)
        gr = jnp.sum(cols[:, :, :] * r[:, :][:, None, :], axis=2)
        gcoef = jnp.where(ok, (coefs[:, :] + eta * gr) * act, coefs[:, :])

        # delete the min-|gradient-coefficient| slot (Schur downdate)
        d2 = jnp.where((idxs[:, :] < m) & (okf > 0), jnp.abs(gcoef),
                       jnp.inf)
        dmin = jnp.min(d2, axis=1, keepdims=True)
        p = jnp.min(jnp.where(d2 == dmin, slot_iota, BIG), axis=1,
                    keepdims=True)
        hasf = (ok & (dmin < jnp.inf)).astype(f32)
        ep = (slot_iota == p).astype(f32) * hasf
        wcol = jnp.sum(Ginv[:, :, :] * ep[:, None, :], axis=2)
        gpp = jnp.sum(wcol * ep, axis=1, keepdims=True)
        inv = hasf / jnp.where(gpp > 0, gpp, 1.0)
        di = jnp.sum(idxs[:, :] * (ep > 0).astype(jnp.int32), axis=1,
                     keepdims=True)
        amask[:, :] = jnp.maximum(
            amask[:, :] - (col_iota == di).astype(f32) * hasf, 0.0)
        Ginv[:, :, :] = Ginv[:, :, :] \
            - inv[:, :, None] * wcol[:, :, None] * wcol[:, None, :] \
            + ep[:, :, None] * ep[:, None, :]
        idxs[:, :] = jnp.where(ep > 0, m, idxs[:, :])
        Atbs[:, :] = Atbs[:, :] * (1.0 - ep)
        cols[:, :, :] = cols[:, :, :] * (1.0 - ep)[:, :, None]
        refit_residual()

        res = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)
        res = jnp.where(gate & ok, res, prev)
        done2 = jnp.where((~change) | (res <= delta2) | (prev <= res),
                          1.0, done)
        return t + 1, res, done2

    def cond(carry):
        t, prev, done = carry
        return (t < maxiter) & (jnp.min(done) < 0.5)

    lax.while_loop(cond, body,
                   (jnp.int32(0), prev0, jnp.zeros((B, 1), f32)))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("k", "maxiter", "delta2", "eta",
                                   "corr_dtype", "interpret"))
def _ompr_fused_call(A, Bs, k: int, maxiter: int, delta2: float, eta: float,
                     corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)
    K = k + 1

    idx, coef, r = pl.pallas_call(
        partial(_ompr_kernel, k, maxiter, delta2, eta),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), f32),
            jax.ShapeDtypeStruct((B, n), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, n), f32),
            pltpu.VMEM((B, K, K), f32),
            pltpu.VMEM((B, K), f32),
            pltpu.VMEM((B, K), f32),
            pltpu.VMEM((B, K), jnp.int32),
            pltpu.VMEM((B, n), f32),
            pltpu.VMEM((B, m), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Bs)
    return idx, coef, r


def ompr_fused_solve(A, Bs, k: int, delta: float, eta: float = 1.0,
                     maxiter: int | None = None, corr_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Batched OMPR via the whole-solve fused kernel.

    Parity: src/twostage.jl:110-202. Returns (SparseSolution, residuals).
    """
    from cstpu.utils.sparse import SparseSolution

    n, m = A.shape
    k = int(k)
    maxiter = int(maxiter if maxiter is not None else n)
    idx, coef, r = _ompr_fused_call(jnp.asarray(A), jnp.asarray(Bs), k,
                                    maxiter, float(delta) ** 2, float(eta),
                                    corr_dtype, interpret)
    mask = idx < m
    key = jnp.where(mask, idx, INT_MAX)
    order = jnp.argsort(key, axis=1)
    take = jnp.take_along_axis
    sol = SparseSolution(
        idx=jnp.where(take(mask, order, 1), take(idx, order, 1), m),
        val=jnp.where(take(mask, order, 1), take(coef, order, 1), 0.0),
        mask=take(mask, order, 1),
        m=int(m),
    )
    return sol, r


def supported_ompr(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused OMPR kernel ((k+1)-slot state + (B,m))."""
    n, m = A.shape
    B = Bs.shape[0]
    K = int(k) + 1
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (n * m * itemsize + B * K * n * 4
            + 2 * B * n * 4 + B * m * 4 * 3 + B * K * K * 4)
    return vmem < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Stepwise Regression with Replacement (SRR), whole-solve fused
# ---------------------------------------------------------------------------

def _srr_kernel(k: int, l: int, maxiter: int, delta2: float,
                A_ref, Bs_ref, cn2_ref, idx_ref, coef_ref, r_ref,
                cols, Ginv, Atbs, coefs, idxs, r, resc, amask):
    """SRR (parity /root/reference/src/twostage.jl:3-33), fused whole-solve.

    Oblivious k-atom init, then alternate: up to l forward-regression steps
    (OLS rule, order-recursive rescaling — see _fr_kernel) and backward
    deletions back to k atoms (min coef^2/gamma with gamma = diag(Ginv),
    parity src/backward.jl:69-83). Deletion updates the rescaling with the
    dual identity: removing atom p frees the direction v = A_S Ginv e_p
    (the only span(S) vector orthogonal to S\\{p}), so
    rescaling_j += (v'a_j)^2 / gamma_pp — one MXU GEMM, symmetric to the
    append update. Outer while exits when every instance's residual stops
    improving (the final iterate is kept, as in src/twostage.jl:19-31).
    """
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    K = k + l
    f32 = jnp.float32
    cdt = A_ref.dtype
    deg = _degeneracy_rtol(n)

    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, K, K), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, K, K), 2)
    eye = (ii == jj).astype(f32)
    Ginv[:, :, :] = eye
    Atbs[:, :] = jnp.zeros_like(Atbs)
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)
    resc[:, :] = jnp.broadcast_to(cn2_ref[0:1, :], (B, m))
    amask[:, :] = jnp.zeros_like(amask)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    BIG = jnp.int32(K + 1)
    NEG = jnp.float32(-jnp.inf)

    def append(i, gate):
        """FR-engine append of atom i (B,1) at the first free slot, with
        order-recursive rescaling/active-mask maintenance."""
        oh = (col_iota == i).astype(cdt)
        acol = lax.dot_general(oh, A_ref[:, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
        fs = jnp.min(jnp.where(idxs[:, :] >= m, slot_iota, BIG), axis=1,
                     keepdims=True)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)
        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        ok = gate & (~dup) & (fs < BIG) & (d > deg * ata)
        okf = ok.astype(f32)
        et = (slot_iota == fs).astype(f32) * okf
        dinv = okf / jnp.where(d > 0, d, 1.0)
        s = dinv * (beta - jnp.sum(g * coefs[:, :], axis=1, keepdims=True))

        w = u - et
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - et[:, :, None] * et[:, None, :] * okf[:, :, None]
        Atbs[:, :] = Atbs[:, :] + beta * et
        idxs[:, :] = jnp.where(et > 0, jnp.broadcast_to(i, (B, K)),
                               idxs[:, :])
        cols[:, :, :] = cols[:, :, :] + acol[:, None, :] * et[:, :, None]

        aperp = acol - jnp.sum(cols[:, :, :] * u[:, :, None], axis=1)
        z = lax.dot_general(aperp.astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        resc[:, :] = resc[:, :] - dinv * z * z
        amask[:, :] = amask[:, :] + oh.astype(f32) * okf
        return ok

    def refit_residual():
        coefs[:, :] = jnp.sum(Ginv[:, :, :] * Atbs[:, :][:, None, :],
                              axis=2)
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted

    def forward_step(gate):
        """One OLS-rule forward step; returns per-instance accept."""
        q = lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        rmin = deg * cn2_ref[0:1, :]
        d2 = jnp.where(resc[:, :] > rmin, q * q / resc[:, :], NEG)
        d2 = jnp.where(amask[:, :] > 0, 0.0, d2)
        dmax = jnp.max(d2, axis=1, keepdims=True)
        i = jnp.min(jnp.where(d2 == dmax, col_iota, INT_MAX),
                    axis=1, keepdims=True)
        rnorm2 = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)
        ok = append(i, gate & (rnorm2 > 0) & (dmax > 0))
        refit_residual()
        return ok

    def backward_step(gate):
        """Delete the min coef^2/gamma active slot (when gated)."""
        diag = jnp.sum(Ginv[:, :, :] * eye, axis=2)              # (B, K)
        act = idxs[:, :] < m
        d2 = jnp.where(act, coefs[:, :] * coefs[:, :]
                       / jnp.maximum(diag, 1e-30), jnp.inf)
        dmin = jnp.min(d2, axis=1, keepdims=True)
        p = jnp.min(jnp.where(d2 == dmin, slot_iota, BIG), axis=1,
                    keepdims=True)
        has = gate & (dmin < jnp.inf)
        hasf = has.astype(f32)
        ep = (slot_iota == p).astype(f32) * hasf                  # (B, K)

        wcol = jnp.sum(Ginv[:, :, :] * ep[:, None, :], axis=2)   # Ginv e_p
        gpp = jnp.sum(wcol * ep, axis=1, keepdims=True)
        inv = hasf / jnp.where(gpp > 0, gpp, 1.0)

        # dual rescaling update before the state changes
        v = jnp.sum(cols[:, :, :] * wcol[:, :, None], axis=1)    # (B, n)
        z = lax.dot_general(v.astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        resc[:, :] = resc[:, :] + inv * z * z
        di = jnp.sum(idxs[:, :] * (ep > 0).astype(jnp.int32), axis=1,
                     keepdims=True)                              # (B, 1)
        amask[:, :] = jnp.maximum(
            amask[:, :] - (col_iota == di).astype(f32) * hasf, 0.0)

        Ginv[:, :, :] = Ginv[:, :, :] \
            - inv[:, :, None] * wcol[:, :, None] * wcol[:, None, :] \
            + ep[:, :, None] * ep[:, None, :]
        idxs[:, :] = jnp.where(ep > 0, m, idxs[:, :])
        Atbs[:, :] = Atbs[:, :] * (1.0 - ep)
        cols[:, :, :] = cols[:, :, :] * (1.0 - ep)[:, :, None]
        refit_residual()

    # --- init: oblivious top-k (src/twostage.jl via :8-17 init mode 1) ---
    sc0 = jnp.abs(lax.dot_general(Bs_ref[:, :].astype(cdt), A_ref[:, :],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32))

    def init_one(_, sc):
        smax = jnp.max(sc, axis=1, keepdims=True)
        i = jnp.min(jnp.where(sc == smax, col_iota, INT_MAX),
                    axis=1, keepdims=True)
        sc = jnp.where(col_iota == i, -jnp.inf, sc)
        append(i, smax > -jnp.inf)
        return sc

    lax.fori_loop(0, k, init_one, sc0)
    refit_residual()
    prev0 = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)

    def body(carry):
        t, prev, done = carry
        gate = done < 0.5

        def fwd(_, fgate):
            ok = forward_step(fgate > 0.5)
            return fgate * ok.astype(f32)

        lax.fori_loop(0, l, fwd, gate.astype(f32))

        def bwd(_, __):
            over = jnp.sum((idxs[:, :] < m).astype(f32), axis=1,
                           keepdims=True) > float(k)
            backward_step(gate & over)
            return 0

        lax.fori_loop(0, l, bwd, 0)

        res = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)
        res = jnp.where(gate, res, prev)
        done2 = jnp.where((res <= delta2) | (prev <= res), 1.0, done)
        return t + 1, res, done2

    def cond(carry):
        t, prev, done = carry
        return (t < maxiter) & (jnp.min(done) < 0.5)

    lax.while_loop(cond, body,
                   (jnp.int32(0), prev0, jnp.zeros((B, 1), f32)))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("k", "l", "maxiter", "delta2",
                                   "corr_dtype", "interpret"))
def _srr_fused_call(A, Bs, k: int, l: int, maxiter: int, delta2: float,
                    corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)
    cn2 = jnp.sum(A.astype(f32) * A.astype(f32), axis=0)[None, :]
    K = k + l

    idx, coef, r = pl.pallas_call(
        partial(_srr_kernel, k, l, maxiter, delta2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), f32),
            jax.ShapeDtypeStruct((B, n), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, n), f32),        # cols
            pltpu.VMEM((B, K, K), f32),        # Ginv
            pltpu.VMEM((B, K), f32),           # Atb
            pltpu.VMEM((B, K), f32),           # coef
            pltpu.VMEM((B, K), jnp.int32),     # idx
            pltpu.VMEM((B, n), f32),           # r
            pltpu.VMEM((B, m), f32),           # rescaling
            pltpu.VMEM((B, m), f32),           # active mask
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Bs, cn2)
    return idx, coef, r


def srr_fused_solve(A, Bs, k: int, delta: float = 1e-12,
                    maxiter: int | None = None, l: int = 1,
                    corr_dtype=jnp.bfloat16, interpret: bool = False):
    """Batched SRR via the whole-solve fused kernel (oblivious init).

    Parity: src/twostage.jl:3-33 with initialization=1; other init modes
    take the XLA path. Returns (SparseSolution, residuals).
    """
    from cstpu.utils.sparse import SparseSolution

    n, m = A.shape
    k = int(k)
    l = int(l)
    maxiter = int(maxiter if maxiter is not None else 4 * k)
    idx, coef, r = _srr_fused_call(jnp.asarray(A), jnp.asarray(Bs), k, l,
                                   maxiter, float(delta) ** 2, corr_dtype,
                                   interpret)
    mask = idx < m
    key = jnp.where(mask, idx, INT_MAX)
    order = jnp.argsort(key, axis=1)
    take = jnp.take_along_axis
    sol = SparseSolution(
        idx=jnp.where(take(mask, order, 1), take(idx, order, 1), m),
        val=jnp.where(take(mask, order, 1), take(coef, order, 1), 0.0),
        mask=take(mask, order, 1),
        m=int(m),
    )
    return sol, r


def supported_srr(A, Bs, k: int, l: int = 1,
                  corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused SRR kernel ((k+l)-slot state + 2 (B,m))."""
    n, m = A.shape
    B = Bs.shape[0]
    K = int(k) + int(l)
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (n * m * itemsize + B * K * n * 4
            + 2 * B * n * 4 + B * m * 4 * 4 + B * K * K * 4)
    return vmem < 100 * 1024 * 1024


@partial(jax.jit, static_argnames=("k", "maxiter", "delta2", "corr_dtype",
                                   "interpret"))
def _sp_fused_call(A, Bs, k: int, maxiter: int, delta2: float, corr_dtype,
                   interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)
    K2 = 2 * k

    idx, coef, r = pl.pallas_call(
        partial(_sp_kernel, k, maxiter, delta2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((B, K2), jnp.int32),
            jax.ShapeDtypeStruct((B, K2), f32),
            jax.ShapeDtypeStruct((B, n), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K2, n), f32),       # cols
            pltpu.VMEM((B, K2, K2), f32),      # Ginv
            pltpu.VMEM((B, K2), f32),          # Atb
            pltpu.VMEM((B, K2), f32),          # coef
            pltpu.VMEM((B, K2), jnp.int32),    # idx
            pltpu.VMEM((B, n), f32),           # r
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Bs)
    return idx, coef, r


def sp_fused_solve(A, Bs, k: int, delta: float = 1e-12,
                   maxiter: int | None = None, corr_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """Batched subspace pursuit via the whole-solve fused kernel.

    Parity: src/twostage.jl:42-107, including the 16k maxiter default —
    the in-kernel while loop exits as soon as every instance in the batch
    has converged, so the bound costs nothing. Returns
    (SparseSolution, residuals).
    """
    from cstpu.utils.sparse import SparseSolution

    n, m = A.shape
    k = int(k)
    if 2 * k > n:
        raise ValueError(f"2k = {2*k} > {n} = len(b) is invalid for SP")
    maxiter = int(maxiter if maxiter is not None else 16 * k)
    idx, coef, r = _sp_fused_call(jnp.asarray(A), jnp.asarray(Bs), k,
                                  maxiter, float(delta) ** 2, corr_dtype,
                                  interpret)
    mask = idx < m
    key = jnp.where(mask, idx, INT_MAX)
    order = jnp.argsort(key, axis=1)
    take = jnp.take_along_axis
    sol = SparseSolution(
        idx=jnp.where(take(mask, order, 1), take(idx, order, 1), m),
        val=jnp.where(take(mask, order, 1), take(coef, order, 1), 0.0),
        mask=take(mask, order, 1),
        m=int(m),
    )
    return sol, r


def supported_sp(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused SP kernel (2k-slot state)."""
    n, m = A.shape
    B = Bs.shape[0]
    K2 = 2 * int(k)
    if n % 8 or m % 128 or B % 8 or K2 > n:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (n * m * itemsize + B * K2 * n * 4
            + 2 * B * n * 4 + B * m * 4 * 2 + B * K2 * K2 * 4)
    return vmem < 100 * 1024 * 1024

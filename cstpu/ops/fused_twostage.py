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

"""Fused batched-OMP step kernel (Pallas TPU).

Profiling the XLA-composed OMP loop on v5e shows the correlation GEMM at
~24 us/step but the trailing small ops (column gather, duplicate check,
rank-one inverse-Gram update, refit matvec, residual matvec) costing
~65 us/step — a dozen tiny kernels' worth of launch overhead, not compute.
This kernel fuses the ENTIRE post-argmax state update into one launch with
a grid over the problem batch:

  per instance: DMA the selected dictionary column from HBM, scalar-check
  duplicates/capacity in SMEM, apply the bordered block-inverse update to
  Ginv, refresh Atb/idx/count, recompute the LS coefficients (one k x k
  matvec) and the residual (one n x k matvec) — all in VMEM.

The XLA loop body becomes: GEMM + argmax + this kernel. Rejected steps
(duplicate atom / capacity) are exact no-ops via predication.

State layout (batched, fixed kmax), invariants as in cstpu.ops.active_set:
inactive slots hold zero columns / zero Atb / identity rows of Ginv, so no
masking is needed inside the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _step_kernel(At_ref, b_ref, sel_ref, r_ref, cols_ref, Ginv_ref, Atb_ref,
                 idx_ref, kcnt_ref,
                 r_out, cols_out, Ginv_out, Atb_out, coef_out, idx_out,
                 kcnt_out, acol, sem):
    kmax = idx_ref.shape[1]
    i = sel_ref[0, 0]
    kc = kcnt_ref[0, 0]

    # fetch the selected column (a contiguous row of A', DMA HBM -> VMEM)
    dma = pltpu.make_async_copy(At_ref.at[pl.ds(i, 1), :], acol, sem)
    dma.start()

    # duplicate / capacity check on SMEM scalars while the DMA flies
    present = jnp.bool_(False)
    for j in range(kmax):
        present = present | ((j < kc) & (idx_ref[0, j] == i))
    ok = (~present) & (kc < kmax)
    p = kc

    # unconditional pass-through (rejected steps are exact no-ops)
    cols_out[0] = cols_ref[0]
    Ginv_out[0] = Ginv_ref[0]
    Atb_out[0] = Atb_ref[0]
    for j in range(kmax):
        idx_out[0, j] = idx_ref[0, j]
    kcnt_out[0, 0] = kc + ok.astype(jnp.int32)

    dma.wait()

    @pl.when(ok)
    def _():
        a = acol[:, :]  # (1, n)
        # cross-Gram with the active set: (1, n) @ (n, kmax) on the MXU
        g = lax.dot_general(a, cols_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (1, kmax)
        u = lax.dot_general(g, Ginv_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (1, kmax)
        ata = jnp.sum(a * a)
        d = ata - jnp.sum(g * u)
        d = jnp.maximum(d, 1e-12 * jnp.maximum(ata, 1e-30))
        dinv = 1.0 / d
        # bordered block-inverse update
        Ginv_new = Ginv_ref[0] + dinv * (u.T @ u)
        Ginv_out[0] = Ginv_new
        Ginv_out[0, pl.ds(p, 1), :] = -dinv * u
        Ginv_out[0, :, pl.ds(p, 1)] = (-dinv * u).T
        Ginv_out[0, pl.ds(p, 1), pl.ds(p, 1)] = jnp.full((1, 1), dinv,
                                                         jnp.float32)
        cols_out[0, :, pl.ds(p, 1)] = a.T
        Atb_out[0, pl.ds(p, 1)] = jnp.sum(a[0] * b_ref[0])[None]
        idx_out[0, p] = i

    # LS refit + residual from the updated state (pass-through state when
    # the step was rejected — recomputing is idempotent)
    coef = lax.dot_general(Atb_out[0][None, :], Ginv_out[0],
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # (1, kmax)
    coef_out[0] = coef[0]
    fitted = lax.dot_general(cols_out[0], coef.T,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (n, 1)
    r_out[0] = b_ref[0] - fitted[:, 0]


@partial(jax.jit, static_argnames=("interpret",))
def omp_step_update(At, Bs, sel, r, cols, Ginv, Atb, idx, kcnt,
                    interpret: bool = False):
    """Apply one fused OMP update for every instance in the batch.

    At: (m, n) transposed dictionary (contiguous column fetches).
    Bs/r: (B, n); cols: (B, n, kmax); Ginv: (B, kmax, kmax);
    Atb: (B, kmax); idx: (B, kmax) i32; kcnt: (B, 1) i32; sel: (B, 1) i32.
    Returns (r, cols, Ginv, Atb, coef, idx, kcnt) updated.
    """
    B, n = Bs.shape
    kmax = Atb.shape[1]
    f32 = jnp.float32
    grid = (B,)

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def sspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.SMEM)

    b2 = lambda b: (b, 0)
    b3 = lambda b: (b, 0, 0)

    outs = pl.pallas_call(
        _step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # At (HBM)
            vspec((1, n), b2),                          # b
            sspec((1, 1), b2),                          # sel
            vspec((1, n), b2),                          # r
            vspec((1, n, kmax), b3),                    # cols
            vspec((1, kmax, kmax), b3),                 # Ginv
            vspec((1, kmax), b2),                       # Atb
            sspec((1, kmax), b2),                       # idx
            sspec((1, 1), b2),                          # kcnt
        ],
        out_specs=[
            vspec((1, n), b2),                          # r'
            vspec((1, n, kmax), b3),                    # cols'
            vspec((1, kmax, kmax), b3),                 # Ginv'
            vspec((1, kmax), b2),                       # Atb'
            vspec((1, kmax), b2),                       # coef'
            sspec((1, kmax), b2),                       # idx'
            sspec((1, 1), b2),                          # kcnt'
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), f32),
            jax.ShapeDtypeStruct((B, n, kmax), f32),
            jax.ShapeDtypeStruct((B, kmax, kmax), f32),
            jax.ShapeDtypeStruct((B, kmax), f32),
            jax.ShapeDtypeStruct((B, kmax), f32),
            jax.ShapeDtypeStruct((B, kmax), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), f32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(At, Bs, sel, r, cols, Ginv, Atb, idx, kcnt)
    return outs


def omp_fused(A, Bs, k: int, interpret: bool = False):
    """Batched OMP with the fused Pallas step kernel (f32, fixed k steps).

    Semantically identical to `vmap(cstpu.omp)(A, Bs)` with
    max_residual = 0 (stalled instances no-op). Returns the batched
    SparseSolution pytree.
    """
    from cstpu.utils.sparse import SparseSolution

    A = jnp.asarray(A, jnp.float32)
    Bs = jnp.asarray(Bs, jnp.float32)
    n, m = A.shape
    B = Bs.shape[0]
    k = int(min(k, n, m))
    At = A.T  # materialized once: contiguous column fetches in the kernel

    @partial(jax.jit, static_argnames=())
    def run(A, At, Bs):
        r = Bs
        cols = jnp.zeros((B, n, k), jnp.float32)
        Ginv = jnp.broadcast_to(jnp.eye(k, dtype=jnp.float32), (B, k, k))
        Atb = jnp.zeros((B, k), jnp.float32)
        coef = jnp.zeros((B, k), jnp.float32)
        idx = jnp.full((B, k), m, jnp.int32)
        kcnt = jnp.zeros((B, 1), jnp.int32)

        def body(t, carry):
            r, cols, Ginv, Atb, coef, idx, kcnt = carry
            scores = jnp.abs(r @ A)                       # (B, m) GEMM
            sel = jnp.argmax(scores, axis=1).astype(jnp.int32)[:, None]
            r, cols, Ginv, Atb, coef, idx, kcnt = omp_step_update(
                At, Bs, sel, r, cols, Ginv, Atb, idx, kcnt,
                interpret=interpret)
            return r, cols, Ginv, Atb, coef, idx, kcnt

        carry = (r, cols, Ginv, Atb, coef, idx, kcnt)
        r, cols, Ginv, Atb, coef, idx, kcnt = lax.fori_loop(
            0, k, body, carry)

        mask = jnp.arange(k)[None, :] < kcnt
        key = jnp.where(mask, idx, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key, axis=1)
        take = jnp.take_along_axis
        return SparseSolution(
            idx=jnp.where(take(mask, order, 1), take(idx, order, 1), m),
            val=jnp.where(take(mask, order, 1), take(coef, order, 1), 0),
            mask=take(mask, order, 1),
            m=int(m),
        )

    return run(A, At, Bs)

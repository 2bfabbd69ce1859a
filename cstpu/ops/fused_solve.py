"""Whole-solve fused batched OMP kernel (Pallas TPU) — the flagship kernel.

Profiling the XLA-composed loop (see docs/DESIGN.md) shows the solve is
dominated not by the correlation GEMM but by XLA re-staging the dictionary
into VMEM every while-loop iteration (a 32 MB copy + one HBM-rate GEMM per
iteration on v5e) plus a dozen small per-step fusions. This kernel runs the
ENTIRE k-step batched solve in one launch: the dictionary block is brought
into VMEM once and stays pinned for all k steps, so every correlation GEMM
runs at MXU rate, and the small state updates stay in VMEM with no
kernel-launch or relayout cost.

Per step, entirely in VMEM:
  scores = |r_bf16 @ A|            (B,n)x(n,m) MXU GEMM, f32 accumulate
  i      = argmax(scores, axis=1)  lane reduction, lowest-index ties
  acol   = onehot(i) @ A'          (B,m)x(n,m) MXU GEMM — a batched column
                                   gather expressed as a matmul (the TPU-fast
                                   equivalent of the reference's A[:, i])
  bordered inverse-Gram update     rank-one, batch-major layout
  coef  -= s * (u - e_t)           closed-form LS refit update
  r      = b - cols @ coef         k-plane FMA accumulation (VPU)

The active-set math is the same inverse-Gram engine as cstpu.ops.active_set
(block-inverse append, /root/reference/src/matchingpursuit.jl:62-70 parity,
stall-on-duplicate semantics of src/matchingpursuit.jl:66), with the slot
position equal to the step index so all slot updates are static-shape. All
state is batch-major — cols (B, k, n), Ginv (B, k, k), coef (B, k) — so
every reduction is a lane (last-axis) reduction with keepdims, the layouts
Mosaic lowers best; per-batch scalars live as (B, 1) columns.

Precision: the dictionary is consumed in `corr_dtype` (bf16 by default —
the MXU-native dtype; f32 available); ALL accumulations, the inverse Gram,
coefficients, and the residual are f32. With bf16 the kernel solves the
problem for the bf16-rounded dictionary exactly (coefficients are exact LS
solutions for it), which preserves support recovery at the test tolerances;
use corr_dtype=f32 for strict f32 parity with the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max


def _solve_kernel(k: int, A_ref, Bs_ref, idx_ref, coef_ref, r_ref,
                  cols, Ginv, coefs, idxs, r):
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    f32 = jnp.float32
    cdt = A_ref.dtype

    # init state
    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 2)
    Ginv[:, :, :] = (ii == jj).astype(f32)  # identity in every batch plane
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def step(t, _):
        # --- selection: fused correlate + abs + argmax ------------------
        scores = jnp.abs(
            lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32))        # (B, m)
        smax = jnp.max(scores, axis=1, keepdims=True)
        i = jnp.min(jnp.where(scores == smax, col_iota, INT_MAX),
                    axis=1, keepdims=True)                      # (B, 1)

        # --- batched column extraction as a one-hot GEMM ----------------
        oh = (col_iota == i).astype(cdt)                        # (B, m)
        acol = lax.dot_general(oh, A_ref[:, :],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)      # (B, n)

        # --- cross-Gram / quality scalars (all lane reductions) ---------
        cols[:, pl.ds(t, 1), :] = acol[:, None, :]              # provisional
        gfull = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)  # (B, k)
        atb = jnp.sum(cols[:, :, :] * Bs_ref[:, :][:, None, :], axis=2)
        et = (slot_iota == t).astype(f32)                       # (1, k)
        ata = jnp.sum(gfull * et, axis=1, keepdims=True)        # (B, 1)
        beta = jnp.sum(atb * et, axis=1, keepdims=True)         # (B, 1)
        g = gfull * (1.0 - et)                                  # (B, k)

        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)      # (B, k)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)         # (B, 1)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0                        # (B, 1)
        ok = (~dup) & (d > 1e-12 * ata)                         # (B, 1)
        okf = ok.astype(f32)
        dinv = okf / jnp.where(d > 0, d, 1.0)                   # (B, 1)
        s = dinv * (beta - jnp.sum(g * coefs[:, :], axis=1,
                                   keepdims=True))              # (B, 1)

        # --- bordered block-inverse update (slot = t, static) -----------
        w = u - et                                              # (B, k)
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - okf[:, :, None] * et[None, :, :] * et[:, :, None]
        coefs[:, :] = coefs[:, :] - s * w
        idxs[:, :] = jnp.where((et > 0) & ok,
                               jnp.broadcast_to(i, (B, k)), idxs[:, :])
        cols[:, pl.ds(t, 1), :] = (acol * okf)[:, None, :]      # gate column

        # --- residual: r = b - sum_k cols[k] * coef[k] -------------------
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted
        return 0

    lax.fori_loop(0, k, step, 0)

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("k", "corr_dtype", "interpret"))
def _omp_fused_call(A, Bs, k: int, corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)

    idx, coef, r = pl.pallas_call(
        partial(_solve_kernel, k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # A (n, m)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Bs (B, n)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.int32),   # support
            jax.ShapeDtypeStruct((B, k), f32),         # coefficients
            jax.ShapeDtypeStruct((B, n), f32),         # final residual
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k, n), f32),        # cols
            pltpu.VMEM((B, k, k), f32),        # Ginv
            pltpu.VMEM((B, k), f32),           # coef
            pltpu.VMEM((B, k), jnp.int32),     # idx
            pltpu.VMEM((B, n), f32),           # r
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * m * 2 * k,
            bytes_accessed=n * m * Ac.dtype.itemsize + 2 * B * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Bs)
    return idx, coef, r


def omp_fused_solve(A, Bs, k: int, corr_dtype=jnp.bfloat16,
                    interpret: bool = False):
    """Batched OMP via the whole-solve fused kernel.

    A: (n, m) dictionary; Bs: (B, n) measurement batch; fixed k steps
    (stalled instances no-op, mirroring src/matchingpursuit.jl:66).
    Returns a batched SparseSolution plus the final residuals (B, n).
    """
    from cstpu.utils.sparse import SparseSolution

    n, m = A.shape
    k = int(min(k, n, m))
    idx, coef, r = _omp_fused_call(jnp.asarray(A), jnp.asarray(Bs), k,
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


def supported(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """Shapes/dtype gate: everything must fit VMEM with headroom."""
    n, m = A.shape
    B = Bs.shape[0]
    k = int(min(k, n, m))
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (n * m * itemsize          # A
            + B * k * n * 4           # cols
            + 2 * B * n * 4 + B * m * 4 * 2   # r, b, scores(+onehot)
            + B * k * k * 4)          # Ginv
    return vmem < 100 * 1024 * 1024

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


def _degeneracy_rtol(n: int) -> float:
    """Relative threshold below which an atom's orthogonal component is
    numerical noise in f32-accumulated Gram arithmetic (~8n ulps). Appends
    with d < rtol * ||a||^2 are rejected (the batched analog of the
    reference's instability guard, /root/reference/src/backward.jl:169-173)
    and FR treats rescalings below rtol * ||a_j||^2 as "inside the active
    span" (a dtype-realistic version of src/forward.jl's `rescaling > 0`).
    """
    return 8.0 * n * 1.1920929e-07



def _to_solution(idx, coef, m: int):
    """Batched (B,K) padded support/coefficients -> SparseSolution sorted
    by atom index (the reference's sorted-nzind invariant).

    Sorting k <= 64 slots rides a pairwise-rank permutation (one (B,K,K)
    compare + three masked sums) instead of argsort + take_along_axis:
    the XLA sort primitive measured ~0.15 ms/solve on TPU — half the
    whole fused OMP solve at the bench config — while the rank form is
    VPU noise. Order is identical to a STABLE argsort on
    (key, slot position): active atom indices are unique, pad slots tie
    on INT_MAX and keep their relative order."""
    from cstpu.utils.sparse import SparseSolution

    B, K = idx.shape
    mask = idx < m
    key = jnp.where(mask, idx, INT_MAX)
    ki = key[:, :, None]          # destination of slot i
    kj = key[:, None, :]          # compared against slot j
    pos_i = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    pos_j = jnp.arange(K, dtype=jnp.int32)[None, None, :]
    rank = jnp.sum(((kj < ki) | ((kj == ki) & (pos_j < pos_i)))
                   .astype(jnp.int32), axis=2)             # (B, K)
    onehot = (rank[:, None, :]
              == jnp.arange(K, dtype=jnp.int32)[None, :, None])  # (B,r,i)
    ohf = onehot.astype(coef.dtype)
    sidx = jnp.sum(jnp.where(onehot, idx[:, None, :], 0), axis=2)
    smask = jnp.sum(jnp.where(onehot, mask[:, None, :], False), axis=2) > 0
    return SparseSolution(
        idx=jnp.where(smask, sidx, m),
        val=jnp.where(smask, jnp.sum(ohf * coef[:, None, :], axis=2), 0.0),
        mask=smask,
        m=int(m),
    )



def _extract_cols(AT_ref, i_scr, acol_scr, B: int):
    """Per-row column extraction: read the sublane-ALIGNED 8-row block of
    the transposed dictionary around each row's index and select the row
    with a tiny masked reduce — statically unrolled over the batch.

    Replaces the one-hot (B, m) x (m, n) extraction GEMM, which cost as
    much MXU time as the correlation itself (measured 0.25 ms of the
    0.55 ms solve at 64x1024x8192 k=32); this touches 8 rows (16 KB)
    per batch element instead of all of A and measures as free. Mosaic
    requires the dynamic sublane start to be provably 8-aligned — hence
    the (i // 8) * 8 base + in-register select.

    The index is clamped to m-1: a NaN-poisoned score row makes every
    `scores == smax` comparison False, so the argmax reduction returns
    INT_MAX — the clamp keeps the dynamic slice in bounds (the one-hot
    GEMM this replaced degraded gracefully to a zero column; out-of-range
    reads in Mosaic are undefined)."""
    m = AT_ref.shape[0]
    off = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    for b_ in range(B):
        ib = jnp.minimum(i_scr[b_, 0], m - 1)
        base = (ib // 8) * 8
        blk = AT_ref[pl.ds(base, 8), :].astype(jnp.float32)
        acol_scr[pl.ds(b_, 1), :] = jnp.sum(
            blk * (off == ib - base).astype(jnp.float32), axis=0,
            keepdims=True)


def _solve_kernel(k: int, sort_in_kernel: bool,
                  A_ref, AT_ref, Bs_ref, idx_ref, coef_ref, r_ref,
                  cols, Ginv, coefs, idxs, r, i_scr, acol_scr):
    # NOTE on the append-engine duplication across this file's kernels:
    # fused_twostage._Engine.append implements the same bordered
    # block-inverse math with a DYNAMIC first-free-slot one-hot (needed
    # once deletions create holes). The kernels here never delete, so
    # their write slot is the STATIC step index (et = slot_iota == t) —
    # reusing the engine would add a per-step free-slot scan + dynamic
    # one-hot on the flagship hot loop for zero benefit. Keep the static-
    # slot copies; apply numerics fixes to BOTH variants.
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

        # --- batched column extraction: aligned dynamic slices ----------
        i_scr[:, :] = i
        _extract_cols(AT_ref, i_scr, acol_scr, B)
        acol = acol_scr[:, :]                                   # (B, n)

        # --- cross-Gram / quality scalars (all lane reductions) ---------
        # slot t of cols is still zero, so g picks up only the OLD active
        # set; ata/beta come straight off the extracted column
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)       # (B, 1)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)   # (B, k)
        et = (slot_iota == t).astype(f32)                       # (1, k)

        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)      # (B, k)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)         # (B, 1)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0                        # (B, 1)
        ok = (~dup) & (d > _degeneracy_rtol(n) * ata)           # (B, 1)
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

    # --- epilogue: emit the solution SORTED by atom index ----------------
    # The rank-permutation sort (identical picks to _to_solution's XLA
    # form) runs in-kernel so nothing but a mask/where runs after the
    # pallas_call: one timing boundary for bench.py and the bare-kernel
    # sweep (VERDICT r4 weak-5). Pads carry idx == m and sort last,
    # stable by slot. The permutation GEMMs run at HIGHEST precision:
    # the one-hot factor is 0/1 (bf16-exact) but idx/coef are true f32
    # payloads a DEFAULT one-pass bf16 product would round (the SP
    # kernel's hardware lesson; a (B,k,k) HIGHEST GEMM is VPU noise).
    if sort_in_kernel:
        ki = idxs[:, :][:, :, None]                   # (B, k, 1)
        kj = idxs[:, :][:, None, :]                   # (B, 1, k)
        pi = lax.broadcasted_iota(jnp.int32, (B, k, k), 1)
        pj = lax.broadcasted_iota(jnp.int32, (B, k, k), 2)
        less = (kj < ki) | ((kj == ki) & (pj < pi))
        rank = jnp.sum(less.astype(f32), axis=2)      # (B, k) exact ints
        dest = lax.broadcasted_iota(jnp.int32, (B, k, k), 1).astype(f32)
        P = (rank[:, None, :] == dest).astype(f32)    # (B, dest, src)
        lane = lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        X = jnp.where(lane == 0, idxs[:, :].astype(f32)[:, :, None],
                      jnp.where(lane == 1, coefs[:, :][:, :, None], 0.0))
        Y = lax.dot_general(P, X, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32,
                            precision=lax.Precision.HIGHEST)
        idx_ref[:, :] = jnp.sum(Y * (lane == 0), axis=2).astype(jnp.int32)
        coef_ref[:, :] = jnp.sum(Y * (lane == 1), axis=2)
    else:
        idx_ref[:, :] = idxs[:, :]
        coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("k", "corr_dtype", "interpret",
                                   "sort_in_kernel"))
def _omp_fused_call(A, Bs, k: int, corr_dtype, interpret: bool = False,
                    sort_in_kernel: bool = True):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    AcT = Ac.T                                   # (m, n) for extraction
    Bs = Bs.astype(f32)

    idx, coef, r = pl.pallas_call(
        partial(_solve_kernel, k, sort_in_kernel),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # A (n, m)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # A^T (m, n)
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
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), f32),           # extracted columns
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * m * k,
            bytes_accessed=n * m * Ac.dtype.itemsize + 2 * B * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, AcT, Bs)
    return idx, coef, r


def omp_fused_solve(A, Bs, k: int, corr_dtype=jnp.bfloat16,
                    interpret: bool = False, sort_in_kernel: bool = True):
    """Batched OMP via the whole-solve fused kernel.

    A: (n, m) dictionary; Bs: (B, n) measurement batch; fixed k steps
    (stalled instances no-op, mirroring src/matchingpursuit.jl:66).
    Returns a batched SparseSolution plus the final residuals (B, n).
    `sort_in_kernel=False` keeps the sort in the XLA `_to_solution`
    stage (the pre-r5 boundary) — retained for on-chip A/Bs.
    """
    n, m = A.shape
    k = int(min(k, n, m))
    idx, coef, r = _omp_fused_call(jnp.asarray(A), jnp.asarray(Bs), k,
                                   corr_dtype, interpret, sort_in_kernel)
    if not sort_in_kernel:
        return _to_solution(idx, coef, m), r
    # the kernel epilogue already emitted the index-sorted solution;
    # only the mask/where pack remains outside (one timing boundary)
    from cstpu.utils.sparse import SparseSolution

    mask = idx < m
    return SparseSolution(idx=jnp.where(mask, idx, m),
                          val=jnp.where(mask, coef, 0.0),
                          mask=mask, m=int(m)), r


def supported(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """Shapes/dtype gate: everything must fit VMEM with headroom."""
    n, m = A.shape
    B = Bs.shape[0]
    k = int(min(k, n, m))
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (2 * n * m * itemsize      # A + A^T (extraction copy)
            + B * k * n * 4           # cols
            + 2 * B * n * 4 + B * m * 4 * 2   # r, b, scores
            + B * k * k * 4)          # Ginv
    return vmem < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Streaming whole-solve OMP: dictionaries beyond VMEM scale
# ---------------------------------------------------------------------------

def _stream_kernel(k: int, T: int, tm: int, A_ref, Bs_ref,
                   idx_ref, coef_ref, r_ref,
                   cols, Ginv, coefs, idxs, r, vmax, vidx, vcol):
    """OMP with the dictionary STREAMED tile-by-tile from HBM.

    Grid = (k steps) x (T atom tiles); Pallas double-buffers the next A
    tile while the current one is in compute, so each step costs exactly
    one HBM read of A — the roofline for dictionaries that cannot be
    VMEM-pinned (BASELINE's 1M-atom config). Solver state persists in VMEM
    scratch across grid iterations (TPU grids execute sequentially).

    Selection runs as a running (max, argmax, best column) over tiles: the
    per-tile best column is extracted while its tile is resident (one-hot
    GEMM) so no second sweep is needed. The append at the end of each
    sweep is the same lean bordered block-inverse update as _solve_kernel.
    """
    B, n = Bs_ref.shape
    f32 = jnp.float32
    cdt = A_ref.dtype
    m = T * tm
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((t == 0) & (j == 0))
    def _init():
        r[:, :] = Bs_ref[:, :]
        cols[:, :, :] = jnp.zeros_like(cols)
        ii = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 2)
        Ginv[:, :, :] = (ii == jj).astype(f32)
        coefs[:, :] = jnp.zeros_like(coefs)
        idxs[:, :] = jnp.full_like(idxs, m)

    @pl.when(j == 0)
    def _reset():
        vmax[:, :] = jnp.full_like(vmax, -jnp.inf)
        vidx[:, :] = jnp.zeros_like(vidx)

    # --- tile: correlate, tile-argmax, extract tile-best column ----------
    tile_iota = jax.lax.broadcasted_iota(jnp.int32, (B, tm), 1)
    scores = jnp.abs(
        lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32))            # (B, tm)
    tmax = jnp.max(scores, axis=1, keepdims=True)
    tloc = jnp.min(jnp.where(scores == tmax, tile_iota, INT_MAX),
                   axis=1, keepdims=True)                       # (B, 1)
    toh = (tile_iota == tloc).astype(cdt)
    tcol = lax.dot_general(toh, A_ref[:, :], (((1,), (1,)), ((), ())),
                           preferred_element_type=f32)          # (B, n)
    better = tmax > vmax[:, :]                                  # (B, 1)
    vidx[:, :] = jnp.where(better, tloc + j * tm, vidx[:, :])
    vmax[:, :] = jnp.where(better, tmax, vmax[:, :])
    vcol[:, :] = jnp.where(better, tcol, vcol[:, :])

    # --- sweep end: append the global winner ------------------------------
    @pl.when(j == T - 1)
    def _append():
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        acol = vcol[:, :]
        i = vidx[:, :]
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)
        et = (slot_iota == t).astype(f32)
        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0
        ok = (~dup) & (d > _degeneracy_rtol(n) * ata)
        okf = ok.astype(f32)
        dinv = okf / jnp.where(d > 0, d, 1.0)
        s = dinv * (beta - jnp.sum(g * coefs[:, :], axis=1, keepdims=True))

        w = u - et
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - okf[:, :, None] * et[None, :, :] * et[:, :, None]
        coefs[:, :] = coefs[:, :] - s * w
        idxs[:, :] = jnp.where((et > 0) & ok,
                               jnp.broadcast_to(i, (B, k)), idxs[:, :])
        cols[:, pl.ds(t, 1), :] = (acol * okf)[:, None, :]
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted

    @pl.when((t == k - 1) & (j == T - 1))
    def _out():
        idx_ref[:, :] = idxs[:, :]
        coef_ref[:, :] = coefs[:, :]
        r_ref[:, :] = r[:, :]


def _stream_tile(m: int, n: int, itemsize: int, target_bytes: int) -> int:
    """Largest 128-multiple divisor of m whose tile fits the VMEM budget."""
    best = 0
    tm = 128
    while tm * n * itemsize <= target_bytes and tm <= m:
        if m % tm == 0:
            best = tm
        tm += 128
    return best


@partial(jax.jit, static_argnames=("k", "corr_dtype", "interpret"))
def _omp_stream_call(A, Bs, k: int, corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)
    tm = _stream_tile(m, n, jnp.dtype(corr_dtype).itemsize,
                      8 * 1024 * 1024)
    T = m // tm

    idx, coef, r = pl.pallas_call(
        partial(_stream_kernel, k, T, tm),
        grid=(k, T),
        in_specs=[
            pl.BlockSpec((n, tm), lambda t, j: (0, j),
                         memory_space=pltpu.VMEM),               # A tile
            pl.BlockSpec((B, n), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),               # Bs
        ],
        out_specs=[
            pl.BlockSpec((B, k), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n), lambda t, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, k), f32),
            jax.ShapeDtypeStruct((B, n), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k, n), f32),        # cols
            pltpu.VMEM((B, k, k), f32),        # Ginv
            pltpu.VMEM((B, k), f32),           # coef
            pltpu.VMEM((B, k), jnp.int32),     # idx
            pltpu.VMEM((B, n), f32),           # r
            pltpu.VMEM((B, 1), f32),           # running max
            pltpu.VMEM((B, 1), jnp.int32),     # running argmax
            pltpu.VMEM((B, n), f32),           # running best column
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n * m * k,
            bytes_accessed=k * n * m * Ac.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Ac, Bs)
    return idx, coef, r


def omp_stream_solve(A, Bs, k: int, corr_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Batched OMP for dictionaries beyond VMEM scale (streamed from HBM).

    Semantics identical to omp_fused_solve; per-step cost is one HBM read
    of the dictionary, overlapped with compute by the tile pipeline.
    """
    n, m = A.shape
    k = int(min(k, n, m))
    if _stream_tile(m, n, jnp.dtype(corr_dtype).itemsize,
                    8 * 1024 * 1024) == 0:
        raise ValueError(
            f"omp_stream_solve: no valid atom tile for (n={n}, m={m}, "
            f"{jnp.dtype(corr_dtype).name}) — m must be a multiple of 128 "
            "and one 128-atom tile must fit the 8 MB tile budget "
            "(check supported_stream before dispatching)")
    idx, coef, r = _omp_stream_call(jnp.asarray(A), jnp.asarray(Bs), k,
                                    corr_dtype, interpret)
    return _to_solution(idx, coef, m), r


def supported_stream(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """Gate: solver STATE must fit VMEM; the dictionary need not."""
    n, m = A.shape
    B = Bs.shape[0]
    k = int(min(k, n, m))
    if n % 8 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    if _stream_tile(m, n, itemsize, 8 * 1024 * 1024) == 0:
        return False
    state = (B * k * n * 4 + 4 * B * n * 4 + B * k * k * 4
             + 2 * 8 * 1024 * 1024)  # state + double-buffered tiles
    return state < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Forward regression (OLS selection rule), whole-solve fused
# ---------------------------------------------------------------------------

def _fr_kernel(k: int,
               A_ref, AT_ref, Bs_ref, cn2_ref, thr_ref, idx_ref, coef_ref,
               r_ref, done_ref, cols, Ginv, coefs, idxs, r, resc, amask,
               i_scr, acol_scr):
    """Forward-regression solve with the OLS rule, dictionary pinned in VMEM.

    Selection: delta_j^2 = <a_j, r>^2 / rescaling_j with the energetic norm
    rescaling_j = ||a_j||^2 - ||proj_active a_j||^2
    (/root/reference/src/forward.jl:74-81,100-114). Instead of the
    reference's per-step Q'A GEMM, the rescaling is maintained by the
    order-recursive identity: appending the orthonormalized column
    q = a_perp / ||a_perp|| subtracts (q'a_j)^2 = (a_perp'a_j)^2 / d from
    every rescaling — one extra (B,n)x(n,m) MXU GEMM per step.
    Dual stopping (max_residual / min_decrease,
    /root/reference/src/forward.jl:56-72) is a per-instance done latch:
    once an instance rejects a step it no-ops through the remaining trips.
    """
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    f32 = jnp.float32
    cdt = A_ref.dtype
    max_eps2 = thr_ref[0, 0]    # traced operands: changing thresholds
    min_d2 = thr_ref[0, 1]      # must not recompile the kernel

    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 2)
    Ginv[:, :, :] = (ii == jj).astype(f32)
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)
    resc[:, :] = jnp.broadcast_to(cn2_ref[0:1, :], (B, m))
    amask[:, :] = jnp.zeros_like(amask)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    NEG = jnp.float32(-jnp.inf)

    def step(t, done):
        # --- OLS selection rule -----------------------------------------
        q = lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)         # (B, m)
        rmin = _degeneracy_rtol(n) * cn2_ref[0:1, :]
        d2 = jnp.where(resc[:, :] > rmin, q * q / resc[:, :], NEG)
        d2 = jnp.where(amask[:, :] > 0, 0.0, d2)   # active atoms score 0
        dmax = jnp.max(d2, axis=1, keepdims=True)               # (B, 1)
        i = jnp.min(jnp.where(d2 == dmax, col_iota, INT_MAX),
                    axis=1, keepdims=True)                      # (B, 1)

        # --- stopping rules (src/forward.jl:56-72) -----------------------
        rnorm2 = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)
        accept = (rnorm2 > max_eps2) & (dmax > min_d2)
        ok = accept & (done < 0.5)

        # --- append (same engine as the OMP kernel) ----------------------
        i_scr[:, :] = i
        _extract_cols(AT_ref, i_scr, acol_scr, B)
        acol = acol_scr[:, :]                                   # (B, n)
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)   # slot t = 0
        et = (slot_iota == t).astype(f32)
        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0
        okb = ok & (~dup) & (d > _degeneracy_rtol(n) * ata)
        okf = okb.astype(f32)
        dinv = okf / jnp.where(d > 0, d, 1.0)
        s = dinv * (beta - jnp.sum(g * coefs[:, :], axis=1, keepdims=True))

        w = u - et
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - okf[:, :, None] * et[None, :, :] * et[:, :, None]
        coefs[:, :] = coefs[:, :] - s * w
        idxs[:, :] = jnp.where((et > 0) & okb,
                               jnp.broadcast_to(i, (B, k)), idxs[:, :])
        cols[:, pl.ds(t, 1), :] = (acol * okf)[:, None, :]

        # --- order-recursive rescaling update ----------------------------
        aperp = acol - jnp.sum(cols[:, :, :] * u[:, :, None], axis=1)
        z = lax.dot_general(aperp.astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)         # (B, m)
        resc[:, :] = resc[:, :] - dinv * z * z
        amask[:, :] = amask[:, :] + (col_iota == i).astype(f32) * okf
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted
        return jnp.where(okb, done, 1.0)  # failed append also latches

    done = lax.fori_loop(0, k, step, jnp.zeros((B, 1), f32))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]
    done_ref[:, :] = done


@partial(jax.jit, static_argnames=("k", "corr_dtype", "interpret"))
def _fr_fused_call(A, Bs, k: int, max_eps2, min_d2,
                   corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)
    cn2 = jnp.sum(A.astype(f32) * A.astype(f32), axis=0)[None, :]
    thr = jnp.stack([jnp.asarray(max_eps2, f32),
                     jnp.asarray(min_d2, f32)])[None, :]

    idx, coef, r, done = pl.pallas_call(
        partial(_fr_kernel, k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, k), f32),
            jax.ShapeDtypeStruct((B, n), f32),
            jax.ShapeDtypeStruct((B, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k, n), f32),        # cols
            pltpu.VMEM((B, k, k), f32),        # Ginv
            pltpu.VMEM((B, k), f32),           # coef
            pltpu.VMEM((B, k), jnp.int32),     # idx
            pltpu.VMEM((B, n), f32),           # r
            pltpu.VMEM((B, m), f32),           # rescaling
            pltpu.VMEM((B, m), f32),           # active mask
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), f32),           # extracted columns
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * m * 3 * k,
            bytes_accessed=n * m * Ac.dtype.itemsize + 2 * B * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs, cn2, thr)
    return idx, coef, r, done


def fr_fused_solve(A, Bs, k: int, max_residual: float = 0.0,
                   min_decrease: float = 0.0, corr_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """Batched forward regression via the whole-solve fused kernel.

    Equivalent to `vmap(cstpu.fr)` with sparsity=k and the same
    max_residual/min_decrease stopping (parity: src/forward.jl:33-51).
    Returns (SparseSolution, residuals (B, n)).
    """
    n, m = A.shape
    k = int(min(k, n, m))
    idx, coef, r, _ = _fr_fused_call(
        jnp.asarray(A), jnp.asarray(Bs), k,
        float(max_residual) ** 2, float(min_decrease) ** 2,
        corr_dtype, interpret)
    return _to_solution(idx, coef, m), r


def supported_fr(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused FR kernel (adds two (B, m) f32 buffers)."""
    n, m = A.shape
    B = Bs.shape[0]
    k = int(min(k, n, m))
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (2 * n * m * itemsize      # A + A^T (extraction copy)
            + B * k * n * 4
            + 2 * B * n * 4 + B * m * 4 * 4 + B * k * k * 4)
    return vmem < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Generalized OMP (top-l acquisitions per iteration), whole-solve fused
# ---------------------------------------------------------------------------

def _gomp_kernel(k: int, l: int, rem: int,
                 A_ref, AT_ref, Bs_ref, thr_ref, idx_ref, coef_ref, r_ref,
                 cols, Ginv, coefs, idxs, r, kcnt, i_scr, acol_scr):
    """GOMP: add the top-l correlated atoms per iteration, one LS refit.

    Parity: /root/reference/src/matchingpursuit.jl:95-148 — floor(k/l)
    l-atom iterations with epsilon stopping, plus one unconditional
    remainder step; already-active atoms in the top-l are skipped without
    consuming a slot (src/util.jl:129-134), so the write position is a
    per-instance one-hot at the running count rather than the OMP kernel's
    static step index. The l appends within an iteration all select from
    the SAME score vector (iteratively masked argmax = top-l), and the
    closed-form coefficient update after each append leaves exactly the
    reference's single post-iteration LS refit.
    """
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    f32 = jnp.float32
    cdt = A_ref.dtype
    cap = min(n, k)
    eps2 = thr_ref[0, 0]        # traced operand: changing the tolerance
    #                             must not recompile the kernel

    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, k, k), 2)
    Ginv[:, :, :] = (ii == jj).astype(f32)
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)
    kcnt[:, :] = jnp.zeros_like(kcnt)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def append_one(scores, done):
        """Select the current best from `scores`, append it at the
        per-instance slot, and return the masked scores."""
        smax = jnp.max(scores, axis=1, keepdims=True)
        i = jnp.min(jnp.where(scores == smax, col_iota, INT_MAX),
                    axis=1, keepdims=True)                      # (B, 1)
        scores = jnp.where(col_iota == i, -jnp.inf, scores)

        i_scr[:, :] = i
        _extract_cols(AT_ref, i_scr, acol_scr, B)
        acol = acol_scr[:, :]                                   # (B, n)
        et = (slot_iota == kcnt[:, :]).astype(f32)              # (B, k)
        dup = jnp.sum((idxs[:, :] == i).astype(f32), axis=1,
                      keepdims=True) > 0
        pre = (~dup) & (kcnt[:, :] < cap) & (done < 0.5)        # (B, 1)

        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * Bs_ref[:, :], axis=1, keepdims=True)
        g = jnp.sum(cols[:, :, :] * acol[:, None, :], axis=2)  # slot free
        u = jnp.sum(Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        ok = pre & (d > _degeneracy_rtol(n) * ata)
        okf = ok.astype(f32)
        dinv = okf / jnp.where(d > 0, d, 1.0)
        s = dinv * (beta - jnp.sum(g * coefs[:, :], axis=1, keepdims=True))

        w = u - et
        Ginv[:, :, :] = Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - okf[:, :, None] * et[:, :, None] * et[:, None, :]
        coefs[:, :] = coefs[:, :] - s * w
        idxs[:, :] = jnp.where((et > 0) & ok,
                               jnp.broadcast_to(i, (B, k)), idxs[:, :])
        cols[:, :, :] = cols[:, :, :] \
            + (acol * okf)[:, None, :] * et[:, :, None]
        kcnt[:, :] = kcnt[:, :] + ok.astype(jnp.int32)
        return scores

    def iteration(count: int, done):
        scores = jnp.abs(
            lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32))        # (B, m)
        for _ in range(count):
            scores = append_one(scores, done)
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted
        rnorm2 = jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)
        full = kcnt[:, :].astype(f32) >= float(n)
        return jnp.where((rnorm2 < eps2) | full, 1.0, done)

    def outer(t, done):
        return iteration(l, done)

    done = lax.fori_loop(0, k // l, outer, jnp.zeros((B, 1), f32))
    if rem > 0:  # unconditional remainder step (src/matchingpursuit.jl:136)
        iteration(rem, jnp.zeros((B, 1), f32))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("l", "k", "corr_dtype", "interpret"))
def _gomp_fused_call(A, Bs, l: int, k: int, eps2, corr_dtype,
                     interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(f32)
    thr = jnp.stack([jnp.asarray(eps2, f32),
                     jnp.zeros((), f32)])[None, :]

    idx, coef, r = pl.pallas_call(
        partial(_gomp_kernel, k, l, k % l),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, k), f32),
            jax.ShapeDtypeStruct((B, n), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k, n), f32),        # cols
            pltpu.VMEM((B, k, k), f32),        # Ginv
            pltpu.VMEM((B, k), f32),           # coef
            pltpu.VMEM((B, k), jnp.int32),     # idx
            pltpu.VMEM((B, n), f32),           # r
            pltpu.VMEM((B, 1), jnp.int32),     # kcnt
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), f32),           # extracted columns
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs, thr)
    return idx, coef, r


def gomp_fused_solve(A, Bs, l: int, k: int, max_residual: float = 0.0,
                     corr_dtype=jnp.bfloat16, interpret: bool = False):
    """Batched generalized OMP via the whole-solve fused kernel.

    Returns (SparseSolution, residuals). Parity:
    src/matchingpursuit.jl:95-148 (fixed k atoms, l per iteration,
    epsilon stopping between iterations, unconditional remainder step).
    """
    n, m = A.shape
    # clamp by n as well: supported() (the dispatch gate) sizes the
    # (B, k, k) Ginv scratch with min(k, n, m), and appends beyond n are
    # impossible anyway (the in-kernel cap) — an unclamped k > n would
    # allocate scratch the gate never accounted for
    k = int(min(k, n, m))
    idx, coef, r = _gomp_fused_call(jnp.asarray(A), jnp.asarray(Bs),
                                    int(l), k, float(max_residual) ** 2,
                                    corr_dtype, interpret)
    return _to_solution(idx, coef, m), r


# ---------------------------------------------------------------------------
# Plain matching pursuit, whole-solve fused
# ---------------------------------------------------------------------------

def _mp_kernel(k: int, A_ref, Bs_ref, x_ref, r_ref, r, x):
    """MP: x[i] += <a_i, r>, r -= <a_i, r> a_i — no refit, dense x.

    Parity: /root/reference/src/matchingpursuit.jl:10-40 (unit-norm columns
    assumed, as the reference warns at :9).
    """
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    f32 = jnp.float32
    cdt = A_ref.dtype

    r[:, :] = Bs_ref[:, :]
    x[:, :] = jnp.zeros_like(x)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)

    def step(t, _):
        s = lax.dot_general(r[:, :].astype(cdt), A_ref[:, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)         # (B, m)
        a = jnp.abs(s)
        amax = jnp.max(a, axis=1, keepdims=True)
        i = jnp.min(jnp.where(a == amax, col_iota, INT_MAX),
                    axis=1, keepdims=True)
        oh = (col_iota == i)
        v = jnp.sum(jnp.where(oh, s, 0.0), axis=1, keepdims=True)  # (B, 1)
        acol = lax.dot_general(oh.astype(cdt), A_ref[:, :],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)      # (B, n)
        x[:, :] = x[:, :] + v * oh.astype(f32)
        r[:, :] = r[:, :] - v * acol
        return 0

    lax.fori_loop(0, k, step, 0)
    x_ref[:, :] = x[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("k", "corr_dtype", "interpret"))
def mp_fused_solve(A, Bs, k: int, corr_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """Batched matching pursuit (k coefficient updates); returns (x, r)."""
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    Ac = jnp.asarray(A).astype(corr_dtype)
    Bs = jnp.asarray(Bs).astype(f32)

    x, r = pl.pallas_call(
        partial(_mp_kernel, int(k)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((B, m), f32),
            jax.ShapeDtypeStruct((B, n), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, n), f32),
            pltpu.VMEM((B, m), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Bs)
    return x, r

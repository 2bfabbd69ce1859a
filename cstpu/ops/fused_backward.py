"""Whole-solve fused backward elimination (Pallas TPU): FBR and LACE.

The backward family starts from the FULL least-squares solution and
deletes atoms one at a time (/root/reference/src/backward.jl). The XLA
formulation (cstpu.models.backward) re-stages the (m, m) Gram inverse
through HBM on every while-loop iteration — ~2·m²·4 bytes of traffic per
deletion, which at m=1024 makes the whole solve HBM-bound. This kernel
keeps the Gram inverse pinned in VMEM across ALL deletions: the expensive
O(m³) init (Cholesky of A'A) happens once OUTSIDE the kernel in XLA and is
shared by the whole batch (the dictionary is shared), and the kernel runs
only the O(m²)-per-step Schur-complement downdate loop, one problem
instance per grid program.

Per deletion, entirely in VMEM (all exact-f32 VPU ops — no matmuls, so no
TPU bf16-matmul precision hazard on this decision-sensitive path):

  d²        = coef² / diag(G⁻¹)          selection scores (1, m)
  p         = masked argmin              (FBR: min d²; LACE: min |coef|)
  g         = G⁻¹[p, :]                  8-aligned sublane slab + masked
                                         reduce (the aligned-slice idiom)
  G⁻¹      -= g'g / g_pp                 rank-one downdate, (m, m) VPU
  coef     -= g · coef_p / g_pp          closed-form deletion refit:
                                         (G⁻¹ − g'g/g_pp)(A'b) with column
                                         p of the downdated G⁻¹ ≡ 0
  diag     -= g² / g_pp                  incremental diagonal
  ‖r‖²     += d²_p                       residual norm by the Schur
                                         identity (src/backward.jl:57-59)

Deleted slots are never compacted (no gathers): the downdate itself zeroes
row/col p in exact arithmetic, the alive mask excludes dead slots from
selection, and cheap (1, m) resets keep their diag/coef sane — the masked
analog of the reference's `_dropindex!` Schur update
(src/backward.jl:202-212). The per-instance numerical-instability flag
replaces the reference's `throw` (src/backward.jl:169-173): batched
solvers must not abort the batch.

BR's fast path (γ = diag((R'R)⁻¹) from the QR, src/backward.jl:69-83)
computes mathematically identical deltas, so this kernel is the TPU
acceleration for the whole backward family; `br` keeps the QR-based XLA
path for strict numerical parity with the reference's method.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max
INF = float(jnp.inf)


def _bw_kernel(nsteps: int, select_abs: bool,
               AA0_ref, diag0_ref, coef0_ref, nr20_ref, thr_ref,
               coef_ref, alive_ref, fail_ref,
               AA, coef, diag, alive, p_scr, s_scr):
    m = AA0_ref.shape[0]
    f32 = jnp.float32
    max_eps2 = thr_ref[0, 0]    # traced operands: changing thresholds
    max_delta2 = thr_ref[0, 1]  # must not recompile the kernel

    # per-program init: private copy of the shared Gram inverse; the
    # per-instance inputs/outputs carry a singleton middle axis so their
    # (1, m) blocks satisfy Mosaic's sublane-divisibility rule
    AA[:, :] = AA0_ref[:, :]
    coef[:, :] = coef0_ref[0]
    diag[:, :] = diag0_ref[:, :]
    alive[:, :] = jnp.ones_like(alive[:, :])
    fail_ref[0, :, :] = jnp.zeros((1, 1), f32)

    col_iota = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    off = lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(carry):
        t, nr2, _run = carry
        live = alive[:, :]
        c = coef[:, :]
        dg = diag[:, :]

        # --- selection + its residual-increase delta --------------------
        d2 = jnp.where(live > 0, c * c / dg, INF)          # (1, m)
        sel = jnp.where(live > 0, jnp.abs(c), INF) if select_abs else d2
        minv = jnp.min(sel, axis=1, keepdims=True)
        p = jnp.min(jnp.where(sel == minv, col_iota, INT_MAX),
                    axis=1, keepdims=True)                 # (1, 1) i32
        # all-NaN scores (e.g. a NaN Cholesky init) select nothing:
        # p stays INT_MAX — treat as invalid and stop, and clamp the
        # staged index so the aligned slab read below stays in bounds
        valid = p < m
        ep = (col_iota == p).astype(f32)                   # (1, m)
        d2p = jnp.sum(jnp.where(ep > 0, d2, 0.0), axis=1,
                      keepdims=True)                       # (1, 1)

        # --- accept test (src/backward.jl:57-59) ------------------------
        # the reference throws here (backward.jl:169). The predicate is
        # written as a NEGATED >= so NaN state (e.g. a NaN Cholesky init
        # from a rank-deficient Gram) latches the failure flag instead of
        # silently comparing False; an invalid selection (~valid, which
        # only happens with NaN scores) latches it too.
        fail = ~((d2p + nr2) >= 0) | ~valid
        newnr2 = jnp.maximum(nr2 + d2p, 0.0)
        acc = valid & (~fail) & (newnr2 < max_eps2) & (d2p < max_delta2)
        accf = acc.astype(f32)                             # (1, 1)
        fail_ref[0, :, :] = jnp.maximum(fail_ref[0], fail.astype(f32))

        # --- Schur-complement downdate, gated by the accept flag --------
        # Mosaic cannot broadcast a (1, 1) vector into both sublanes and
        # lanes, so every quantity that scales an (m, m) value is staged
        # through scratch and read back as a TRUE scalar
        p_scr[:, :] = jnp.minimum(p, m - 1)
        s_scr[:, 0:1] = accf
        s_scr[:, 1:2] = jnp.sum(dg * ep, axis=1, keepdims=True)  # G⁻¹[p,p]
        s_scr[:, 2:3] = jnp.sum(c * ep, axis=1, keepdims=True)   # coef[p]
        pb = p_scr[0, 0]
        accs = s_scr[0, 0]
        gpps = s_scr[0, 1]
        coefps = s_scr[0, 2]
        ginvs = accs / jnp.where(gpps != 0, gpps, 1.0)     # 0 when rejected

        base = (pb // 8) * 8
        blk = AA[pl.ds(base, 8), :]                        # (8, m)
        g = jnp.sum(blk * (off == pb - base).astype(f32), axis=0,
                    keepdims=True)                         # (1, m) = G⁻¹[p,:]
        # column p from symmetry, via a masked reduce: a (1,m)->(m,1)
        # jnp.transpose of g compiles standalone but HANGS the Mosaic
        # compile once inside this while body (>30 min, killed) — don't
        gcol = jnp.sum(AA[:, :] * ep, axis=1, keepdims=True)  # (m, 1)

        # rank-one downdate only — in exact arithmetic it already zeroes
        # row/col p, and the f32 residue left there is isolated by the
        # alive mask (selection) and the (1, m) diag/coef resets below;
        # identity-padding the (m, m) slot costs ~4 extra full VMEM
        # passes per step and is not needed for any live quantity
        AA[:, :] = AA[:, :] - gcol * (g * ginvs)

        coef[:, :] = (c - g * (coefps * ginvs)) * (1.0 - accs * ep)
        diag[:, :] = (dg - g * g * ginvs) * (1.0 - accs * ep) + accs * ep
        alive[:, :] = live * (1.0 - accs * ep)

        nr2 = jnp.where(acc, newnr2, nr2)
        return t + 1, nr2, accf

    def cond(carry):
        t, _nr2, run = carry
        return (t < nsteps) & (jnp.min(run) > 0.5)

    lax.while_loop(cond, body,
                   (jnp.int32(0), nr20_ref[0], jnp.ones((1, 1), f32)))

    coef_ref[0, :, :] = coef[:, :]
    alive_ref[0, :, :] = alive[:, :]


@partial(jax.jit, static_argnames=("k", "select_abs", "interpret"))
def _bw_fused_call(A, Bs, k: int, max_eps2, max_delta2,
                   select_abs: bool, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    f32 = jnp.float32
    A = A.astype(f32)
    Bs = Bs.astype(f32)
    thr = jnp.stack([jnp.asarray(max_eps2, f32),
                     jnp.asarray(max_delta2, f32)])[None, :]

    # full-LS init, shared across the batch (one Cholesky for all B) —
    # f32 matmul precision is mandatory on this decision-sensitive path
    with jax.default_matmul_precision("float32"):
        G = A.T @ A
        L = jnp.linalg.cholesky(G)
        AAinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(m, dtype=f32))
        AAinv = 0.5 * (AAinv + AAinv.T)  # kernel relies on exact symmetry
        Ab = Bs @ A                                        # (B, m)
        coef0 = Ab @ AAinv                                 # (B, m)
        r0 = Bs - coef0 @ A.T
    diag0 = jnp.diagonal(AAinv)[None, :]
    nr20 = jnp.sum(r0 * r0, axis=1, keepdims=True)

    nsteps = max(m - k, 0)
    coef, alive, failed = pl.pallas_call(
        partial(_bw_kernel, nsteps, select_abs),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((m, m), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),         # shared G⁻¹
            pl.BlockSpec((1, m), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),         # shared diag
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),         # coef0
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),         # ||r0||²
            pl.BlockSpec((1, 2), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),         # thresholds
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, m), f32),          # coefficients
            jax.ShapeDtypeStruct((B, 1, m), f32),          # alive mask
            jax.ShapeDtypeStruct((B, 1, 1), f32),          # failure flag
        ],
        scratch_shapes=[
            pltpu.VMEM((m, m), f32),                       # private G⁻¹
            pltpu.VMEM((1, m), f32),                       # coef
            pltpu.VMEM((1, m), f32),                       # diag
            pltpu.VMEM((1, m), f32),                       # alive
            pltpu.VMEM((1, 1), jnp.int32),                 # selected slot
            pltpu.VMEM((1, 128), f32),                     # scalar staging
        ],
        cost_estimate=pl.CostEstimate(
            flops=7 * B * nsteps * m * m,
            bytes_accessed=m * m * 4 + 3 * B * m * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(AAinv, diag0, coef0[:, None, :], nr20[:, :, None], thr)
    return coef[:, 0, :], alive[:, 0, :], failed[:, 0, :]


def _to_solution(coef, alive, m: int):
    from cstpu.utils.sparse import SparseSolution

    B = coef.shape[0]
    mask = alive > 0.5
    iota = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (B, m))
    return SparseSolution(
        idx=jnp.where(mask, iota, m),
        val=jnp.where(mask, coef, 0.0),
        mask=mask,
        m=int(m),
    )


@jax.jit
def _exact_refit(A, Bs, coef, alive, failed):
    """Exact LS refit on each instance's surviving support (masked
    normal equations, one shared Gram + per-instance Cholesky) —
    discards the deletion chain's f32 coefficient drift from the
    RETURNED values while the support decisions keep riding the
    maintained inverse (the reference's own formulation,
    src/backward.jl:187-191, drift-invisible at its f64). Failed (NaN)
    instances keep their drifted values; the flag is the contract."""
    from jax.scipy.linalg import cho_solve

    with jax.default_matmul_precision("float32"):
        occf = (alive > 0.5).astype(A.dtype)                  # (B, m)
        G = A.T @ A                                           # (m, m)
        Gm = (G[None, :, :] * occf[:, :, None] * occf[:, None, :]
              + jnp.eye(A.shape[1], dtype=A.dtype)[None, :, :]
              * ((1.0 - occf)[:, :, None] * (1.0 - occf)[:, None, :]))
        rhs = occf * (Bs @ A)                                 # (B, m)
        L = jnp.linalg.cholesky(Gm)
        sol = jax.vmap(lambda Lb, rb: cho_solve((Lb, True), rb))(L, rhs)
        sol = jnp.where(occf > 0, sol, 0.0)
        return jnp.where(failed[:, None], coef, sol)


def fbr_fused_solve(A, Bs, max_residual: float = math.inf,
                    max_increase: float = math.inf, sparsity: int = 0,
                    interpret: bool = False):
    """Batched fast backward regression via the fused deletion kernel.

    Equivalent to `vmap(cstpu.fbr)` (parity src/backward.jl:112-212) with
    the Gram inverse pinned in VMEM across all deletions. Returns
    (SparseSolution, failed (B,) bool) — `failed` is the batched analog of
    the reference's instability throw (src/backward.jl:169-173).
    """
    n, m = A.shape
    if m > n:
        raise ValueError(f"fast backward regression needs m <= n, got "
                         f"({n}, {m})")
    coef, alive, failed = _bw_fused_call(
        jnp.asarray(A), jnp.asarray(Bs), int(sparsity),
        float(max_residual) ** 2, float(max_increase) ** 2,
        False, interpret)
    fail = failed[:, 0] > 0.5
    coef = _exact_refit(jnp.asarray(A), jnp.asarray(Bs), coef, alive, fail)
    return _to_solution(coef, alive, m), fail


def lace_fused_solve(A, Bs, max_residual: float = math.inf,
                     max_increase: float = math.inf, sparsity: int = 0,
                     interpret: bool = False):
    """Batched LACE via the fused deletion kernel (min-|coefficient|
    selection, parity src/backward.jl:216-275). The accept test's residual
    increase uses the Schur identity δ² = coef_p²/G⁻¹[p,p], which equals
    the reference's delete-and-refit increase exactly in exact arithmetic;
    in f32, near-threshold accept decisions can therefore differ from the
    XLA path's refit-based test by rounding (support-identical on
    well-conditioned problems — the conformance tests' regime).
    Returns (SparseSolution, failed (B,) bool) — a failed instance stops
    deleting (conservative: its support is a superset of the XLA path's)
    and reports True, mirroring fbr_fused_solve.
    """
    n, m = A.shape
    if n < m:
        raise ValueError(f"A must be overdetermined but is ({n}, {m})")
    coef, alive, failed = _bw_fused_call(
        jnp.asarray(A), jnp.asarray(Bs), int(sparsity),
        float(max_residual) ** 2, float(max_increase) ** 2,
        True, interpret)
    fail = failed[:, 0] > 0.5
    coef = _exact_refit(jnp.asarray(A), jnp.asarray(Bs), coef, alive, fail)
    return _to_solution(coef, alive, m), fail


def supported_backward(A, Bs) -> bool:
    """Shape gate for the fused backward kernel on hardware: f32 input
    (the kernel computes in f32 — an f64 call must take the dtype-
    preserving XLA fallback), lane-aligned m, and the (m, m) Gram inverse
    (shared block + private scratch copy) must fit VMEM with headroom.
    n never enters the kernel (the Cholesky init runs in XLA outside),
    so it is unconstrained."""
    n, m = A.shape
    if A.dtype != jnp.float32 or Bs.ndim != 2 or m % 128 or m < 128:
        return False
    return 2 * m * m * 4 < 90 * 1024 * 1024

"""Whole-solve fused Fast SBL kernel (Pallas TPU), one instance per program.

FSBL (Tipping & Faul 2003; parity /root/reference/src/sbl.jl:145-223) is a
sequence of greedy add/delete/re-estimate actions on the per-atom
sparsity/quality factors S, Q with an explicitly tracked C^-1 (n x n).
Composed in XLA each action re-stages the dictionary AND C^-1 through HBM;
fused, the whole optimization runs in one launch with the transposed
dictionary, C^-1, S, Q, alpha all pinned in VMEM:

  per action: action deltas (elementwise over m), argmax, aligned-slab
  column extraction from the transposed dictionary (free — no one-hot
  GEMM), v = C^-1 a as two MXU matvecs (row and column form; C^-1 is
  symmetric), rank-one C^-1 downdate, Av = v'A (MXU), S/Q rank-one
  updates — the exact update_SQC!/update_C_inverse! math
  (src/sbl.jl:347-365).

Kernel shape discipline (learned the hard way — docs/DESIGN.md §3b): the
grid is (B,) with ONE instance per program so every op inside the while
body is 2D. The earlier all-batch formulation carried (B, n, n) ops inside
the loop body, which HANGS the Mosaic compile at n >= 256 and loses to XLA
even where it compiles; the per-instance form is the same restructure that
made the fused backward kernel viable (ops/fused_backward.py).

Precision: EVERYTHING is f32 including all GEMMs (the SBL family is not
precision-tolerant — see cstpu.models.sbl._f32_matmuls); Mosaic lowers f32
dot_general as 3-pass bf16 with f32-level fidelity. Initialization uses
the empty-active-set closed form (C^-1 = I/sigma^2), so no in-kernel
factorization is needed; the posterior mean is extracted outside the
kernel from the returned alpha.

Status: interpret-mode conformant vs the XLA path (incl. a delete-heavy
correlated-dictionary case, tests/test_fused_solve.py), and hardware-
validated 2026-08-18 (benchmarks/fsbl_kernel_ab.py: max|fused-xla| <=
4.7e-3, recovery 1.0 at n in {128, 256}, m=1024). But the timing LOST:
fused fsbl 204-260 ms/8-batch vs XLA 42-46 ms; fused rmps 102-136 ms vs
XLA 38-40 ms. The per-action serial chain cannot feed the MXU the way the
atom-sharded XLA path's batched GEMMs do, so `fsbl_batch`/`rmps_batch`
keep the XLA path unless `fused=True` (kept for the VMEM-resident regime
and as a second implementation for conformance cross-checks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cstpu.models.sbl import (_delta_add, _delta_delete, _delta_update,
                              _get_sq, _optimal_alpha)

INT_MAX = jnp.iinfo(jnp.int32).max
F32 = jnp.float32


@jax.jit
def _transpose_and_norms(A):
    """A' (f32) and squared column norms, computed once per solve and fed
    to every outer-iteration launch of the RMPS kernel."""
    AT = A.astype(F32).T
    return AT, jnp.sum(AT * AT, axis=1)[None, :]


def _rank1_sqc_update(AT_ref, Cinv, S, Q, i_scr, s_scr, i, gamma, S_i, Q_i):
    """Rank-one C^-1/S/Q correction for atom i with prior-variance change
    `gamma` ((1, 1); 0 = no-op). The Mosaic-sensitive primitive shared by
    the FSBL and RMPS kernels: aligned-slab column extraction from the
    transposed dictionary (base = (i//8)*8, 8-row masked reduce — a
    one-hot GEMM would cost as much MXU as the correlation), v = C^-1 a as
    two MXU matvecs (C^-1 symmetric; a transpose inside the while body
    hangs the Mosaic compile), scalar staging through s_scr (Mosaic cannot
    broadcast a (1, 1) vector into both sublanes and lanes), then the
    downdates. Parity: update_SQC!/update_C_inverse! (src/sbl.jl:347-365).
    Returns the clamped selected index as a true scalar."""
    m = AT_ref.shape[0]
    off = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    i_scr[:, :] = jnp.minimum(i, m - 1)
    ib = i_scr[0, 0]
    base = (ib // 8) * 8
    blk = AT_ref[pl.ds(base, 8), :]                          # (8, n)
    acol = jnp.sum(blk * (off == ib - base).astype(F32), axis=0,
                   keepdims=True)                            # (1, n)
    v = lax.dot_general(acol, Cinv[:, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=F32)          # (1, n)
    vcol = lax.dot_general(Cinv[:, :], acol, (((1,), (1,)), ((), ())),
                           preferred_element_type=F32)       # (n, 1)
    denom = 1.0 / jnp.where(gamma != 0, gamma, 1.0) + S_i
    dinv = jnp.where(gamma != 0, 1.0 / denom, 0.0)           # (1, 1)
    s_scr[:, 0:1] = dinv
    ds = s_scr[0, 0]
    Cinv[:, :] = Cinv[:, :] - vcol * (v * ds)
    Av = lax.dot_general(v, AT_ref[:, :], (((1,), (1,)), ((), ())),
                         preferred_element_type=F32)         # (1, m)
    S[:, :] = S[:, :] - dinv * Av * Av
    Q[:, :] = Q[:, :] - dinv * Av * Q_i
    return ib


def _fsbl_kernel(sigma2: float, maxiter: int, min_increase: float,
                 AT_ref, cn2_ref, b_ref,
                 alpha_ref,
                 Cinv, S, Q, alpha, i_scr, s_scr):
    m, n = AT_ref.shape

    # empty-active-set closed form: C = sigma^2 I  (src/sbl.jl:73-87)
    ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    Cinv[:, :] = (ii == jj).astype(F32) / sigma2
    S[:, :] = cn2_ref[:, :] / sigma2
    Q[:, :] = lax.dot_general(b_ref[0], AT_ref[:, :],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=F32) / sigma2
    alpha[:, :] = jnp.full((1, m), jnp.inf, F32)

    col_iota = lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def gather(x, oh):
        return jnp.sum(jnp.where(oh > 0, x, 0.0), axis=1, keepdims=True)

    def body(carry):
        t, _run = carry

        # --- best action over all atoms (src/sbl.jl:165-176) ------------
        s, q = _get_sq(S[:, :], Q[:, :], alpha[:, :])
        active = jnp.isfinite(alpha[:, :])
        relevant = s < q * q
        alphan = _optimal_alpha(s, q)
        d = jnp.where(~active & relevant, _delta_add(S[:, :], Q[:, :]),
            jnp.where(active & ~relevant,
                      _delta_delete(S[:, :], Q[:, :], alpha[:, :]),
            jnp.where(active & relevant,
                      _delta_update(S[:, :], Q[:, :], alpha[:, :], alphan),
                      0.0)))
        d = jnp.where(jnp.isnan(d), 0.0, d)
        dmax = jnp.max(d, axis=1, keepdims=True)                 # (1, 1)
        i = jnp.min(jnp.where(d == dmax, col_iota, INT_MAX),
                    axis=1, keepdims=True)
        ok = dmax > 0
        okf = ok.astype(F32)

        oh = (col_iota == i).astype(F32)
        act_i = gather(active.astype(F32), oh) > 0.5
        rel_i = gather(relevant.astype(F32), oh) > 0.5
        a_i = gather(jnp.where(active, alpha[:, :], 0.0), oh)
        a_i = jnp.where(act_i, a_i, jnp.inf)
        an_i = gather(jnp.where(relevant, alphan, 0.0), oh)
        S_i = gather(S[:, :], oh)
        Q_i = gather(Q[:, :], oh)

        gamma_change = jnp.where(~act_i & rel_i, 1.0 / an_i,
                       jnp.where(act_i & ~rel_i, -1.0 / a_i,
                       jnp.where(act_i & rel_i,
                                 1.0 / an_i - 1.0 / a_i, 0.0)))
        gamma_change = gamma_change * okf
        new_alpha_i = jnp.where(rel_i, an_i, jnp.inf)

        # gamma_change is already zeroed when no action is beneficial, so
        # the shared rank-one update degenerates to a no-op then
        _rank1_sqc_update(AT_ref, Cinv, S, Q, i_scr, s_scr,
                          i, gamma_change, S_i, Q_i)
        alpha[:, :] = jnp.where((oh > 0) & ok, new_alpha_i, alpha[:, :])

        run = (dmax >= min_increase).astype(F32)
        return t + 1, run

    def cond(carry):
        t, run = carry
        return (t < maxiter) & (jnp.min(run) > 0.5)

    lax.while_loop(cond, body, (jnp.int32(0), jnp.ones((1, 1), F32)))
    alpha_ref[0, :, :] = alpha[:, :]


@partial(jax.jit, static_argnames=("sigma2", "maxiter", "min_increase",
                                   "interpret"))
def _fsbl_fused_call(A, Bs, sigma2: float, maxiter: int,
                     min_increase: float, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    AT = A.astype(F32).T  # materialized once outside the kernel
    Bs = Bs.astype(F32)
    cn2 = jnp.sum(AT * AT, axis=1)[None, :]

    alpha = pl.pallas_call(
        partial(_fsbl_kernel, sigma2, maxiter, min_increase),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((m, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),     # shared A'
            pl.BlockSpec((1, m), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),     # shared col norms
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # this instance's b
        ],
        out_specs=[pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, 1, m), F32)],
        scratch_shapes=[
            pltpu.VMEM((n, n), F32),           # C^-1
            pltpu.VMEM((1, m), F32),           # S
            pltpu.VMEM((1, m), F32),           # Q
            pltpu.VMEM((1, m), F32),           # alpha
            pltpu.VMEM((1, 1), jnp.int32),     # selected atom
            pltpu.VMEM((1, 128), F32),         # scalar staging
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * maxiter * n * (m + 2 * n),
            bytes_accessed=m * n * 4 + 2 * B * (n + m) * 4,
            transcendentals=3 * B * maxiter * m,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(AT, cn2, Bs[:, None, :])[0]
    return alpha[:, 0, :]


def fsbl_fused_solve(A, Bs, sigma, maxiter: int | None = None,
                     min_increase: float = 1e-6, interpret: bool = False):
    """Batched FSBL via the whole-solve fused kernel (scalar noise only).

    Returns the dense posterior-mean weights (B, m) — semantics of
    `vmap(cstpu.fsbl)`. Parity: src/sbl.jl:145-223.
    """
    from cstpu.models.sbl import _posterior_mean

    n, m = A.shape
    maxiter = int(maxiter if maxiter is not None else 2 * m)
    sigma2 = float(sigma)
    alpha = _fsbl_fused_call(jnp.asarray(A), jnp.asarray(Bs), sigma2,
                             maxiter, float(min_increase), interpret)
    return jax.vmap(lambda al, bb: _posterior_mean(A, bb, sigma2, al))(
        alpha, jnp.asarray(Bs))


# ---------------------------------------------------------------------------
# RMPS: staged coordinate ascent, one OUTER iteration per kernel launch
# ---------------------------------------------------------------------------

def _rmps_kernel(sigma2: float, maxiter_acq: int, maxiter_del: int,
                 min_increase: float,
                 AT_ref, cn2_ref, b_ref, alpha_in_ref, done_in_ref,
                 alpha_ref, done_ref,
                 Cinv, S, Q, alpha, old1, i_scr, s_scr, d_scr, c_scr):
    """One outer RMPS iteration (parity src/sbl.jl:381-406 body):
    refresh S/Q/C^-1 from the incoming alpha, acquisition to exhaustion,
    then the deletion/update stage — flattened into ONE while loop as a
    three-stage state machine (Mosaic handles a single scf.while; the
    XLA path's nested while loops would be nested scf regions).

    The refresh (the XLA path's `_init_sq` re-factorization) is done by
    re-ADDING each active atom to the empty-set closed form with the same
    rank-one Woodbury update the stages use — mathematically exact, no
    in-kernel Cholesky. Stage state lives in an i32 scratch row
    (c_scr: [stage, refresh ptr, in-stage counter, pending-adds flag]);
    the kernel returns the updated alpha plus a done flag (done1 | done2 —
    the outer loop's convergence test), and the host wrapper drives outer
    iterations. Already-converged instances skip the launch entirely
    (pl.when on the incoming flag) and copy their state through.
    """
    m, n = AT_ref.shape
    done_flag = done_in_ref[0, 0, 0]

    @pl.when(done_flag > 0.5)
    def _copy_through():
        alpha_ref[0, :, :] = alpha_in_ref[0]
        done_ref[0, :, :] = done_in_ref[0]

    @pl.when(done_flag <= 0.5)
    def _solve():
        # ---- prologue: empty-active-set closed form + stage reset ------
        ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        Cinv[:, :] = (ii == jj).astype(F32) / sigma2
        S[:, :] = cn2_ref[:, :] / sigma2
        Q[:, :] = lax.dot_general(b_ref[0], AT_ref[:, :],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=F32) / sigma2
        alpha[:, :] = alpha_in_ref[0]
        old1[:, :] = alpha_in_ref[0]
        d_scr[:, :] = done_in_ref[0]
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        c_scr[:, :] = jnp.where(lane == 1, -1, 0)  # stage=0, ptr=-1,
        #                                            cnt=0, pend=0

        col_iota = lax.broadcasted_iota(jnp.int32, (1, m), 1)

        def gather(x, oh):
            return jnp.sum(jnp.where(oh > 0, x, 0.0), axis=1,
                           keepdims=True)

        def allsame(x, y):
            return jnp.min(jnp.where(x == y, 1.0, 0.0), axis=1,
                           keepdims=True)

        def body(carry):
            t, _run = carry
            stage = c_scr[0, 0]
            ptr = c_scr[0, 1]
            cnt = c_scr[0, 2]
            pend = c_scr[0, 3]
            is_ref = stage == 0
            is_acq = stage == 1
            is_del = stage == 2

            # --- per-atom quantities (src/sbl.jl:195-201) ---------------
            s, q = _get_sq(S[:, :], Q[:, :], alpha[:, :])
            active = jnp.isfinite(alpha[:, :])
            relevant = s < q * q
            an_all = _optimal_alpha(s, q)

            # --- stage candidates --------------------------------------
            # refresh: next active atom after ptr (re-add, gamma=1/alpha)
            rsel = active & (col_iota > ptr)
            ref_i = jnp.min(jnp.where(rsel, col_iota, INT_MAX),
                            axis=1, keepdims=True)               # (1, 1)
            have_ref = ref_i < INT_MAX
            # acquisition: best delta_add among passive relevant
            # (sbl.jl:226-246)
            val = jnp.where(~active & relevant,
                            _delta_add(S[:, :], Q[:, :]), 0.0)
            vmax = jnp.max(val, axis=1, keepdims=True)
            ka = jnp.min(jnp.where(val == vmax, col_iota, INT_MAX),
                         axis=1, keepdims=True)
            do_add = vmax > 0
            # deletion: min q^2/s among active irrelevant (sbl.jl:413-425)
            dv = jnp.where(active & ~relevant, q * q / s, jnp.inf)
            dvmin = jnp.min(dv, axis=1, keepdims=True)
            kd = jnp.min(jnp.where(dv == dvmin, col_iota, INT_MAX),
                         axis=1, keepdims=True)
            do_del = dvmin < 1
            # re-estimate: best delta_update among active relevant
            uv = jnp.where(active & relevant,
                           _delta_update(S[:, :], Q[:, :], alpha[:, :],
                                         an_all),
                           0.0)
            umax = jnp.max(uv, axis=1, keepdims=True)
            ku = jnp.min(jnp.where(uv == umax, col_iota, INT_MAX),
                         axis=1, keepdims=True)
            do_upd = ~do_del & (umax > 0)
            upd_gain = jnp.where(do_upd, umax, 0.0)

            # --- stage-gated action selection --------------------------
            acq_lim = cnt >= maxiter_acq
            del_lim = cnt >= maxiter_del
            ref_act = is_ref & have_ref
            add_act = is_acq & do_add & ~acq_lim
            del_act = is_del & do_del & ~del_lim
            upd_act = is_del & do_upd & ~del_lim
            i = jnp.where(ref_act, ref_i,
                jnp.where(is_acq, ka, jnp.where(do_del, kd, ku)))

            oh = (col_iota == i).astype(F32)
            a_i = gather(jnp.where(active, alpha[:, :], 0.0), oh)
            a_i = jnp.where(gather(active.astype(F32), oh) > 0.5, a_i,
                            jnp.inf)
            an_i = gather(jnp.where(relevant, an_all, 0.0), oh)
            S_i = gather(S[:, :], oh)
            Q_i = gather(Q[:, :], oh)

            gamma = jnp.where(ref_act, 1.0 / a_i,
                    jnp.where(add_act, 1.0 / an_i,
                    jnp.where(del_act, -1.0 / a_i,
                    jnp.where(upd_act, 1.0 / an_i - 1.0 / a_i, 0.0))))
            new_alpha_i = jnp.where(add_act | upd_act, an_i,
                          jnp.where(del_act, jnp.inf, a_i))

            ib = _rank1_sqc_update(AT_ref, Cinv, S, Q, i_scr, s_scr,
                                   i, gamma, S_i, Q_i)
            any_act = ref_act | add_act | del_act | upd_act
            alpha[:, :] = jnp.where((oh > 0) & any_act, new_alpha_i,
                                    alpha[:, :])

            # --- transitions (computed on post-update alpha) ------------
            leave_ref = is_ref & ~have_ref
            leave_acq = is_acq & (~do_add | acq_lim)
            done1 = leave_acq & (allsame(alpha[:, :],
                                         alpha_in_ref[0]) > 0.5)
            stop_del = ~do_del & (upd_gain < min_increase)
            leave_del = is_del & (stop_del | del_lim)
            # a capped acquisition that left a beneficial add pending has
            # NOT converged even if deletion changes nothing: right after
            # an optimal add the re-estimate gain is exactly zero in exact
            # arithmetic, so without the pend guard done2 would ride a
            # +-ulp sign (see models/sbl.py _rmps_optimize)
            done2 = leave_del & (allsame(alpha[:, :], old1[:, :]) > 0.5) \
                & (pend == 0)

            # snapshot old1 = post-acquisition alpha entering deletion
            enter_del = leave_acq & ~done1
            old1[:, :] = jnp.where(enter_del, alpha[:, :], old1[:, :])

            stage_new = jnp.where(leave_ref, 1,
                                  jnp.where(enter_del, 2, stage))
            cnt_new = jnp.where(leave_ref | leave_acq, 0, cnt + 1)
            # ib (a true scalar staged through i_scr) equals the refresh
            # index whenever ref_act holds: the m-1 clamp only binds for
            # INT_MAX
            ptr_new = jnp.where(ref_act, ib, ptr)
            # at leave_acq, do_add is exactly "a beneficial add remains on
            # the post-acquisition state" (the acq_lim branch; the ~do_add
            # branch stores 0)
            pend_new = jnp.where(leave_acq, do_add.astype(jnp.int32),
                                 pend)
            c_scr[:, :] = jnp.where(lane == 0, stage_new,
                          jnp.where(lane == 1, ptr_new,
                          jnp.where(lane == 2, cnt_new,
                          jnp.where(lane == 3, pend_new, 0))))

            done = (done1 | done2).astype(F32)                   # (1, 1)
            d_scr[:, 0:1] = jnp.maximum(d_scr[:, 0:1], done)
            run = jnp.where(done1 | leave_del, 0.0, 1.0).astype(F32)
            return t + 1, run

        def cond(carry):
            t, run = carry
            return (t < m + maxiter_acq + maxiter_del + 3) & \
                (jnp.min(run) > 0.5)

        lax.while_loop(cond, body, (jnp.int32(0), jnp.ones((1, 1), F32)))
        alpha_ref[0, :, :] = alpha[:, :]
        done_ref[0, :, :] = d_scr[:, :]


@partial(jax.jit, static_argnames=("sigma2", "maxiter_acq", "maxiter_del",
                                   "min_increase", "interpret"))
def _rmps_outer_call(AT, cn2, Bs, alpha, done, sigma2: float,
                     maxiter_acq: int, maxiter_del: int,
                     min_increase: float, interpret: bool = False):
    # AT/cn2 are precomputed ONCE by rmps_fused_solve — transposing and
    # squaring the dictionary per outer-iteration launch was pure waste
    m, n = AT.shape
    B = Bs.shape[0]

    alpha_out, done_out = pl.pallas_call(
        partial(_rmps_kernel, sigma2, maxiter_acq, maxiter_del,
                min_increase),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((m, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),     # shared A'
            pl.BlockSpec((1, m), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),     # shared col norms
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # this instance's b
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # incoming alpha
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # incoming done flag
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, 1, m), F32),
                   jax.ShapeDtypeStruct((B, 1, 128), F32)],
        scratch_shapes=[
            pltpu.VMEM((n, n), F32),           # C^-1
            pltpu.VMEM((1, m), F32),           # S
            pltpu.VMEM((1, m), F32),           # Q
            pltpu.VMEM((1, m), F32),           # alpha
            pltpu.VMEM((1, m), F32),           # old1 (post-acquisition)
            pltpu.VMEM((1, 1), jnp.int32),     # selected atom
            pltpu.VMEM((1, 128), F32),         # scalar staging
            pltpu.VMEM((1, 128), F32),         # done flag
            pltpu.VMEM((1, 128), jnp.int32),   # stage / ptr / counter
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (maxiter_acq + maxiter_del) * n * (m + 2 * n),
            bytes_accessed=m * n * 4 + 2 * B * (n + 2 * m) * 4,
            transcendentals=4 * B * (maxiter_acq + maxiter_del) * m,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(AT, cn2, Bs[:, None, :], alpha[:, None, :],
      done[:, None, :])
    return alpha_out[:, 0, :], done_out[:, 0, :]


def rmps_fused_solve(A, Bs, sigma, maxiter: int | None = None,
                     maxiter_acquisition: int | None = None,
                     maxiter_deletion: int | None = None,
                     min_increase: float = 1e-6, interpret: bool = False):
    """Batched RMPS via the per-instance fused kernel (scalar noise only).

    One kernel launch per OUTER iteration (refresh + acquisition +
    deletion stages run in-kernel); the host loop stops when every
    instance reports convergence — semantics of `vmap(cstpu.rmps)`.
    Parity: src/sbl.jl:373-406 (incl. the alpha reset at optimize! entry,
    :386-387, via the all-inf initial alpha).
    """
    from cstpu.models.sbl import _posterior_mean

    n, m = A.shape
    maxiter = int(maxiter if maxiter is not None else n)
    maxiter_acq = int(maxiter_acquisition
                      if maxiter_acquisition is not None else n)
    maxiter_del = int(maxiter_deletion
                      if maxiter_deletion is not None else n)
    sigma2 = float(sigma)
    A = jnp.asarray(A)
    Bs = jnp.asarray(Bs).astype(F32)
    B = Bs.shape[0]
    AT, cn2 = _transpose_and_norms(A)
    alpha = jnp.full((B, m), jnp.inf, F32)
    done = jnp.zeros((B, 128), F32)
    for _ in range(maxiter):
        alpha, done = _rmps_outer_call(AT, cn2, Bs, alpha, done, sigma2,
                                       maxiter_acq, maxiter_del,
                                       float(min_increase), interpret)
        if bool(jnp.all(done[:, 0] > 0.5)):
            break
    return jax.vmap(lambda al, bb: _posterior_mean(A, bb, sigma2, al))(
        alpha, Bs)


def supported_fsbl(A, Bs, sigma) -> bool:
    """VMEM gate: the transposed f32 dictionary plus ONE (n, n) C^-1 (the
    kernel runs one instance per grid program) must fit with headroom."""
    n, m = A.shape
    if Bs.ndim != 2:
        return False
    if n % 8 or m % 128:
        return False
    if jnp.ndim(jnp.asarray(sigma)) != 0:
        return False  # full covariance takes the XLA path
    vmem = n * m * 4 + n * n * 4 + 6 * m * 4 + 3 * n * 4
    return vmem < 90 * 1024 * 1024


def supported_rmps(A, Bs, sigma) -> bool:
    """Same VMEM/shape gate as the FSBL kernel. The RMPS kernel carries
    a little more state per program — the old1 (1, m) scratch, the
    incoming alpha/done blocks and second output (~2m floats), plus three
    (1, 128) scratch rows — all well inside the 10 MB headroom the gate
    already leaves (the dominant terms, A' and C^-1, are identical)."""
    n, m = A.shape
    if not supported_fsbl(A, Bs, sigma):
        return False
    extra = 3 * m * 4 + 3 * 128 * 4
    vmem = n * m * 4 + n * n * 4 + 6 * m * 4 + 3 * n * 4 + extra
    return vmem < 90 * 1024 * 1024

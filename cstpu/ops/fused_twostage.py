"""Whole-solve fused two-stage pursuit kernels (Pallas TPU).

The two-stage/replacement algorithms need what the greedy kernels in
cstpu.ops.fused_solve do not: support DELETION. With the inverse-Gram
representation a deletion is a rank-one Schur downdate — with q = Ginv e_p
and qpp = q_p,

    Ginv'  =  Ginv - q q' / qpp   (+ e_p e_p' to restore the identity pad)

zeroes row/column p exactly and leaves the inverse of the remaining active
Gram, all in (B, K, K)-shaped broadcasts: no solves, no data-dependent
shapes. Appends go to the first free slot (a per-instance one-hot), so the
support can develop holes and refill them. `_Engine` packages this
add/delete/refit machinery as closures over a kernel's VMEM refs; the
SP / SRR / OMPR kernels are thin drivers over it, exactly as the
reference's two-stage algorithms are thin drivers over the forward/
backward step machinery (src/twostage.jl:19-31, :75-83, :134-180).

Per-instance convergence is a done latch; every outer loop is an in-kernel
while_loop that exits as soon as the whole batch is done, so the
reference's generous maxiter defaults (16k for SP, n for OMPR) cost
nothing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cstpu.ops.fused_solve import (_degeneracy_rtol, _extract_cols,
                                   _to_solution)

INT_MAX = jnp.iinfo(jnp.int32).max
F32 = jnp.float32


class _Engine:
    """In-kernel slot engine over VMEM refs (see module docstring).

    Required refs: A (n,m), Bs (B,n), cols (B,K,n), Ginv (B,K,K),
    idxs (B,K) i32 (m = inactive sentinel), coefs (B,K), Atbs (B,K),
    r (B,n). Optional tracked state:
      * amask (B,m): dense active-atom marker (selection masking)
      * resc (B,m) + cn2 (1,m): forward-regression rescaling, maintained
        through appends AND deletions by the order-recursive identities
        (see cstpu.ops.fused_solve._fr_kernel and _srr driver below).
    """

    def __init__(self, A_ref, Bs_ref, cols, Ginv, idxs, coefs, Atbs, r,
                 amask=None, resc=None, cn2_ref=None, AT_ref=None,
                 i_scr=None, acol_scr=None):
        self.A, self.Bs = A_ref, Bs_ref
        self.AT, self.i_scr, self.acol_scr = AT_ref, i_scr, acol_scr
        self.cols, self.Ginv = cols, Ginv
        self.idxs, self.coefs, self.Atbs, self.r = idxs, coefs, Atbs, r
        self.amask, self.resc, self.cn2 = amask, resc, cn2_ref
        self.B, self.n = Bs_ref.shape
        self.m = A_ref.shape[1]
        self.K = idxs.shape[1]
        self.cdt = A_ref.dtype
        self.deg = _degeneracy_rtol(self.n)
        self.col_iota = lax.broadcasted_iota(jnp.int32, (self.B, self.m), 1)
        self.slot_iota = lax.broadcasted_iota(jnp.int32, (1, self.K), 1)
        self.BIG = jnp.int32(self.K + 1)

    def init(self):
        B, K = self.B, self.K
        self.r[:, :] = self.Bs[:, :]
        self.cols[:, :, :] = jnp.zeros_like(self.cols)
        ii = lax.broadcasted_iota(jnp.int32, (B, K, K), 1)
        jj = lax.broadcasted_iota(jnp.int32, (B, K, K), 2)
        self.Ginv[:, :, :] = (ii == jj).astype(F32)
        self.Atbs[:, :] = jnp.zeros_like(self.Atbs)
        self.coefs[:, :] = jnp.zeros_like(self.coefs)
        self.idxs[:, :] = jnp.full_like(self.idxs, self.m)
        if self.amask is not None:
            self.amask[:, :] = jnp.zeros_like(self.amask)
        if self.resc is not None:
            self.resc[:, :] = jnp.broadcast_to(self.cn2[0:1, :],
                                               (B, self.m))

    def corr(self, x):
        """(x @ A) with f32 accumulation — the workhorse MXU GEMM."""
        return lax.dot_general(x.astype(self.cdt), self.A[:, :],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)

    def gram_diag(self):
        ii = lax.broadcasted_iota(jnp.int32, (1, self.K, self.K), 1)
        jj = lax.broadcasted_iota(jnp.int32, (1, self.K, self.K), 2)
        return jnp.sum(self.Ginv[:, :, :] * (ii == jj).astype(F32), axis=2)

    def rnorm2(self):
        return jnp.sum(self.r[:, :] * self.r[:, :], axis=1, keepdims=True)

    def argmax_masked(self, sc):
        """(i, max) of sc (B, m), lowest index on ties."""
        smax = jnp.max(sc, axis=1, keepdims=True)
        i = jnp.min(jnp.where(sc == smax, self.col_iota, INT_MAX),
                    axis=1, keepdims=True)
        return i, smax

    def nactive(self):
        """Active-slot count per instance (B, 1) f32."""
        return jnp.sum((self.idxs[:, :] < self.m).astype(F32), axis=1,
                       keepdims=True)

    def forward_score(self):
        """OLS forward-selection candidate: argmax of q^2 / energetic norm
        with degenerate (resc <= rtol * ||a||^2) and active atoms masked
        (parity src/forward.jl:74-81). Requires resc/amask tracking.
        Returns (i, dmax) — the shared scoring of the SRR/RMP/FoBa
        kernels; keep it here so the three drivers cannot diverge."""
        q = self.corr(self.r[:, :])
        rmin = self.deg * self.cn2[0:1, :]
        d2 = jnp.where(self.resc[:, :] > rmin, q * q / self.resc[:, :],
                       jnp.float32(-jnp.inf))
        d2 = jnp.where(self.amask[:, :] > 0, 0.0, d2)
        return self.argmax_masked(d2)

    def backward_min(self):
        """Backward-deletion candidate: min coef^2 / gamma over active
        slots with gamma = diag(Ginv) (parity src/backward.jl:69-83).
        Returns (slot p, dmin) — shared by the SRR/RMP/FoBa kernels."""
        d2 = jnp.where(self.idxs[:, :] < self.m,
                       self.coefs[:, :] * self.coefs[:, :]
                       / jnp.maximum(self.gram_diag(), 1e-30), jnp.inf)
        dmin = jnp.min(d2, axis=1, keepdims=True)
        p = jnp.min(jnp.where(d2 == dmin, self.slot_iota, self.BIG),
                    axis=1, keepdims=True)
        return p, dmin

    def append(self, i, gate):
        """Append atom i (B,1) at each instance's first free slot; exact
        no-op where `gate` is False, the atom is already active, capacity
        is exhausted, or the atom is numerically inside the active span.
        Returns the per-instance accept mask (B,1) bool."""
        if self.AT is not None:      # aligned dynamic slices (fast path)
            self.i_scr[:, :] = i
            _extract_cols(self.AT, self.i_scr, self.acol_scr, self.B)
            acol = self.acol_scr[:, :]                           # (B, n)
        else:                        # one-hot GEMM (reads all of A)
            oh = (self.col_iota == i).astype(self.cdt)
            acol = lax.dot_general(oh, self.A[:, :],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=F32)   # (B, n)
        fs = jnp.min(jnp.where(self.idxs[:, :] >= self.m, self.slot_iota,
                               self.BIG), axis=1, keepdims=True)
        dup = jnp.sum((self.idxs[:, :] == i).astype(F32), axis=1,
                      keepdims=True) > 0
        ata = jnp.sum(acol * acol, axis=1, keepdims=True)
        beta = jnp.sum(acol * self.Bs[:, :], axis=1, keepdims=True)
        g = jnp.sum(self.cols[:, :, :] * acol[:, None, :], axis=2)
        u = jnp.sum(self.Ginv[:, :, :] * g[:, None, :], axis=2)
        d = ata - jnp.sum(g * u, axis=1, keepdims=True)
        ok = gate & (~dup) & (fs < self.BIG) & (d > self.deg * ata)
        okf = ok.astype(F32)
        et = (self.slot_iota == fs).astype(F32) * okf            # (B, K)
        dinv = okf / jnp.where(d > 0, d, 1.0)
        s = dinv * (beta - jnp.sum(g * self.coefs[:, :], axis=1,
                                   keepdims=True))

        w = u - et
        self.Ginv[:, :, :] = self.Ginv[:, :, :] \
            + dinv[:, :, None] * w[:, :, None] * w[:, None, :] \
            - et[:, :, None] * et[:, None, :] * okf[:, :, None]
        self.coefs[:, :] = self.coefs[:, :] - s * w
        self.Atbs[:, :] = self.Atbs[:, :] + beta * et
        self.idxs[:, :] = jnp.where(et > 0,
                                    jnp.broadcast_to(i, (self.B, self.K)),
                                    self.idxs[:, :])
        self.cols[:, :, :] = self.cols[:, :, :] \
            + acol[:, None, :] * et[:, :, None]
        if self.amask is not None:
            self.amask[:, :] = self.amask[:, :] \
                + (self.col_iota == i).astype(F32) * okf
        if self.resc is not None:
            # order-recursive OLS rescaling: the appended orthonormal
            # direction q = a_perp/sqrt(d) removes (q'a_j)^2 from every
            # energetic norm (src/forward.jl:100-114 semantics)
            aperp = acol - jnp.sum(self.cols[:, :, :] * u[:, :, None],
                                   axis=1)
            z = self.corr(aperp)
            self.resc[:, :] = self.resc[:, :] - dinv * z * z
        return ok

    def delete_ep(self, ep, hasf):
        """Remove the slots marked by the one-hot `ep` (B,K) f32 (gated by
        hasf (B,1) f32): Schur downdate + state clears; the dual
        rescaling identity runs first when rescaling is tracked."""
        qv = jnp.sum(self.Ginv[:, :, :] * ep[:, None, :], axis=2)
        qpp = jnp.sum(qv * ep, axis=1, keepdims=True)
        inv = hasf / jnp.where(qpp > 0, qpp, 1.0)
        if self.resc is not None:
            # deleting atom p frees v = A_S Ginv e_p, the unique span(S)
            # direction orthogonal to S\{p}: resc_j += (v'a_j)^2/gamma_pp
            v = jnp.sum(self.cols[:, :, :] * qv[:, :, None], axis=1)
            z = self.corr(v)
            self.resc[:, :] = self.resc[:, :] + inv * z * z
        if self.amask is not None:
            di = jnp.sum(self.idxs[:, :] * (ep > 0).astype(jnp.int32),
                         axis=1, keepdims=True)
            self.amask[:, :] = jnp.maximum(
                self.amask[:, :] - (self.col_iota == di).astype(F32) * hasf,
                0.0)
        self.Ginv[:, :, :] = self.Ginv[:, :, :] \
            - inv[:, :, None] * qv[:, :, None] * qv[:, None, :] \
            + ep[:, :, None] * ep[:, None, :]
        self.idxs[:, :] = jnp.where(ep > 0, self.m, self.idxs[:, :])
        self.Atbs[:, :] = self.Atbs[:, :] * (1.0 - ep)
        self.cols[:, :, :] = self.cols[:, :, :] * (1.0 - ep)[:, :, None]

    def refit_residual(self):
        self.coefs[:, :] = jnp.sum(
            self.Ginv[:, :, :] * self.Atbs[:, :][:, None, :], axis=2)
        fitted = jnp.sum(self.cols[:, :, :] * self.coefs[:, :][:, :, None],
                         axis=1)
        self.r[:, :] = self.Bs[:, :] - fitted

    def oblivious_init(self, k: int):
        """Top-k |A'b| acquisition (oblivious_acquisition!,
        src/matchingpursuit.jl:207-216) + refit."""
        self.init()
        sc0 = jnp.abs(self.corr(self.Bs[:, :]))

        def one(_, sc):
            i, smax = self.argmax_masked(sc)
            sc = jnp.where(self.col_iota == i, -jnp.inf, sc)
            self.append(i, smax > -jnp.inf)
            return sc

        lax.fori_loop(0, k, one, sc0)
        self.refit_residual()


def _outer_while(eng, maxiter: int, body_inner):
    """Run `body_inner(gate) -> done_update (B,1)` until every instance is
    done or maxiter; carries (t, prev_rnorm2, done). Returns the executed
    iteration count (the batch runs until its SLOWEST instance latches —
    the number that explains wall-clock)."""
    prev0 = eng.rnorm2()

    def body(carry):
        t, prev, done = carry
        res, done2 = body_inner(done < 0.5, prev, done)
        return t + 1, res, done2

    def cond(carry):
        t, prev, done = carry
        return (t < maxiter) & (jnp.min(done) < 0.5)

    t, _, _ = lax.while_loop(cond, body,
                             (jnp.int32(0), prev0,
                              jnp.zeros((eng.B, 1), F32)))
    return t


# ---------------------------------------------------------------------------
# Subspace Pursuit (parity src/twostage.jl:42-107)
# ---------------------------------------------------------------------------

def _sp_kernel(k: int, maxiter: int, delta2: float, ablate: str,
               A_ref, AT_ref, Bs_ref, idx_ref, coef_ref, r_ref,
               iters_ref, cols, GU, W, S, Ginv11, Atbs, coefs,
               ucoef, idxs, r, i_scr, acol_scr):
    """SP: expand by the top-k residual correlations, LS-refit on <= 2k
    atoms, prune to the k largest |coefficients|, iterate while the
    residual improves (the final pruned iterate is kept either way,
    src/twostage.jl:92-99).

    Block-partitioned design (v3). The v2 kernel ran ~3k sequential
    rank-one rounds per outer iteration on (B, 2k, 2k)/(B, 2k, n)
    buffers (bordered appends, Schur-downdate deletions, permutation of
    the inverse) — the whole cost of the kernel at config-2 sizes. v3
    exploits the 2x2 block structure the compacted layout induces
    (kept block 0..k-1, acquired block k..2k-1):

      * selection keeps a lexicographic (value, index) cursor instead of
        masking the score buffer: top-k with NO (B, m) writes and one
        fewer sweep per pick, same picks bit-for-bit;
      * the union inverse is never materialized: with W = Ginv11 G12 and
        the Schur complement S = G22 - G12' W (each ONE batched MXU GEMM
        off a single pass over the column cache), the k bordered rounds
        invert S on (B, k, k) buffers — 4x smaller than v2's — with the
        same per-atom degeneracy gates, and the union refit is three
        (B, k, k) mat-vecs: x2 = Sinv (a2 - W'a1), x1 = Ginv11 a1 - W x2;
      * pruning never downdates: after the compaction permutation (cols/
        idxs/Atbs only — the inverse is NOT permuted), the kept-block
        inverse is rebuilt FRESH from its (B, k, k) Gram, exactly as the
        reference refactorizes each iteration (src/twostage.jl:104-107);
      * the column cache stays f32: a (B, 1, n) bf16 slice store does
        not legalize in Mosaic (sublane packing), so the bf16-cache
        variant is off the table for now.

    Selection rules, degeneracy gates and the convergence latch are v2's
    exactly; only the arithmetic route to the same quantities changed.
    """
    B, n = Bs_ref.shape
    m = A_ref.shape[1]
    K2 = idxs.shape[1]
    cdt = A_ref.dtype
    deg = _degeneracy_rtol(n)
    col_iota = lax.broadcasted_iota(jnp.int32, (B, m), 1)
    slot2 = lax.broadcasted_iota(jnp.int32, (1, K2), 1)
    s2_iota = lax.broadcasted_iota(jnp.int32, (B, K2), 1)
    slotk = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    BIG = jnp.int32(K2 + 1)
    NEG = jnp.float32(-jnp.inf)
    eyek = (lax.broadcasted_iota(jnp.int32, (1, k, k), 1)
            == lax.broadcasted_iota(jnp.int32, (1, k, k), 2)).astype(F32)
    # half-selection one-hots: (B, K2) <-> (B, k) block moves ride tiny
    # GEMMs because Mosaic cannot lane-slice at a non-128 offset (the
    # k:2k half); sublane (middle-dim) slices of the 3D buffers are fine
    ik = lax.broadcasted_iota(jnp.int32, (k, K2), 0)
    iK = lax.broadcasted_iota(jnp.int32, (k, K2), 1)
    E1 = (ik == iK).astype(F32)            # (k, K2): picks slots 0..k-1
    E2 = (ik + k == iK).astype(F32)        # (k, K2): picks slots k..2k-1

    def dotf32(a, b, dims):
        """f32-operand dot_general at HIGHEST precision: Mosaic's default
        matmul runs ONE bf16 pass, which silently rounds every f32 Gram/
        Schur entry and every GEMM-permuted value to bf16 — on hardware
        this took planted-support recovery from 1.0 to 0.0 while
        interpret mode (exact f32) stayed green. HIGH (3-pass) is not
        implemented in the Pallas Mosaic lowering ("Unsupported dot
        precision"), so HIGHEST it is; one-hot-operand GEMMs whose data
        factor is bf16-exact (the rank GEMM) ride DEFAULT instead. The
        correlation GEMM stays bf16 by DESIGN (corr_dtype)."""
        return lax.dot_general(a, b, dims, preferred_element_type=F32,
                               precision=lax.Precision.HIGHEST)

    def dotbf(a, b, dims):
        """DEFAULT-precision (one bf16 pass) dot_general for operands
        whose CONTENT is bf16-exact — and with corr_dtype=bf16 the
        column cache is: every cached entry is extracted from the bf16
        dictionary (exact through the f32 staging), the gating
        multiplies by 1.0/0.0, and the compaction GEMM itself is a
        one-hot selection of those values (single nonzero per output,
        exact at any precision). For such operands the bf16 operand
        rounding is the identity and the f32 accumulation matches
        HIGHEST bit for bit, at 1/6 the MXU passes. Used for: GU, the
        rebuild Gram, and the compaction column GEMM. NOT valid for
        Ginv11/W/S/coefs/Atbs operands (true f32 content). When the
        dictionary is staged at f32 (sp_batch(precision="f32")) the
        cache holds TRUE f32 values, so the one-pass bf16 product would
        silently round the explicitly-requested precision away — fall
        back to HIGHEST there (advisor r4)."""
        if cdt == jnp.bfloat16:
            return lax.dot_general(a, b, dims, preferred_element_type=F32)
        return dotf32(a, b, dims)

    def half(v, E):
        """(B, K2) -> (B, k): v @ E' via dot_general."""
        return dotf32(v, E, (((1,), (1,)), ((), ())))

    def unhalve(x1, x2):
        """(B, k) halves -> (B, K2): x1 @ E1 + x2 @ E2."""
        return (dotf32(x1, E1, (((1,), (0,)), ((), ())))
                + dotf32(x2, E2, (((1,), (0,)), ((), ()))))

    def corr(x):
        return lax.dot_general(x.astype(cdt), A_ref[:, :],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)

    def rnorm2():
        return jnp.sum(r[:, :] * r[:, :], axis=1, keepdims=True)

    def acquire(sc, gate):
        """Top-k of sc into slots k..2k-1 (static stores) with the
        lexicographic cursor: candidate set = {(v, i) strictly below the
        previous pick in (value desc, index asc) order} — identical picks
        to v2's mask-and-re-argmax, without rewriting the score buffer.
        Also records beta = a_i'b into Atbs per accepted pick."""
        def sel(j, carry):
            vprev, iprev = carry
            cand = jnp.where((sc < vprev)
                             | ((sc == vprev) & (col_iota > iprev)),
                             sc, NEG)
            smax = jnp.max(cand, axis=1, keepdims=True)
            i = jnp.min(jnp.where(cand == smax, col_iota, INT_MAX),
                        axis=1, keepdims=True)
            have = smax > NEG
            dup = jnp.sum((idxs[:, :] == i).astype(F32), axis=1,
                          keepdims=True) > 0
            ok = gate & have & ~dup
            okf = ok.astype(F32)
            i_scr[:, :] = i
            _extract_cols(AT_ref, i_scr, acol_scr, B)
            s_ = k + j
            cols[:, pl.ds(s_, 1), :] = (acol_scr[:, :] * okf)[:, None, :]
            beta = jnp.sum(acol_scr[:, :] * Bs_ref[:, :], axis=1,
                           keepdims=True)
            # masked RMW on the tiny (B, K2) buffer: a width-1 LANE-dim
            # store needs a provably-128-aligned offset in Mosaic
            Atbs[:, :] = jnp.where(s2_iota == s_, beta * okf, Atbs[:, :])
            idxs[:, :] = jnp.where(s2_iota == s_,
                                   jnp.where(ok, i, m).astype(jnp.int32),
                                   idxs[:, :])
            # the cursor advances even on duplicate picks (the pick is
            # consumed, exactly as the masked-argmax formulation)
            return (jnp.where(have, smax, NEG),
                    jnp.where(have, i, INT_MAX))

        if "noacq" in ablate:  # phase-ablation timing variant only
            return
        lax.fori_loop(0, k, sel,
                      (jnp.full((B, 1), jnp.inf, F32),
                       jnp.full((B, 1), -1, jnp.int32)))

    def invert_spd(ata, occ, Minv, reject_base: int):
        """Bordered inversion of the SPD matrix in S into Minv ((B,k,k)),
        k gated rank-one rounds: per slot j the Schur pivot d must beat
        deg * ata_j (same accept test as v2's border_one; ata is the
        union-Gram diagonal). Rejected slots keep the identity pad; the
        accumulated rejections clear their support entries at
        reject_base + offset AFTER the loop (one masked write instead of
        k — every op inside this loop costs ~0.3 us of fixed Mosaic
        issue overhead, the kernel's dominant term per the r4 ablation).
        `floor` folds occupancy and the deg*ata threshold into one
        per-slot pivot floor: unoccupied slots get +inf (never accepted,
        never 'rejected')."""
        Minv[:, :, :] = jnp.broadcast_to(eyek, (B, k, k))
        if "noinv" in ablate:  # phase-ablation timing variant only
            return
        floor = jnp.where(occ > 0, deg * ata, jnp.inf)      # (B, k)

        def bstep(j, carry):
            inmask, rejacc = carry
            es = (slotk == j).astype(F32)                   # (1, k)
            srow = jnp.sum(S[:, :, :] * es[:, None, :], axis=2)
            sjj = jnp.sum(srow * es, axis=1, keepdims=True)
            g = srow * inmask
            u = jnp.sum(Minv[:, :, :] * g[:, None, :], axis=2)
            d = sjj - jnp.sum(g * u, axis=1, keepdims=True)
            fj = jnp.sum(jnp.where(es > 0, floor, 0.0), axis=1,
                         keepdims=True)
            ok = d > fj
            okf = ok.astype(F32)
            et = es * okf
            dinv = okf / jnp.where(d > 0, d, 1.0)
            w_ = u - et
            Minv[:, :, :] = Minv[:, :, :] \
                + dinv[:, :, None] * w_[:, :, None] * w_[:, None, :] \
                - et[:, :, None] * et[:, None, :]
            return inmask + et, rejacc + es * (1.0 - okf)

        _, rejacc = lax.fori_loop(0, k, bstep,
                                  (jnp.zeros((B, k), F32),
                                   jnp.zeros((B, k), F32)))
        # rejected = occupied but pivot-failed (unoccupied slots carry
        # floor=inf and land in rejacc too — mask them back out)
        rejected = rejacc * (occ > 0).astype(F32)           # (B, k)
        if reject_base == 0:
            rejfull = unhalve(rejected, jnp.zeros((B, k), F32))
        else:
            rejfull = unhalve(jnp.zeros((B, k), F32), rejected)
        idxs[:, :] = jnp.where(rejfull > 0.5, m, idxs[:, :])

    def build_blocks():
        """GU = cols_union @ cols_new' (ONE cache pass), W = Ginv11 G12,
        S = G22 - G12' W — three batched MXU GEMMs on (B,k,*) tiles."""
        if "noblocks" in ablate:  # phase-ablation timing variant only
            return
        GU[:, :, :] = dotbf(cols[:, :, :], cols[:, k:K2, :],
                            (((2,), (2,)), ((0,), (0,))))
        W[:, :, :] = dotf32(Ginv11[:, :, :], GU[:, 0:k, :],
                            (((2,), (1,)), ((0,), (0,))))
        S[:, :, :] = GU[:, k:K2, :] - dotf32(
            GU[:, 0:k, :], W[:, :, :], (((1,), (1,)), ((0,), (0,))))

    def union_coefs_cg(alive2):
        """Union LS coefficients straight from the blocks:
        x2 solves S x2 = a2 - W'a1 by masked CG (k rounds), then
        x1 = Ginv11 a1 - W x2."""
        av = (idxs[:, :] < m).astype(F32) * Atbs[:, :]
        if "nocg" in ablate:  # phase-ablation timing variant only
            ucoef[:, :] = av
            return
        a1 = half(av, E1)
        a2 = half(av, E2)
        wta1 = jnp.sum(W[:, :, :] * a1[:, :, None], axis=1)
        v = alive2 * (a2 - wta1)
        # NaN-guard lift at a few ulps of diag(S) — NOT deg (= 8n ulps,
        # ~1e-3 relative at n=1024), which perturbed EVERY instance's
        # union coefficients by ~0.1% and could flip prune picks near
        # |coef| ties vs the v2/XLA path (advisor r4). 8 eps keeps f32
        # CG finite on near-dependent new sets while staying below the
        # coefficient-comparison noise floor; any such atom surviving
        # the prune is re-tested exactly by the rebuild pivots.
        lift = (8.0 * 1.1920929e-07) * jnp.max(
            jnp.sum(S[:, :, :] * eyek, axis=2),
            axis=1, keepdims=True)                          # (B, 1)

        rs0 = jnp.sum(v * v, axis=1, keepdims=True)
        # early exit at the f32 noise floor: in exact arithmetic CG
        # terminates within rank(S_alive) iterations with residual 0, so
        # stopping once every instance's residual is below (8 eps)^2 of
        # its start changes nothing the arithmetic can resolve — while
        # the fixed k-trip loop was ~0.14 ms of EVERY round (r5 on-chip
        # ablation) even when the system is well-conditioned and CG is
        # done in a third of the trips.
        thr = (8.0 * 1.1920929e-07) ** 2 * rs0              # (B, 1)

        def cgcond(c):
            _, _, _, rs_, j = c
            return (j < k) & (jnp.max(rs_ - thr) > 0)

        def cgstep(c):
            x2_, r_, p_, rs_, j = c
            Sp = alive2 * (jnp.sum(S[:, :, :] * p_[:, None, :], axis=2)
                           + lift * p_)
            al = rs_ / jnp.maximum(
                jnp.sum(p_ * Sp, axis=1, keepdims=True), 1e-30)
            x2n = x2_ + al * p_
            rn = r_ - al * Sp
            rsn = jnp.sum(rn * rn, axis=1, keepdims=True)
            beta = rsn / jnp.maximum(rs_, 1e-30)
            return x2n, rn, rn + beta * p_, rsn, j + 1

        x2, _, _, _, _ = lax.while_loop(
            cgcond, cgstep,
            (jnp.zeros((B, k), F32), v, v, rs0, jnp.int32(0)))
        x2 = alive2 * x2
        wx2 = jnp.sum(W[:, :, :] * x2[:, None, :], axis=2)
        x1 = jnp.sum(Ginv11[:, :, :] * a1[:, None, :], axis=2) - wx2
        # UNION coefficients go to their own buffer: `coefs` holds only
        # REBUILT (kept-refit) values, so a stability-skipped round can
        # never leak union coefficients into the kernel outputs
        ucoef[:, :] = unhalve(x1, x2)

    def prune_keep():
        """Mask of the k largest |coef| active slots (lowest slot on
        ties) — v2's pick loop on the tiny (B, K2) score."""
        cscore = jnp.where(idxs[:, :] < m, jnp.abs(ucoef[:, :]), NEG)

        def pick(_, carry):
            cs, keep = carry
            cmax = jnp.max(cs, axis=1, keepdims=True)
            p = jnp.min(jnp.where(cs == cmax, slot2, BIG), axis=1,
                        keepdims=True)
            sel = (slot2 == p) & (cmax > NEG)
            return jnp.where(sel, NEG, cs), keep + sel.astype(F32)

        _, keep = lax.fori_loop(0, k, pick,
                                (cscore, jnp.zeros((B, K2), F32)))
        return keep

    def make_perm(keep):
        """Stable compaction permutation: P1[b, dest, src] one-hot over
        dest slots 0..k-1 (kept count <= k). The rank (stable
        destination slot) rides a constant strictly-lower-triangular
        GEMM — the elementwise (B,K2,K2) forms send the Mosaic register
        allocator into a 292 MB spill blowup (bisected via local
        chipless AOT compiles, r4); the identically-shaped dot_generals
        compile in seconds."""
        li = lax.broadcasted_iota(jnp.int32, (K2, K2), 0)
        lj = lax.broadcasted_iota(jnp.int32, (K2, K2), 1)
        LT = (li < lj).astype(F32)                  # LT[t, s] = t < s
        rank = lax.dot_general(keep, LT, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32) + keep - 1.0
        sp_f = slot2.astype(F32)
        P = ((rank[:, None, :] == sp_f[0][None, :, None])
             & (keep[:, None, :] > 0)).astype(F32)          # (B, s', s)
        return P[:, 0:k, :]                         # (B, k, K2)

    def compact(P1):
        """Pack the kept atoms into slots 0..k-1 with one batched
        permutation GEMM over the column cache (+ small sweeps for idxs/
        Atbs); the inverse is NOT permuted here — the caller either
        rebuilds it fresh or maintains it incrementally (r5).
        Idempotent on already-compacted (incl. done) rows."""
        if "nocompact" in ablate:  # phase-ablation timing variant only
            return
        cols[:, 0:k, :] = dotbf(P1, cols[:, :, :],
                                (((2,), (1,)), ((0,), (0,))))
        cols[:, k:K2, :] = jnp.zeros((B, k, n), F32)
        # idx rides as TWO byte lanes (hi*256 + lo): each byte is exact
        # in bf16, so the permutation GEMM is bitwise exact at ANY matmul
        # precision; Atbs rides an f32 lane at HIGHEST
        idf = idxs[:, :]
        hi = (idf // 256).astype(F32)
        lo = (idf % 256).astype(F32)
        lane = lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        X = jnp.where(lane == 0, hi[:, :, None],
                      jnp.where(lane == 1, lo[:, :, None],
                                jnp.where(lane == 2, Atbs[:, :][:, :, None],
                                          jnp.where(lane == 3, 1.0, 0.0))))
        Y = dotf32(P1, X, (((2,), (1,)), ((0,), (0,))))   # (B, k, 128)
        nidx_k = (jnp.sum(Y * (lane == 0), axis=2) * 256.0
                  + jnp.sum(Y * (lane == 1), axis=2))     # (B, k)
        natb_k = jnp.sum(Y * (lane == 2), axis=2)
        rsum_k = jnp.sum(Y * (lane == 3), axis=2)         # = 1 - pad
        idxs[:, :] = (unhalve(nidx_k + jnp.float32(m) * (1.0 - rsum_k),
                              jnp.full((B, k), jnp.float32(m)))
                      ).astype(jnp.int32)
        Atbs[:, :] = unhalve(natb_k, jnp.zeros((B, k), F32))

    def refit_kept():
        """Final refit + residual off the (maintained or rebuilt)
        kept-block inverse."""
        a1 = half((idxs[:, :] < m).astype(F32) * Atbs[:, :], E1)
        x1 = jnp.sum(Ginv11[:, :, :] * a1[:, None, :], axis=2)
        coefs[:, :] = unhalve(x1, jnp.zeros((B, k), F32))
        fitted = jnp.sum(cols[:, :, :] * coefs[:, :][:, :, None], axis=1)
        r[:, :] = Bs_ref[:, :] - fitted

    def rebuild_kept():
        """Fresh (B,k,k) Gram + inversion of the compacted kept block
        (the reference refactorizes every iteration too,
        src/twostage.jl:104-107), then the final refit + residual.

        The inversion tries Newton-Schulz first (r5): 10 unrolled
        X <- 2X - X S X steps from the Gershgorin-scaled identity — all
        batched (B,k,k) MXU GEMMs instead of the k-round bordered loop
        whose ~14 sequential VPU ops/round were 71% of the solve (the
        r5 ablation). NS at 10 steps converges to the 3e-5 residual
        gate only for kappa(S) <~ 90 (residual r_t = r_0^(2^t),
        r_0 = 1 - 1/kappa), and every pivot ratio of such a block is
        >= 1/kappa >> deg ~ 1e-3 — i.e. the exact bordered path would
        reject NOTHING there, so accepting NS preserves the degeneracy
        contract bit-for-decision. Any instance failing the gate sends
        the whole batch down the exact bordered fallback (identical to
        pre-r5 behavior, including per-atom rejections)."""
        if "norebuild" in ablate:  # phase-ablation timing variant only
            return
        S[:, :, :] = dotbf(cols[:, 0:k, :], cols[:, 0:k, :],
                           (((2,), (2,)), ((0,), (0,))))
        ata1 = jnp.sum(S[:, :, :] * eyek, axis=2)
        occ1 = half((idxs[:, :] < m).astype(F32), E1)
        use_ns = "nons" not in ablate
        if use_ns:
            occo = occ1[:, :, None] * occ1[:, None, :]
            pad = eyek * ((1.0 - occ1)[:, :, None]
                          * (1.0 - occ1)[:, None, :])
            Sm = S[:, :, :] * occo + pad
            lam_hi = jnp.max(jnp.sum(jnp.abs(Sm), axis=2), axis=1)
            X = eyek / jnp.maximum(lam_hi, 1e-30)[:, None, None]
            for _ in range(10):
                SX = dotf32(Sm, X, (((2,), (1,)), ((0,), (0,))))
                X = 2.0 * X - dotf32(X, SX, (((2,), (1,)), ((0,), (0,))))
            R = jnp.broadcast_to(eyek, (B, k, k)) - dotf32(
                Sm, X, (((2,), (1,)), ((0,), (0,))))
            resid = jnp.max(jnp.abs(R))          # batch-max residual
            ns_ok = resid < 3e-5

            @pl.when(ns_ok)
            def _():
                Ginv11[:, :, :] = X

            @pl.when(jnp.logical_not(ns_ok))
            def _():
                invert_spd(ata1, occ1, Ginv11, 0)
        else:
            invert_spd(ata1, occ1, Ginv11, 0)
        # a kept atom the inversion REJECTED has its idx cleared to m,
        # but its cached column must be zeroed too: next round's GEMM-
        # built blocks (GU/W/S) cannot mask slots the way v2's bordered
        # math did, so a stale column would multiply the identity-padded
        # Ginv11 row and subtract a spurious rank-one term from S,
        # corrupting the degeneracy pre-gate and union coefficients
        # (advisor r4). Surviving occupancy re-read AFTER invert_spd.
        occ_live = half((idxs[:, :] < m).astype(F32), E1)   # (B, k)
        cols[:, 0:k, :] = cols[:, 0:k, :] * occ_live[:, :, None]
        refit_kept()

    def incremental_update(P1, dropped1, surv, newk_, maxnew):
        """Maintain Ginv11 across rounds instead of re-inverting
        (VERDICT r4 item 2: the k-round rebuild inversion was 71% of
        the forced-iteration solve per the r5 on-chip ablation, while a
        converged round actually changes 0-3 slots). Three stages, all
        on (B,k,*) tiles:

          1. Schur DOWNDATES of the atoms the prune dropped (old slot
             coordinates; drops <= new kept atoms per the prune's
             top-k rule): Ginv' = Ginv - Ginv[:,j] Ginv[j,:] / Ginv[j,j]
             with the freed row/col reset to the identity pad.
          2. PERMUTE to the compacted coordinates: the compaction is
             stable, so survivors keep their relative order and
             Ginv_c = P1k Ginv P1k' (two GEMMs; identity pads restored
             on the vacated diagonal).
          3. Bordered APPENDS of only the new kept atoms (compacted
             prefix slots surv..surv+new-1), with invert_spd's EXACT
             per-atom pivot accept test (d > deg * ||a||^2) against the
             maintained inverse — the degeneracy contract that lets the
             full rebuild re-test everything is preserved for every
             atom ENTERING the support; a rejected append clears its
             idx AND zeroes its cached column (advisor r4 rule).

        Survivors are not re-tested (they each passed an exact pivot
        test when they entered, and deletions cannot create
        degeneracy); the full rebuild_kept path still runs whenever a
        round replaces more than k/4 slots (incl. the init round), so
        the maintained chain is short and re-anchored."""
        # fresh compacted Gram: appends read their S rows from it, and
        # it doubles as the ||a||^2 diagonal for the pivot floor
        S[:, :, :] = dotbf(cols[:, 0:k, :], cols[:, 0:k, :],
                           (((2,), (2,)), ((0,), (0,))))
        slotk_f = slotk.astype(F32)                   # (1, k)
        BIGK = jnp.int32(k + 1)

        # -- 1. downdates (old coordinates), one dropped slot per round
        def ddbody(dmask):
            p = jnp.min(jnp.where(dmask > 0, slotk, BIGK), axis=1,
                        keepdims=True)                # (B, 1)
            es = (slotk == p).astype(F32)             # zero if none left
            gate = jnp.sum(es * dmask, axis=1, keepdims=True)
            es = es * dmask                           # only real drops
            Mj = jnp.sum(Ginv11[:, :, :] * es[:, None, :], axis=2)
            dj = jnp.sum(Mj * es, axis=1, keepdims=True)
            dinv = gate / jnp.where(jnp.abs(dj) > 1e-30, dj, 1.0)
            G2 = Ginv11[:, :, :] - dinv[:, :, None] * Mj[:, :, None] \
                * Mj[:, None, :]
            # freed row/col back to the identity pad
            keep_rc = (1.0 - es)
            Ginv11[:, :, :] = G2 * keep_rc[:, :, None] * keep_rc[:, None, :] \
                + eyek * es[:, :, None] * es[:, None, :]
            return dmask * (1.0 - es)

        lax.while_loop(lambda dm: jnp.max(dm) > 0, ddbody, dropped1)

        # -- 2. permute survivors into the compacted prefix
        P1k = P1[:, :, 0:k]                           # (B, dest, old src)
        G1 = dotf32(P1k, Ginv11[:, :, :], (((2,), (1,)), ((0,), (0,))))
        Gp = dotf32(G1, P1k, (((2,), (2,)), ((0,), (0,))))
        ns = (slotk_f >= surv).astype(F32)            # vacated slots
        Ginv11[:, :, :] = Gp + eyek * ns[:, :, None] * ns[:, None, :]

        # -- 3. bordered appends of the new kept atoms, in slot order
        inmask0 = (slotk_f < surv).astype(F32)        # (B, k) survivors

        def apbody(carry):
            a, inmask = carry
            a_f = a.astype(F32)
            es = ((slotk_f == surv + a_f)
                  & (a_f < newk_)).astype(F32)        # (B, k)
            gate = jnp.sum(es, axis=1, keepdims=True)
            srow = jnp.sum(S[:, :, :] * es[:, None, :], axis=2)
            sjj = jnp.sum(srow * es, axis=1, keepdims=True)
            g = srow * inmask
            u = jnp.sum(Ginv11[:, :, :] * g[:, None, :], axis=2)
            d = sjj - jnp.sum(g * u, axis=1, keepdims=True)
            ok = (d > deg * sjj) & (gate > 0)         # exact pivot test
            okf = ok.astype(F32)
            et = es * okf
            dinv = okf / jnp.where(d > 0, d, 1.0)
            w_ = u - et
            Ginv11[:, :, :] = Ginv11[:, :, :] \
                + dinv[:, :, None] * w_[:, :, None] * w_[:, None, :] \
                - et[:, :, None] * et[:, None, :]
            # rejected append: clear support entry + zero cached column
            rej = es * (1.0 - okf) * gate
            rejfull = unhalve(rej, jnp.zeros((B, k), F32))
            idxs[:, :] = jnp.where(rejfull > 0.5, m, idxs[:, :])
            cols[:, 0:k, :] = cols[:, 0:k, :] * (1.0 - rej[:, :, None])
            return a + 1, inmask + et

        lax.while_loop(lambda c: c[0] < maxnew, apbody,
                       (jnp.int32(0), inmask0))
        refit_kept()

    def sp_round(sc, gate):
        """One expand-refit-prune round. Returns the per-instance
        STABILITY flag (B, 1) f32: the pruned support equals the
        instance's pre-acquisition support, so every later iteration
        would be identical — the algorithmic convergence signal (the
        reference detects the same fixed point one iteration later via
        residual non-improvement). When the WHOLE batch is stable, the
        compaction + rebuild (87% of the round per the r4 on-chip
        ablation: the two bordered-inversion loops) are skipped
        outright: `coefs`/`r`/`idxs` still hold the previous round's
        rebuild of the SAME support — bitwise what this round would
        recompute."""
        active_pre = (idxs[:, :] < m).astype(F32)
        acquire(sc, gate)
        build_blocks()
        ata2 = jnp.sum(GU[:, k:K2, :] * eyek, axis=2)       # diag(G22)
        occ2 = (idxs[:, k:K2] < m).astype(F32)
        # Sinv's ONLY consumer is the single mat-vec x2 = Sinv v, so the
        # 32-round bordered inversion (~28 ops/round — the r4 ablation's
        # top cost) is replaced by: (a) an exact S_jj pre-gate for new
        # atoms degenerate against the KEPT block (same deg * ||a||^2
        # rule; S_jj IS the exact Schur pivot against the kept set), and
        # (b) a masked CG solve of S x2 = v (~8 ops/round, k rounds =
        # exact in exact arithmetic; tiny diagonal lift keeps f32 CG
        # NaN-free if the NEW set itself is near-dependent — any such
        # atom that survives the prune is then re-tested EXACTLY by the
        # rebuild inversion's per-atom pivots, so the degeneracy
        # contract holds end to end).
        sdiag = jnp.sum(S[:, :, :] * eyek, axis=2)          # (B, k)
        okj = (occ2 > 0) & (sdiag > deg * ata2)
        rejfull = unhalve(jnp.zeros((B, k), F32),
                          ((occ2 > 0) & ~okj).astype(F32))  # (B, K2)
        idxs[:, :] = jnp.where(rejfull > 0.5, m, idxs[:, :])
        union_coefs_cg(okj.astype(F32))
        keep = prune_keep()
        firsthalf = (s2_iota < k).astype(F32)
        stable = 1.0 - jnp.max(jnp.abs(keep - active_pre * firsthalf),
                               axis=1, keepdims=True)       # (B, 1)
        all_stable = jnp.min(stable) > 0.5
        if "force" in ablate:  # ablation timing: never skip the rebuild
            all_stable = jnp.bool_(False)

        @pl.when(jnp.logical_not(all_stable))
        def _():
            P1 = make_perm(keep)
            # per-instance survivor / new-atom counts BEFORE compaction
            surv = jnp.sum(keep * active_pre * firsthalf, axis=1,
                           keepdims=True)                    # (B, 1)
            newk_ = jnp.sum(keep * (1.0 - firsthalf), axis=1,
                            keepdims=True)                   # (B, 1)
            dropped1 = half(active_pre * firsthalf * (1.0 - keep), E1)
            compact(P1)
            maxnew = jnp.max(newk_).astype(jnp.int32)
            # full fresh inversion when the round replaces more than k/4
            # slots (incl. the init round, where everything is new) —
            # re-anchors the maintained inverse; otherwise the
            # incremental path pays O(changes) rounds instead of k
            use_full = maxnew > (k // 4)
            if "noincr" in ablate:  # A/B: force the full path
                use_full = jnp.bool_(True)

            @pl.when(use_full)
            def _():
                rebuild_kept()

            @pl.when(jnp.logical_not(use_full))
            def _():
                incremental_update(P1, dropped1, surv, newk_, maxnew)

        @pl.when(all_stable)
        def _():
            # the acquisition already wrote this round's picks into slots
            # k..2k-1; stability means the prune discards ALL of them, so
            # the skipped compaction still owes their support-entry reset
            # (coefs/r/first-half idxs are the previous rebuild's values
            # for the identical support and stay untouched)
            idxs[:, :] = jnp.where(s2_iota < k, idxs[:, :], m)

        return stable

    # --- init: oblivious top-k acquisition (kept block empty) ------------
    r[:, :] = Bs_ref[:, :]
    cols[:, :, :] = jnp.zeros_like(cols)
    Ginv11[:, :, :] = jnp.broadcast_to(eyek, (B, k, k))
    Atbs[:, :] = jnp.zeros_like(Atbs)
    coefs[:, :] = jnp.zeros_like(coefs)
    idxs[:, :] = jnp.full_like(idxs, m)
    ucoef[:, :] = jnp.zeros_like(ucoef)
    sp_round(jnp.abs(corr(Bs_ref[:, :])), jnp.ones((B, 1), bool))

    # --- outer loop -------------------------------------------------------
    prev0 = rnorm2()

    def wbody(carry):
        t, prev, done = carry
        gate = done < 0.5
        stable = sp_round(jnp.abs(corr(r[:, :])), gate)
        res = jnp.where(gate, rnorm2(), prev)
        # an instance latches on residual non-improvement (reference
        # rule, src/twostage.jl:92-99) OR on support stability — the
        # same fixed point detected one iteration earlier
        done2 = jnp.where((res <= delta2) | (prev <= res)
                          | (stable > 0.5), 1.0, done)
        return t + 1, res, done2

    def wcond(carry):
        t, prev, done = carry
        if "force" in ablate:  # ablation timing: fixed outer count
            return t < maxiter
        return (t < maxiter) & (jnp.min(done) < 0.5)

    t, _, _ = lax.while_loop(wcond, wbody,
                             (jnp.int32(0), prev0, jnp.zeros((B, 1), F32)))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]
    iters_ref[:, :] = jnp.full((1, 1), t, jnp.int32)


@partial(jax.jit, static_argnames=("k", "maxiter", "delta2", "corr_dtype",
                                   "interpret", "ablate"))
def _sp_fused_call(A, Bs, k: int, maxiter: int, delta2: float, corr_dtype,
                   interpret: bool = False, ablate: str = ""):
    n, m = A.shape
    B = Bs.shape[0]
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(F32)
    K2 = 2 * k

    return pl.pallas_call(
        partial(_sp_kernel, k, maxiter, delta2, ablate),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B, K2), jnp.int32),
            jax.ShapeDtypeStruct((B, K2), F32),
            jax.ShapeDtypeStruct((B, n), F32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),   # iterations run
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K2, n), F32),       # cols
            pltpu.VMEM((B, K2, k), F32),       # GU = [G12; G22]
            pltpu.VMEM((B, k, k), F32),        # W = Ginv11 G12
            pltpu.VMEM((B, k, k), F32),        # S (Schur / kept Gram)
            pltpu.VMEM((B, k, k), F32),        # Ginv11 (kept block)
            pltpu.VMEM((B, K2), F32),          # Atb
            pltpu.VMEM((B, K2), F32),          # coef (kept refit)
            pltpu.VMEM((B, K2), F32),          # ucoef (union scratch)
            pltpu.VMEM((B, K2), jnp.int32),    # idx
            pltpu.VMEM((B, n), F32),           # r
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), F32),           # extracted columns
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs)


def sp_fused_solve(A, Bs, k: int, delta: float = 1e-12,
                   maxiter: int | None = None, corr_dtype=jnp.bfloat16,
                   interpret: bool = False, return_iters: bool = False,
                   ablate: str = ""):
    """Batched subspace pursuit via the whole-solve fused kernel.

    Parity: src/twostage.jl:42-107, including the 16k maxiter default —
    the in-kernel while loop exits as soon as every instance in the batch
    has converged, so the bound costs nothing. Returns
    (SparseSolution, residuals).
    """
    n, m = A.shape
    k = int(k)
    if 2 * k > n:
        raise ValueError(f"2k = {2*k} > {n} = len(b) is invalid for SP")
    if m >= 1 << 24:
        # compact()'s permutation GEMM round-trips atom indices through
        # f32 lanes — exact only below 2^24. The VMEM budget rejects such
        # m long before this, but the index-exactness contract must not
        # depend on an unrelated guard (mirrors the omp_sharded_fused gate)
        raise ValueError(f"sp_fused_solve needs m < 2^24 for exact index "
                         f"bookkeeping, got m = {m}")
    maxiter = int(maxiter if maxiter is not None else 16 * k)
    idx, coef, r, iters = _sp_fused_call(jnp.asarray(A), jnp.asarray(Bs),
                                         k, maxiter, float(delta) ** 2,
                                         corr_dtype, interpret, ablate)
    sol = _to_solution(idx, coef, m)
    if return_iters:
        return sol, r, iters[0, 0]
    return sol, r


def supported_sp(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused SP kernel (2k-slot column cache + the v3
    block buffers: GU (B,2k,k) and four (B,k,k) tiles)."""
    n, m = A.shape
    B = Bs.shape[0]
    K2 = 2 * int(k)
    if n % 8 or m % 128 or B % 8 or K2 > n:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (2 * n * m * itemsize + B * K2 * n * 4
            + 2 * B * n * 4 + B * m * 4 * 2
            + 6 * B * K2 * int(k) * 4)
    return vmem < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# OMP with Replacement (parity src/twostage.jl:110-202)
# ---------------------------------------------------------------------------

def _ompr_kernel(k: int, maxiter: int, delta2: float, eta: float,
                 A_ref, AT_ref, Bs_ref, idx_ref, coef_ref, r_ref,
                 iters_ref, cols, Ginv, Atbs, coefs, idxs, r, amask, i_scr,
                 acol_scr):
    """OMPR: select the best PASSIVE atom by |eta A'r| (for passive atoms
    the reference's gradient score x + eta A'r reduces to eta A'r — no
    dense scatter needed), append it, gradient-step every active
    coefficient (coef += eta a_s'r, a lane reduction over the cached
    columns — no gathers), delete the min-|coefficient| slot, LS-refit.
    Stops on no-passive-atom, residual <= delta, or no improvement."""
    eng = _Engine(A_ref, Bs_ref, cols, Ginv, idxs, coefs, Atbs, r,
                  amask=amask, AT_ref=AT_ref, i_scr=i_scr,
                  acol_scr=acol_scr)
    m = eng.m
    slot_iota, BIG = eng.slot_iota, eng.BIG

    eng.oblivious_init(k)

    def body_inner(gate, prev, done):
        q = eng.corr(r[:, :])
        sc = jnp.where(amask[:, :] > 0, -jnp.inf, jnp.abs(eta * q))
        i, best = eng.argmax_masked(sc)
        change = best > 0                       # twostage.jl:153 bail-out
        # the reference's gradient iterate Ar = x + eta A'r is built from
        # the PRE-append solution (src/twostage.jl:163-168; the appended
        # atom scores eta * a_i'r since its coefficient is zero), but
        # _Engine.append refits coefs to the expanded-support LS solution
        # — snapshot the pre-append coefficients first
        coef_pre = coefs[:, :] * (idxs[:, :] < m).astype(F32)
        ok = eng.append(i, gate & change)
        okf = ok.astype(F32)

        # gradient step on all active slots: coef_pre + eta * (a_s' r)
        # (r is still the pre-append residual; cols now includes the new
        # column, whose pre-append coefficient is zero)
        act = (idxs[:, :] < m).astype(F32)
        gr = jnp.sum(cols[:, :, :] * r[:, :][:, None, :], axis=2)
        gcoef = jnp.where(ok, (coef_pre + eta * gr) * act, coefs[:, :])

        # delete the min-|gradient-coefficient| slot
        d2 = jnp.where((idxs[:, :] < m) & (okf > 0), jnp.abs(gcoef),
                       jnp.inf)
        dmin = jnp.min(d2, axis=1, keepdims=True)
        p = jnp.min(jnp.where(d2 == dmin, slot_iota, BIG), axis=1,
                    keepdims=True)
        hasf = (ok & (dmin < jnp.inf)).astype(F32)
        ep = (slot_iota == p).astype(F32) * hasf
        eng.delete_ep(ep, hasf)
        eng.refit_residual()

        res = jnp.where(gate & ok, eng.rnorm2(), prev)
        done2 = jnp.where((~change) | (res <= delta2) | (prev <= res),
                          1.0, done)
        return res, done2

    t = _outer_while(eng, maxiter, body_inner)

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]
    iters_ref[:, :] = jnp.full((1, 1), t, jnp.int32)


@partial(jax.jit, static_argnames=("k", "maxiter", "delta2", "eta",
                                   "corr_dtype", "interpret"))
def _ompr_fused_call(A, Bs, k: int, maxiter: int, delta2: float, eta: float,
                     corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(F32)
    K = k + 1

    return pl.pallas_call(
        partial(_ompr_kernel, k, maxiter, delta2, eta),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), F32),
            jax.ShapeDtypeStruct((B, n), F32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),   # iterations run
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, n), F32),
            pltpu.VMEM((B, K, K), F32),
            pltpu.VMEM((B, K), F32),
            pltpu.VMEM((B, K), F32),
            pltpu.VMEM((B, K), jnp.int32),
            pltpu.VMEM((B, n), F32),
            pltpu.VMEM((B, m), F32),           # active mask
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), F32),           # extracted columns
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs)


def ompr_fused_solve(A, Bs, k: int, delta: float, eta: float = 1.0,
                     maxiter: int | None = None, corr_dtype=jnp.bfloat16,
                     interpret: bool = False, return_iters: bool = False):
    """Batched OMPR via the whole-solve fused kernel.

    Parity: src/twostage.jl:110-202. Returns (SparseSolution, residuals);
    with return_iters also the executed outer-iteration count (the batch
    runs until its slowest instance latches)."""
    n, m = A.shape
    k = int(k)
    maxiter = int(maxiter if maxiter is not None else n)
    idx, coef, r, iters = _ompr_fused_call(
        jnp.asarray(A), jnp.asarray(Bs), k, maxiter, float(delta) ** 2,
        float(eta), corr_dtype, interpret)
    sol = _to_solution(idx, coef, m)
    if return_iters:
        return sol, r, iters[0, 0]
    return sol, r


def supported_ompr(A, Bs, k: int, corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused OMPR kernel ((k+1)-slot state + (B,m))."""
    n, m = A.shape
    B = Bs.shape[0]
    K = int(k) + 1
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (2 * n * m * itemsize + B * K * n * 4
            + 2 * B * n * 4 + B * m * 4 * 3 + B * K * K * 4)
    return vmem < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Stepwise Regression with Replacement (parity src/twostage.jl:3-33)
# ---------------------------------------------------------------------------

def _srr_kernel(k: int, l: int, maxiter: int, delta2: float,
                A_ref, AT_ref, Bs_ref, cn2_ref, idx_ref, coef_ref, r_ref,
                cols, Ginv, Atbs, coefs, idxs, r, resc, amask, i_scr,
                acol_scr):
    """SRR: oblivious k-atom init, then alternate up to l forward-
    regression steps (OLS rule with order-recursive rescaling, see
    cstpu.ops.fused_solve._fr_kernel) and backward deletions back to k
    atoms (min coef^2/gamma with gamma = diag(Ginv), parity
    src/backward.jl:69-83); the rescaling survives deletions via the dual
    identity implemented in _Engine.delete_ep. Outer while exits when
    every instance's residual stops improving (final iterate kept, as in
    src/twostage.jl:19-31)."""
    eng = _Engine(A_ref, Bs_ref, cols, Ginv, idxs, coefs, Atbs, r,
                  amask=amask, resc=resc, cn2_ref=cn2_ref, AT_ref=AT_ref,
                  i_scr=i_scr, acol_scr=acol_scr)
    m = eng.m
    slot_iota = eng.slot_iota

    def forward_step(gate):
        i, dmax = eng.forward_score()
        # the reference's accept rule also stops at n atoms
        # (src/forward.jl:57: nnz(x) < size(P.A, 1)); without it an
        # over-provisioned k+l > n run would rely on the f32 degeneracy
        # test alone once the active set spans R^n
        ok = eng.append(i, gate & (eng.rnorm2() > 0) & (dmax > 0)
                        & (eng.nactive() < float(min(eng.n, m))))
        eng.refit_residual()
        return ok

    def backward_step(gate):
        p, dmin = eng.backward_min()
        hasf = (gate & (dmin < jnp.inf)).astype(F32)
        ep = (slot_iota == p).astype(F32) * hasf
        eng.delete_ep(ep, hasf)
        eng.refit_residual()

    eng.oblivious_init(k)

    def body_inner(gate, prev, done):
        def fwd(_, fgate):
            ok = forward_step(fgate > 0.5)
            return fgate * ok.astype(F32)

        lax.fori_loop(0, l, fwd, gate.astype(F32))

        def bwd(_, __):
            over = jnp.sum((idxs[:, :] < m).astype(F32), axis=1,
                           keepdims=True) > float(k)
            backward_step(gate & over)
            return 0

        lax.fori_loop(0, l, bwd, 0)

        res = jnp.where(gate, eng.rnorm2(), prev)
        return res, jnp.where((res <= delta2) | (prev <= res), 1.0, done)

    _outer_while(eng, maxiter, body_inner)

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("k", "l", "maxiter", "delta2",
                                   "corr_dtype", "interpret"))
def _srr_fused_call(A, Bs, k: int, l: int, maxiter: int, delta2: float,
                    corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(F32)
    cn2 = jnp.sum(A.astype(F32) * A.astype(F32), axis=0)[None, :]
    K = k + l

    return pl.pallas_call(
        partial(_srr_kernel, k, l, maxiter, delta2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), F32),
            jax.ShapeDtypeStruct((B, n), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, n), F32),        # cols
            pltpu.VMEM((B, K, K), F32),        # Ginv
            pltpu.VMEM((B, K), F32),           # Atb
            pltpu.VMEM((B, K), F32),           # coef
            pltpu.VMEM((B, K), jnp.int32),     # idx
            pltpu.VMEM((B, n), F32),           # r
            pltpu.VMEM((B, m), F32),           # rescaling
            pltpu.VMEM((B, m), F32),           # active mask
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), F32),           # extracted columns
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs, cn2)


def srr_fused_solve(A, Bs, k: int, delta: float = 1e-12,
                    maxiter: int | None = None, l: int = 1,
                    corr_dtype=jnp.bfloat16, interpret: bool = False):
    """Batched SRR via the whole-solve fused kernel (oblivious init).

    Parity: src/twostage.jl:3-33 with initialization=1; other init modes
    take the XLA path. Returns (SparseSolution, residuals).
    """
    n, m = A.shape
    k = int(k)
    l = int(l)
    maxiter = int(maxiter if maxiter is not None else 4 * k)
    idx, coef, r = _srr_fused_call(jnp.asarray(A), jnp.asarray(Bs), k, l,
                                   maxiter, float(delta) ** 2, corr_dtype,
                                   interpret)
    return _to_solution(idx, coef, m), r


def supported_srr(A, Bs, k: int, l: int = 1,
                  corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused SRR kernel ((k+l)-slot state + 2 (B,m))."""
    n, m = A.shape
    B = Bs.shape[0]
    K = int(k) + int(l)
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (2 * n * m * itemsize + B * K * n * 4
            + 2 * B * n * 4 + B * m * 4 * 4 + B * K * K * 4)
    return vmem < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# RMP (zero-noise limit) and FoBa (parity src/stepwise.jl:5-56)
# ---------------------------------------------------------------------------

def _rmp_kernel(K: int, maxiter: int, delta2: float, kfinal: int,
                A_ref, AT_ref, Bs_ref, cn2_ref,
                idx_ref, coef_ref, r_ref, capped_ref,
                cols, Ginv, Atbs, coefs, idxs, r, resc, amask, i_scr,
                acol_scr):
    """RMP with a K-slot cap: forward regression to exhaustion (accept
    while the best squared decrease beats delta^2 — the reference's
    min_decrease rule, src/forward.jl:56-72), then backward deletions
    (accept while the squared increase stays below delta^2 for the delta
    variant, or down to `kfinal` atoms for the k variant,
    src/stepwise.jl:5-42), iterated up to maxiter outer passes with a
    no-step-accepted stationarity latch (the fused analog of the
    reference's isapprox(x_prev, x) detection). `capped_ref` reports
    instances whose forward stage wanted an atom beyond the K slots — the
    caller re-solves those on the uncapped XLA path, so the cap never
    changes semantics."""
    eng = _Engine(A_ref, Bs_ref, cols, Ginv, idxs, coefs, Atbs, r,
                  amask=amask, resc=resc, cn2_ref=cn2_ref, AT_ref=AT_ref,
                  i_scr=i_scr, acol_scr=acol_scr)
    B, m = eng.B, eng.m
    slot_iota = eng.slot_iota
    delta2 = jnp.float32(delta2)

    eng.init()
    capped_ref[:, :] = jnp.zeros_like(capped_ref)
    # exhaustion floor (8 sqrt(n) ulps of ||b||, squared): the XLA
    # forward stages gate on normr > exhaustion_floor(A, b) in
    # exhaustion mode (models/forward.py) — once the fit is exact to
    # rounding, the OLS score is a 0/0 that favors degenerate atoms
    bn2 = jnp.sum(Bs_ref[:, :] * Bs_ref[:, :], axis=1, keepdims=True)
    floor2 = jnp.float32(64.0 * eng.n * (1.1920929e-07 ** 2)) * bn2

    def forward_step(gate):
        """One gated forward step; returns (still-advancing, capped)."""
        i, dmax = eng.forward_score()
        nat = eng.nactive()
        # the XLA accept rule also stops at min(n, m) atoms
        # (src/forward.jl:60: nnz < n and capacity); only a rejection
        # caused purely by the K-slot cap counts as capped
        wanted = gate & (eng.rnorm2() > floor2) & (dmax > delta2) \
            & (nat < float(min(eng.n, m)))
        full = nat >= float(K)
        ok = eng.append(i, wanted & ~full)
        eng.refit_residual()
        return ok, wanted & full

    def backward_step(gate):
        """One gated backward deletion; returns accepted mask (B,1)."""
        p, dmin = eng.backward_min()
        if kfinal >= 0:      # k variant: delete down to kfinal atoms
            acc = gate & (eng.nactive() > float(kfinal)) & (dmin < jnp.inf)
        else:                # delta variant: while increase < delta^2
            acc = gate & (dmin < delta2)
        hasf = acc.astype(F32)
        ep = (slot_iota == p).astype(F32) * hasf
        eng.delete_ep(ep, hasf)
        eng.refit_residual()
        return acc

    def stage(step, gate0):
        """Run gated `step` until the whole batch rejects; returns 1.0
        where an instance accepted at least one step (f32 — bool vector
        loop carries fail Mosaic's scf legalization)."""
        def scond(c):
            j, g, _ = c
            return (j < K + 1) & (jnp.max(g) > 0.5)

        def sbody(c):
            j, g, any_acc = c
            if step is forward_step:
                ok, cap = forward_step(g > 0.5)
                capped_ref[:, :] = jnp.maximum(capped_ref[:, :],
                                               cap.astype(jnp.int32))
            else:
                ok = backward_step(g > 0.5)
            g = g * ok.astype(F32)
            return j + 1, g, jnp.maximum(any_acc, ok.astype(F32))

        _, _, any_acc = lax.while_loop(
            scond, sbody, (jnp.int32(0), gate0.astype(F32),
                           jnp.zeros((B, 1), F32)))
        return any_acc

    def outer(carry):
        t, done = carry
        alive = done < 0.5
        facc = stage(forward_step, alive)
        bacc = stage(backward_step, alive)
        progressed = jnp.maximum(facc, bacc) > 0.5
        return t + 1, jnp.where(progressed, done, 1.0)

    def outer_cond(carry):
        t, done = carry
        return (t < maxiter) & (jnp.min(done) < 0.5)

    lax.while_loop(outer_cond, outer,
                   (jnp.int32(0), jnp.zeros((B, 1), F32)))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("K", "maxiter", "delta2", "kfinal",
                                   "corr_dtype", "interpret"))
def _rmp_fused_call(A, Bs, K: int, maxiter: int, delta2: float, kfinal: int,
                    corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(F32)
    cn2 = jnp.sum(A.astype(F32) * A.astype(F32), axis=0)[None, :]

    return pl.pallas_call(
        partial(_rmp_kernel, K, maxiter, delta2, kfinal),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), F32),
            jax.ShapeDtypeStruct((B, n), F32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, n), F32),        # cols
            pltpu.VMEM((B, K, K), F32),        # Ginv
            pltpu.VMEM((B, K), F32),           # Atb
            pltpu.VMEM((B, K), F32),           # coef
            pltpu.VMEM((B, K), jnp.int32),     # idx
            pltpu.VMEM((B, n), F32),           # r
            pltpu.VMEM((B, m), F32),           # rescaling
            pltpu.VMEM((B, m), F32),           # active mask
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), F32),           # extracted columns
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs, cn2)


def rmp_fused_solve(A, Bs, k: int | None = None, delta: float | None = None,
                    maxiter: int = 1, kmax: int = 32,
                    corr_dtype=jnp.bfloat16, interpret: bool = False):
    """Batched RMP via the whole-solve fused kernel (K = kmax slot cap).

    Parity: src/stepwise.jl:5-25 (delta variant) and :31-42 (k variant:
    forward to exhaustion — bounded by the f32 exhaustion floor, the
    slot cap and the degeneracy gates — then backward down to k, single
    pass). Returns (SparseSolution, residuals, capped (B,) bool) —
    capped instances hit the slot cap mid-forward and must be re-solved
    on the uncapped path (see cstpu.models.batched), which keeps the cap
    a pure performance knob for BOTH variants.
    """
    n, m = A.shape
    if (k is None) == (delta is None):
        raise ValueError("specify exactly one of k or delta")
    if k is not None:
        if int(k) > int(kmax):
            raise ValueError(f"k = {k} exceeds the kmax = {kmax} slot cap")
        # single forward-to-exhaustion + backward-to-k pass
        kfinal, delta2, maxiter = int(k), 0.0, 1
    else:
        kfinal, delta2 = -1, float(delta) ** 2
    idx, coef, r, capped = _rmp_fused_call(
        jnp.asarray(A), jnp.asarray(Bs), int(kmax), int(maxiter), delta2,
        kfinal, corr_dtype, interpret)
    return _to_solution(idx, coef, m), r, capped[:, 0] > 0


def _foba_kernel(K: int, maxiter: int, delta2: float,
                 A_ref, AT_ref, Bs_ref, cn2_ref,
                 idx_ref, coef_ref, r_ref, capped_ref,
                 cols, Ginv, Atbs, coefs, idxs, r, resc, amask, i_scr,
                 acol_scr):
    """FoBa: one forward step per outer iteration (stop at rejection);
    after each accepted step, backward deletions are allowed only while
    the squared increase is below (accepted decrease)/4 — Zhang's
    half-the-last-gain rule (src/stepwise.jl:46-56)."""
    eng = _Engine(A_ref, Bs_ref, cols, Ginv, idxs, coefs, Atbs, r,
                  amask=amask, resc=resc, cn2_ref=cn2_ref, AT_ref=AT_ref,
                  i_scr=i_scr, acol_scr=acol_scr)
    B, m = eng.B, eng.m
    slot_iota = eng.slot_iota
    delta2 = jnp.float32(delta2)

    eng.init()
    capped_ref[:, :] = jnp.zeros_like(capped_ref)
    bn2 = jnp.sum(Bs_ref[:, :] * Bs_ref[:, :], axis=1, keepdims=True)
    floor2 = jnp.float32(64.0 * eng.n * (1.1920929e-07 ** 2)) * bn2

    def body(carry):
        t, alive = carry
        gate = alive > 0.5
        i, dmax = eng.forward_score()
        nat = eng.nactive()
        wanted = gate & (eng.rnorm2() > floor2) & (dmax > delta2) \
            & (nat < float(min(eng.n, m)))
        full = nat >= float(K)
        capped_ref[:, :] = jnp.maximum(capped_ref[:, :],
                                       (wanted & full).astype(jnp.int32))
        ok = eng.append(i, wanted & ~full)
        eng.refit_residual()
        bthresh = jnp.maximum(dmax, 0.0) * 0.25    # (max_delta/2)^2

        def bcond(c):
            j, g = c
            return (j < K + 1) & (jnp.max(g) > 0.5)

        def bbody(c):
            j, g = c
            p, dmin = eng.backward_min()
            acc = (g > 0.5) & (dmin < bthresh)
            hasf = acc.astype(F32)
            ep = (slot_iota == p).astype(F32) * hasf
            eng.delete_ep(ep, hasf)
            eng.refit_residual()
            return j + 1, g * hasf

        lax.while_loop(bcond, bbody, (jnp.int32(0), ok.astype(F32)))
        return t + 1, alive * ok.astype(F32)

    def cond(carry):
        t, alive = carry
        return (t < maxiter) & (jnp.max(alive) > 0.5)

    lax.while_loop(cond, body, (jnp.int32(0), jnp.ones((B, 1), F32)))

    idx_ref[:, :] = idxs[:, :]
    coef_ref[:, :] = coefs[:, :]
    r_ref[:, :] = r[:, :]


@partial(jax.jit, static_argnames=("K", "maxiter", "delta2", "corr_dtype",
                                   "interpret"))
def _foba_fused_call(A, Bs, K: int, maxiter: int, delta2: float,
                     corr_dtype, interpret: bool = False):
    n, m = A.shape
    B = Bs.shape[0]
    Ac = A.astype(corr_dtype)
    Bs = Bs.astype(F32)
    cn2 = jnp.sum(A.astype(F32) * A.astype(F32), axis=0)[None, :]

    return pl.pallas_call(
        partial(_foba_kernel, K, maxiter, delta2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), F32),
            jax.ShapeDtypeStruct((B, n), F32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K, n), F32),        # cols
            pltpu.VMEM((B, K, K), F32),        # Ginv
            pltpu.VMEM((B, K), F32),           # Atb
            pltpu.VMEM((B, K), F32),           # coef
            pltpu.VMEM((B, K), jnp.int32),     # idx
            pltpu.VMEM((B, n), F32),           # r
            pltpu.VMEM((B, m), F32),           # rescaling
            pltpu.VMEM((B, m), F32),           # active mask
            pltpu.VMEM((B, 1), jnp.int32),     # selected index staging
            pltpu.VMEM((B, n), F32),           # extracted columns
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Ac, Ac.T, Bs, cn2)


def foba_fused_solve(A, Bs, delta: float, kmax: int = 32,
                     corr_dtype=jnp.bfloat16, interpret: bool = False):
    """Batched FoBa via the whole-solve fused kernel (K = kmax slot cap).

    Parity: src/stepwise.jl:46-56 (outer bound n as in the reference).
    Returns (SparseSolution, residuals, capped (B,) bool).
    """
    n, m = A.shape
    idx, coef, r, capped = _foba_fused_call(
        jnp.asarray(A), jnp.asarray(Bs), int(kmax), int(n),
        float(delta) ** 2, corr_dtype, interpret)
    return _to_solution(idx, coef, m), r, capped[:, 0] > 0


def supported_rmp(A, Bs, kmax: int, corr_dtype=jnp.bfloat16) -> bool:
    """VMEM gate for the fused RMP/FoBa kernels (kmax-slot state)."""
    n, m = A.shape
    B = Bs.shape[0]
    K = int(kmax)
    if n % 8 or m % 128 or B % 8:
        return False
    itemsize = jnp.dtype(corr_dtype).itemsize
    vmem = (2 * n * m * itemsize + B * K * n * 4
            + 2 * B * n * 4 + B * m * 4 * 4 + B * K * K * 4)
    return vmem < 100 * 1024 * 1024

"""Randomized cross-path consistency fuzz for the whole solver surface.

The conformance suite pins discriminating seeds; this harness goes wide
instead: every trial draws a random problem (shape bucket, conditioning,
noise, sparsity) and checks INVARIANTS that must hold on any input —
not planted-support recovery, which greedy methods may legitimately
miss on hard instances:

  * container integrity — masked idx in range, no duplicate active
    atoms, finite coefficients, solutions honestly masked;
  * batch-vs-single — every ``*_batch`` entry must agree row-for-row
    with its single-problem solver;
  * fused-kernel-vs-XLA — the whole-solve Pallas kernels (interpret
    mode off-TPU) must match the XLA path's answer QUALITY: equal
    support size and residual norm within a near-tie tolerance (the
    documented conformance contract: recovery quality, not bitwise —
    docs/DESIGN.md);
  * sharded-vs-single — column-sharded solves over an 8-virtual-device
    mesh must select identical atoms (deterministic collective argmax),
    and the sharded convex solvers must match their single-chip twins
    to solver tolerance;
  * exact-oracle checks — fista vs the exact LASSO path objective, BP
    ADMM vs the exact simplex LP (feasibility-aware in both
    directions), BPD ADMM vs the exact homotopy delta-crossing, the
    active-set machinery vs NumPy normal equations over random
    append/delete sequences, and RMPS convergence vs the Tipping-Faul
    stationarity conditions recomputed from scratch.

Shape buckets are reused across trials so jit compiles amortize.

Run:   python benchmarks/fuzz.py [n_trials] [seed0]     (defaults 60, 0)
Exits nonzero listing every violation. A violation is a BUG: either in
the checked paths or in the invariant — triage before shipping either.
"""

from __future__ import annotations

import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the virtual multi-device CPU mesh before JAX initializes
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

# Decide the backend BEFORE anything initializes it: calling
# jax.default_backend() first would initialize whatever plugin the
# ambient env names (the axon TPU plugin hangs behind a dead compile
# tunnel) and make any later config update a no-op. This is a CPU
# logic-fuzz harness — run on CPU unless the caller explicitly opts
# into device execution with CSTPU_FUZZ_TPU=1.
if os.environ.get("CSTPU_FUZZ_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
# x64 for the logic-equivalence checks; the kernel-facing checks pass
# f32 data explicitly (their production regime)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import cstpu  # noqa: E402
from cstpu.models import batched  # noqa: E402

SHAPES = [(32, 128), (64, 128), (64, 256), (32, 48)]
VIOLATIONS: list[str] = []


def _flag(trial, what):
    VIOLATIONS.append(f"trial {trial}: {what}")
    print(f"FUZZ VIOLATION  trial {trial}: {what}", flush=True)


def _integrity(trial, name, sol, m):
    idx = np.asarray(sol.idx)
    mask = np.asarray(sol.mask)
    val = np.asarray(sol.val)
    act = idx[mask]
    if act.size and (act.min() < 0 or act.max() >= m):
        _flag(trial, f"{name}: active index out of range: {act}")
    if len(set(act.tolist())) != act.size:
        _flag(trial, f"{name}: duplicate active atoms: {sorted(act)}")
    if not np.all(np.isfinite(val[mask])):
        _flag(trial, f"{name}: non-finite active coefficient")


def _problem(rng, trial, dtype=None):
    n, m = SHAPES[rng.integers(len(SHAPES))]
    k = int(rng.integers(1, 7))
    correlated = bool(rng.integers(2))
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    if correlated:
        A, x, b = cstpu.correlated_data(key, n=n, m=m, k=k, decay=1.0,
                                        dtype=dtype)
    else:
        A, x, b = cstpu.sparse_data(key, n=n, m=m, k=k, dtype=dtype)
    if rng.integers(2):
        b = cstpu.perturb(jax.random.PRNGKey(trial + 10**6), b, 5e-3)
    return A, x, b, k


# trials draw f32 problems (the TPU production regime); checks that need
# f64 tie resolution cast up themselves
_PROBLEM_DTYPE = jnp.float32


def _rows(rng, A, b, k):
    """A 8-row batch mixing b with independent problems (B=8: the fused
    kernels' tiling minimum)."""
    keys = jax.random.split(jax.random.PRNGKey(int(rng.integers(2**31))), 8)
    ys = [b] + [cstpu.perturb(kk, b, 1e-2) for kk in keys[:7]]
    return jnp.stack(ys)


BATCH_PAIRS = [
    ("omp", lambda A, y, k: cstpu.omp(A, y, k),
     lambda A, Y, k: batched.omp_batch(A, Y, k)),
    ("gomp", lambda A, y, k: cstpu.gomp(A, y, 2, k),
     lambda A, Y, k: batched.gomp_batch(A, Y, 2, k)),
    ("fr", lambda A, y, k: cstpu.fr(A, y, sparsity=k),
     lambda A, Y, k: batched.fr_batch(A, Y, sparsity=k)),
    ("sp", lambda A, y, k: cstpu.sp(A, y, k),
     lambda A, Y, k: batched.sp_batch(A, Y, k)),
    ("ompr", lambda A, y, k: cstpu.ompr(A, y, k, 1e-12),
     lambda A, Y, k: batched.ompr_batch(A, Y, k, 1e-12)),
    ("srr", lambda A, y, k: cstpu.srr(A, y, k),
     lambda A, Y, k: batched.srr_batch(A, Y, k)),
    ("rmp", lambda A, y, k: cstpu.rmp(A, y, k=k),
     lambda A, Y, k: batched.rmp_batch(A, Y, k=k)),
]


def check_batch_vs_single(trial, rng, A, b, k):
    """LOGIC equivalence of the batch dispatchers, checked in f64.

    In f32 a batched GEMM's reduction order differs from the GEMV the
    single path runs, and exhaustion-mode compositions (rmp's forward
    stage to full rank, backward pruning of a complete basis) can flip
    a noise-floor near-tie and cascade to a different (still valid)
    greedy optimum — observed: rmp at n=32, m=48 lost a planted atom in
    batch only. f64 resolves the ties identically, so any disagreement
    here is a real wiring bug (gating, masking, row merging), which is
    what this check is for. The f32 cross-path story is covered by the
    quality-based fused-vs-XLA check and the conformance suite's
    pinned well-posed problems."""
    name, single, bat = BATCH_PAIRS[(trial // len(CHECKS))
                                    % len(BATCH_PAIRS)]
    if name == "rmp":
        # rmp's forward stage runs to exhaustion; on correlated
        # dictionaries with NEAR-DUPLICATE atoms the late-stage picks are
        # tied below even the f64 noise floor and batch/single land in
        # different valid greedy optima (observed at n=32, m=48,
        # decay=1.0 — docs/DESIGN.md contract). Gaussian margins are
        # healthy, so equality there still catches wiring bugs.
        key = jax.random.PRNGKey(int(rng.integers(2**31)))
        A, _, b = cstpu.sparse_data(key, n=A.shape[0], m=A.shape[1], k=k,
                                    dtype=jnp.float64)
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    Y = _rows(rng, A, b, k)
    sols = bat(A, Y, k)
    m = A.shape[1]
    for i in (0, 3, 7):
        row = jax.tree.map(lambda leaf: leaf[i], sols)
        _integrity(trial, f"{name}_batch[{i}]", row, m)
        ref = single(A, Y[i], k)
        if list(row.nzind) != list(ref.nzind):
            _flag(trial, f"{name}: batch row {i} support "
                         f"{list(row.nzind)} != single {list(ref.nzind)}")
        elif not np.allclose(np.asarray(row.nzval), np.asarray(ref.nzval),
                             rtol=1e-4, atol=1e-6):
            _flag(trial, f"{name}: batch row {i} coefficients diverge")


FUSED = [
    ("omp_fused", "omp"), ("fr_fused", "fr"), ("gomp_fused", "gomp"),
    ("sp_fused", "sp"), ("ompr_fused", "ompr"), ("srr_fused", "srr"),
    ("fbr_fused", "fbr"),
]


def check_fused_vs_xla(trial, rng, A, b, k):
    """Quality conformance: the interpret-mode whole-solve kernel's
    residual must match the XLA path's within near-tie tolerance."""
    from cstpu.ops import fused_solve as fs
    from cstpu.ops import fused_twostage as ft

    which, _ = FUSED[(trial // len(CHECKS)) % len(FUSED)]
    Y = _rows(rng, A, b, k)
    m = A.shape[1]
    if which == "omp_fused":
        if not fs.supported(A, Y, k, jnp.float32):
            return
        sol, _ = fs.omp_fused_solve(A, Y, k, corr_dtype=jnp.float32,
                                    interpret=True)
        ref = batched.omp_batch(A, Y, k)
    elif which == "fr_fused":
        if not fs.supported_fr(A, Y, k, jnp.float32):
            return
        sol, _ = fs.fr_fused_solve(A, Y, k, corr_dtype=jnp.float32,
                                   interpret=True)
        ref = batched.fr_batch(A, Y, sparsity=k)
    elif which == "gomp_fused":
        if not fs.supported(A, Y, k, jnp.float32):
            return
        sol, _ = fs.gomp_fused_solve(A, Y, 2, k, corr_dtype=jnp.float32,
                                     interpret=True)
        ref = batched.gomp_batch(A, Y, 2, k)
    elif which == "sp_fused":
        if 2 * k > A.shape[0] or not ft.supported_sp(A, Y, k, jnp.float32):
            return
        sol, _ = ft.sp_fused_solve(A, Y, k, corr_dtype=jnp.float32,
                                   interpret=True)
        ref = batched.sp_batch(A, Y, k)
    elif which == "ompr_fused":
        if not ft.supported_ompr(A, Y, k, jnp.float32):
            return
        sol, _ = ft.ompr_fused_solve(A, Y, k, delta=1e-12,
                                     corr_dtype=jnp.float32, interpret=True)
        ref = batched.ompr_batch(A, Y, k, 1e-12)
    elif which == "srr_fused":
        if not ft.supported_srr(A, Y, k, corr_dtype=jnp.float32):
            return
        sol, _ = ft.srr_fused_solve(A, Y, k, corr_dtype=jnp.float32,
                                    interpret=True)
        ref = batched.srr_batch(A, Y, k)
    else:
        # fbr needs m <= n with lane-aligned m: redraw square f32
        from cstpu.ops import fused_backward as fb

        key = jax.random.PRNGKey(int(rng.integers(2**31)))
        A, _, b = cstpu.sparse_data(key, n=128, m=128, k=k,
                                    dtype=jnp.float32)
        Y = _rows(rng, A, b, k)
        m = A.shape[1]
        if not fb.supported_backward(A, Y):
            return
        sol, failed = fb.fbr_fused_solve(A, Y, sparsity=k, interpret=True)
        ref = batched.fbr_batch(A, Y, sparsity=k)
    for i in range(Y.shape[0]):
        row = jax.tree.map(lambda leaf: leaf[i], sol)
        rrow = jax.tree.map(lambda leaf: leaf[i], ref)
        _integrity(trial, f"{which}[{i}]", row, m)
        rk = _resid(A, Y[i], row)
        rx = _resid(A, Y[i], rrow)
        if int(np.sum(np.asarray(row.mask))) != int(
                np.sum(np.asarray(rrow.mask))):
            _flag(trial, f"{which}: row {i} support size "
                         f"{int(np.sum(np.asarray(row.mask)))} != XLA "
                         f"{int(np.sum(np.asarray(rrow.mask)))}")
        elif rk > rx * (1 + 1e-3) + 1e-4:
            _flag(trial, f"{which}: row {i} residual {rk:.3e} worse than "
                         f"XLA {rx:.3e}")


def _resid(A, y, sol):
    return float(jnp.linalg.norm(A @ sol.todense() - y))


def check_sharded_vs_single(trial, rng, A, b, k):
    from cstpu.parallel.mesh import make_mesh
    from cstpu.parallel.sharded import omp_sharded_fused

    if jax.device_count() < 8:
        return
    # the streaming select kernel needs a per-shard atom width that is a
    # multiple of 128 — redraw the trial's problem at a shardable shape,
    # keeping its conditioning/noise draw
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    correlated = bool(rng.integers(2))
    if correlated:
        A, _, b = cstpu.correlated_data(key, n=64, m=1024, k=k, decay=1.0,
                                        dtype=jnp.float32)
    else:
        A, _, b = cstpu.sparse_data(key, n=64, m=1024, k=k,
                                    dtype=jnp.float32)
    mesh = make_mesh((1, 8))
    Y = _rows(rng, A, b, k)
    sol = omp_sharded_fused(A, Y, k, mesh, corr_dtype=jnp.float32,
                            interpret=jax.default_backend() != "tpu")
    ref = batched.omp_batch(A, Y, k)
    if np.array_equal(np.asarray(sol.idx), np.asarray(ref.idx)):
        return
    if not correlated:
        # Gaussian margins are healthy: an identity miss is a wiring bug
        _flag(trial, "omp_sharded_fused: selection differs from single-chip")
        return
    # correlated twins can tie within one f32 ulp ACROSS shards (observed:
    # relative margin 7.8e-8 between |corr| of two 0.87-correlated atoms
    # in different shards) — per-shard vs whole-m GEMM rounding then
    # legitimately picks different basins; the invariant that remains is
    # answer QUALITY (docs/DESIGN.md contract)
    for i in range(Y.shape[0]):
        row = jax.tree.map(lambda leaf: leaf[i], sol)
        rrow = jax.tree.map(lambda leaf: leaf[i], ref)
        rk = float(jnp.linalg.norm(A @ row.todense() - Y[i]))
        rx = float(jnp.linalg.norm(A @ rrow.todense() - Y[i]))
        if rk > rx * 1.5 + 1e-3:
            _flag(trial, f"omp_sharded_fused: row {i} residual {rk:.3e} "
                         f"far above single-chip {rx:.3e}")


def check_lasso_oracle(trial, rng, A, b, k):
    from cstpu.native import lasso_homotopy

    lam = float(10 ** rng.uniform(-4, -2))
    y = np.asarray(b, np.float64)
    An = np.asarray(A, np.float64)
    xi = np.asarray(cstpu.fista(A, b, lam, maxiter=4096, stepsize=None),
                    np.float64)
    xs = lasso_homotopy(An, y, lam)

    def obj(z):
        return 0.5 * np.sum((An @ z - y) ** 2) + lam * np.sum(np.abs(z))

    if obj(xs) > obj(xi) + 1e-8:
        _flag(trial, f"lasso: exact path objective {obj(xs):.6e} ABOVE "
                     f"fista {obj(xi):.6e} — homotopy not optimal")
    if abs(obj(xs) - obj(xi)) > 5e-3:
        _flag(trial, f"lasso: fista objective gap {abs(obj(xs)-obj(xi)):.2e}")


BACKWARD_PAIRS = [
    ("br", lambda A, y, k: cstpu.br(A, y, sparsity=k),
     lambda A, Y, k: batched.br_batch(A, Y, sparsity=k)),
    ("fbr", lambda A, y, k: cstpu.fbr(A, y, sparsity=k),
     lambda A, Y, k: batched.fbr_batch(A, Y, sparsity=k)),
    ("lace", lambda A, y, k: cstpu.lace(A, y, sparsity=k),
     lambda A, Y, k: batched.lace_batch(A, Y, sparsity=k)),
]


def check_backward_batch_vs_single(trial, rng, A, b, k):
    """Backward family needs full column rank — redraw square/overdet
    problems in f64 (same logic-equivalence rationale as
    check_batch_vs_single)."""
    # trial // len(CHECKS): trial % 3 is constant on the trials that
    # reach this check (9 checks, 3 pairs share the divisor)
    name, single, bat = BACKWARD_PAIRS[(trial // len(CHECKS))
                                       % len(BACKWARD_PAIRS)]
    n = int(rng.choice([32, 48]))
    m = n if name != "lace" else n - 16          # lace needs overdetermined
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    A, x, b = cstpu.sparse_data(key, n=n, m=m, k=k, dtype=jnp.float64)
    Y = _rows(rng, A, b, k)
    sols = bat(A, Y, k)
    for i in (0, 5):
        row = jax.tree.map(lambda leaf: leaf[i], sols)
        _integrity(trial, f"{name}_batch[{i}]", row, m)
        ref = single(A, Y[i], k)
        if list(row.nzind) != list(ref.nzind):
            _flag(trial, f"{name}: batch row {i} support "
                         f"{list(row.nzind)} != single {list(ref.nzind)}")


def check_sbl_batch_vs_single(trial, rng, A, b, k):
    """SBL family: batched posterior means must match the single path
    (f64 logic equivalence); supports thresholded at sigma."""
    sigma = 1e-2
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    Y = _rows(rng, A, b, k)
    which = ["sbl", "fsbl", "rmps"][(trial // len(CHECKS)) % 3]
    single = {"sbl": cstpu.sbl, "fsbl": cstpu.fsbl, "rmps": cstpu.rmps}[which]
    bat = {"sbl": batched.sbl_batch, "fsbl": batched.fsbl_batch,
           "rmps": batched.rmps_batch}[which]
    Xs = np.asarray(bat(A, Y, sigma))
    for i in (0, 5):
        xr = np.asarray(single(A, Y[i], sigma))
        got = np.flatnonzero(np.abs(Xs[i]) > sigma)
        want = np.flatnonzero(np.abs(xr) > sigma)
        if not np.array_equal(got, want):
            _flag(trial, f"{which}: batch row {i} support@sigma "
                         f"{got.tolist()} != single {want.tolist()}")


def check_sbl_woodbury_vs_direct(trial, rng, A, b, k):
    """Plain sbl's n x n woodbury form must agree with the reference's
    m x m iteration on ANY input (same gamma fixed point) — f64, where
    both forms are exact. Random scalar-vs-matrix Sigma too."""
    sigma2 = float(10.0 ** rng.uniform(-5, -3))
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    sig = sigma2 if rng.random() < 0.5 else sigma2 * jnp.eye(
        A.shape[0], dtype=jnp.float64)
    xd = np.asarray(cstpu.sbl(A, b, sig, method="direct"))
    xw = np.asarray(cstpu.sbl(A, b, sig, method="woodbury"))
    # same support at the noise scale and matching coefficients there
    thr = np.sqrt(sigma2)
    got, want = np.flatnonzero(np.abs(xw) > thr), np.flatnonzero(
        np.abs(xd) > thr)
    if not np.array_equal(got, want):
        _flag(trial, f"sbl woodbury support {got.tolist()} != direct "
                     f"{want.tolist()}")
    elif not np.allclose(xw, xd, atol=1e-6):
        _flag(trial, f"sbl woodbury coef dev {np.abs(xw - xd).max():.2e}")


def check_bp_feasibility(trial, rng, A, b, k):
    """Convex path invariants on any input: BP iterates must be primal
    feasible and no sparser-objective certificate may exist (the exact
    simplex LP is the oracle)."""
    from cstpu.native import bp_simplex

    A64 = np.asarray(A, np.float64)
    y64 = np.asarray(b, np.float64)
    xb = np.asarray(cstpu.bp(A, b), np.float64)
    feas = float(np.linalg.norm(A64 @ xb - y64))
    scale = 1.0 + float(np.linalg.norm(y64))
    if feas > 1e-3 * scale:
        # f32 dictionaries with f32-identical near-duplicate atoms park
        # at the flat-face noise floor (documented bp() contract); only
        # an egregious violation is a finding
        _flag(trial, f"bp[admm]: infeasible, ||Ax-b|| = {feas:.2e}")
    try:
        xs = bp_simplex(A64, y64)
    except Exception as e:  # noqa: BLE001 — degenerate LP is a finding
        _flag(trial, f"bp[simplex] raised: {e}")
        return
    if float(np.linalg.norm(A64 @ xs - y64)) > 1e-8 * scale:
        _flag(trial, "bp[simplex]: exact LP returned an infeasible vertex")
    # an INFEASIBLE admm iterate can undercut the true optimum by
    # ~feas * ||dual|| (observed 2e-4 at feas 3e-6 on a correlated
    # instance), so project the admm iterate onto {Ax=b} first: the
    # projected point is feasible, hence a rigorous one-sided
    # certificate — simplex must be at or below it
    try:
        L = np.linalg.cholesky(A64 @ A64.T)
        corr_vec = np.linalg.solve(
            L.T, np.linalg.solve(L, y64 - A64 @ xb))
        xproj = xb + A64.T @ corr_vec
        if np.sum(np.abs(xs)) > np.sum(np.abs(xproj)) + 1e-6:
            _flag(trial, f"bp: simplex objective {np.sum(np.abs(xs)):.6f} "
                         f"ABOVE feasible-projected admm "
                         f"{np.sum(np.abs(xproj)):.6f} — LP not optimal")
    except np.linalg.LinAlgError:
        pass
    # the other direction has no feasibility excuse: a (near-)feasible
    # admm objective far ABOVE the exact optimum is a convergence bug
    # (this guard would have caught the pre-whitening ADMM)
    if (feas < 1e-3 * scale
            and np.sum(np.abs(xb)) > np.sum(np.abs(xs)) * 1.05 + 1e-3):
        _flag(trial, f"bp[admm]: objective {np.sum(np.abs(xb)):.6f} far "
                     f"above exact {np.sum(np.abs(xs)):.6f}")


def check_active_set_sequence(trial, rng, A, b, k):
    """The shared machinery under every greedy solver: a random
    append/delete sequence on the ActiveSet must track the NumPy normal
    equations exactly (f64) — coefficients, residual, gamma leverage,
    and the OLS rescaling denominators."""
    from cstpu.ops import active_set as aset

    n, m, kmax = 32, 48, 10
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    A, x, b = cstpu.sparse_data(key, n=n, m=m, k=k, dtype=jnp.float64)
    An, bn = np.asarray(A), np.asarray(b)
    colnorm2 = jnp.sum(A * A, axis=0)
    st = aset.empty(n, kmax, m, A.dtype)
    sup: list[int] = []
    for step in range(14):
        if sup and (len(sup) >= kmax or rng.random() < 0.3):
            pos = int(rng.integers(len(sup)))
            st = aset.delete(st, pos, m)
            sup.pop(pos)
        else:
            i = int(rng.choice([j for j in range(m) if j not in sup]))
            st = aset.append(A, b, st, i)
            sup.append(i)
        st = aset.refit(st)
        kk = len(sup)
        if int(st.k) != kk or sorted(np.asarray(st.idx)[:kk]) != sorted(sup):
            _flag(trial, f"aset step {step}: bookkeeping "
                         f"{np.asarray(st.idx)[:kk]} != {sup}")
            return
        if not kk:
            continue
        As = An[:, sup]
        Gi = np.linalg.inv(As.T @ As)
        coef = Gi @ (As.T @ bn)
        if not np.allclose(np.asarray(st.coef)[:kk], coef,
                           rtol=1e-8, atol=1e-10):
            _flag(trial, f"aset step {step}: coef diverges from lstsq")
        r = bn - As @ coef
        if not np.allclose(np.asarray(aset.residual(st, b)), r, atol=1e-9):
            _flag(trial, f"aset step {step}: residual diverges")
        if not np.allclose(np.asarray(aset.gamma(st))[:kk], np.diag(Gi),
                           rtol=1e-8, atol=1e-10):
            _flag(trial, f"aset step {step}: gamma leverage diverges")
        resc = np.asarray(aset.ols_rescaling(A, st, colnorm2))
        W = As.T @ An
        want = np.asarray(colnorm2) - np.sum(W * (Gi @ W), axis=0)
        if not np.allclose(resc, want, rtol=1e-8, atol=1e-9):
            _flag(trial, f"aset step {step}: ols_rescaling diverges")


def check_bpd_oracle(trial, rng, A, b, k):
    """Default BPD (secant) vs the exact homotopy delta-crossing: the
    returned point must BE in the l2 ball (certified feasibility, the
    r5 contract) and its objective within first-order distance of the
    exact path solution. The ADMM path is additionally checked for the
    no-silent-violation contract: finite result => inside 1.05 delta,
    else the reference's NaN failure vector + feasible=False."""
    from cstpu.native import HomotopyError, bpd_homotopy

    delta = float(10 ** rng.uniform(-2.3, -1.5))
    A64 = np.asarray(A, np.float64)
    y64 = np.asarray(b, np.float64)
    xd, info = cstpu.bpd(A, b, delta, return_info=True)
    xd = np.asarray(xd, np.float64)
    if not info["feasible"]:
        # the planted draws are all feasible (n < m full-row-rank):
        # a declared failure here is a solver bug, not an infeasibility
        _flag(trial, f"bpd[secant]: declared infeasible, rho "
                     f"{info['rho']:.4e} vs delta {delta:.4e}")
        return
    ball = float(np.linalg.norm(A64 @ xd - y64))
    if ball > delta * (1.0 + 1e-5):
        _flag(trial, f"bpd[secant]: ball violated, ||Ax-b|| = {ball:.4e} "
                     f"vs delta {delta:.4e}")
    try:
        xh, _lam = bpd_homotopy(A64, y64, delta)
    except HomotopyError as e:
        _flag(trial, f"bpd[homotopy] raised: {e}")
        return
    if np.linalg.norm(A64 @ xh - y64) > delta * (1 + 1e-9) + 1e-12:
        _flag(trial, "bpd[homotopy]: exact crossing violates the ball")
    if np.abs(xh).sum() > np.abs(xd).sum() + 1e-4 and ball <= delta:
        _flag(trial, f"bpd: exact objective {np.abs(xh).sum():.6f} ABOVE "
                     f"feasible secant {np.abs(xd).sum():.6f}")
    if np.abs(xd).sum() > np.abs(xh).sum() * 1.05 + 1e-3:
        _flag(trial, f"bpd[secant]: objective {np.abs(xd).sum():.6f} far "
                     f"above exact {np.abs(xh).sum():.6f}")
    # ADMM: feasible or declared-failed, never a silent violation
    xa, ainfo = cstpu.bpd(A, b, delta, method="admm", return_info=True)
    xa = np.asarray(xa, np.float64)
    if np.all(np.isfinite(xa)):
        balla = float(np.linalg.norm(A64 @ xa - y64))
        if balla > delta * 1.05 + 1e-9:
            _flag(trial, f"bpd[admm]: SILENT ball violation "
                         f"{balla:.4e} vs delta {delta:.4e}")
    elif ainfo["feasible"] or not np.all(np.isnan(xa)):
        _flag(trial, "bpd[admm]: failure vector not all-NaN or "
                     "feasible flag inconsistent")


def check_convex_sharded(trial, rng, A, b, k):
    """Column-sharded convex solvers vs their single-chip twins over the
    virtual mesh: same ADMM/proximal semantics, so the results must
    agree to solver tolerance (not bitwise: collective reduction order
    differs)."""
    from cstpu.parallel.convex import bp_sharded, fista_sharded
    from cstpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        return
    n, m = A.shape
    if m % 8:
        return
    mesh = make_mesh((1, 8))
    which = ["bp", "fista", "bpd_secant"][(trial // len(CHECKS)) % 3]
    if which == "bpd_secant":
        from cstpu.parallel.convex import bpd_secant_sharded

        delta = float(10 ** rng.uniform(-2.3, -1.5))
        xs, sinfo = bpd_secant_sharded(A, b, delta, mesh=mesh,
                                       return_info=True)
        xr, rinfo = cstpu.bpd(A, b, delta, return_info=True)
        if sinfo["feasible"] != rinfo["feasible"]:
            _flag(trial, f"bpd_secant_sharded: feasibility flag "
                         f"{sinfo['feasible']} != single {rinfo['feasible']}")
            return
        if not sinfo["feasible"]:
            return
        feas = float(jnp.linalg.norm(A @ xs - b))
        if feas > delta * (1 + 1e-5):
            _flag(trial, f"bpd_secant_sharded: ball violated {feas:.3e} "
                         f"vs delta {delta:.3e}")
        o_s = float(jnp.sum(jnp.abs(xs)))
        o_r = float(jnp.sum(jnp.abs(xr)))
        if o_s > o_r * 1.05 + 1e-3:
            _flag(trial, f"bpd_secant_sharded: objective {o_s:.6f} far "
                         f"above single-chip {o_r:.6f}")
    elif which == "bp":
        zs, _, _ = bp_sharded(A, b, mesh=mesh)
        xr = cstpu.bp(A, b)
        feas_s = float(jnp.linalg.norm(A @ zs - b))
        feas_r = float(jnp.linalg.norm(A @ xr - b))
        scale = 1.0 + float(jnp.linalg.norm(b))
        if feas_s > max(10 * feas_r, 1e-3 * scale):
            _flag(trial, f"bp_sharded: feasibility {feas_s:.2e} far above "
                         f"single-chip {feas_r:.2e}")
        o_s, o_r = float(jnp.sum(jnp.abs(zs))), float(jnp.sum(jnp.abs(xr)))
        if abs(o_s - o_r) > 1e-2 * (1 + o_r):
            _flag(trial, f"bp_sharded: objective {o_s:.6f} vs "
                         f"single-chip {o_r:.6f}")
    else:
        lam = float(10 ** rng.uniform(-4, -2))
        xs = fista_sharded(A, b, lam, mesh, maxiter=2048, stepsize=None)
        xr = cstpu.fista(A, b, lam, maxiter=2048, stepsize=None)
        An = np.asarray(A, np.float64)
        yn = np.asarray(b, np.float64)

        def obj(z):
            return (0.5 * np.sum((An @ np.asarray(z, np.float64) - yn) ** 2)
                    + lam * np.sum(np.abs(np.asarray(z, np.float64))))

        if abs(obj(xs) - obj(xr)) > 1e-3 * (1 + obj(xr)):
            _flag(trial, f"fista_sharded: objective {obj(xs):.6e} vs "
                         f"single-chip {obj(xr):.6e}")


def check_sbl_stationarity(trial, rng, A, b, k):
    """SBL fixed-point oracle: at RMPS convergence no single
    add/delete/re-estimate action may still gain marginal likelihood
    beyond the solver's tolerance. S/Q are recomputed FROM SCRATCH in
    f64 NumPy (independent of the engine's incremental rank-one
    updates); gains via the Tipping-Faul closed forms
    (src/sbl.jl:209-223 parity, cstpu/models/sbl.py:159-170)."""
    sigma = float(10 ** rng.uniform(-5, -3))          # noise VARIANCE
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    x, alpha = cstpu.rmps(A, b, sigma, return_alpha=True)
    An, yn = np.asarray(A), np.asarray(b)
    al = np.asarray(alpha, np.float64)
    n, m = An.shape
    act = np.isfinite(al)
    C = sigma * np.eye(n)
    if act.any():
        C = C + (An[:, act] / al[act][None, :]) @ An[:, act].T
    Ci = np.linalg.inv(C)
    S = np.einsum("ij,ij->j", An, Ci @ An)
    Q = An.T @ (Ci @ yn)
    with np.errstate(all="ignore"):
        f = np.where(act, al / (al - S), 1.0)
        sq_s, sq_q = S * f, Q * f
        rel = sq_s < sq_q * sq_q
        aln = np.where(rel, sq_s * sq_s / (sq_q * sq_q - sq_s), np.inf)
        gain = np.zeros(m)
        add = ~act & rel
        gain[add] = (Q[add] ** 2 - S[add]) / S[add] \
            + np.log(S[add]) - np.log(Q[add] ** 2)
        dele = act & ~rel
        gain[dele] = Q[dele] ** 2 / (S[dele] - al[dele]) \
            - np.log1p(-S[dele] / al[dele])
        upd = act & rel
        dd = 1.0 / aln[upd] - 1.0 / al[upd]
        gain[upd] = Q[upd] ** 2 / (S[upd] + 1.0 / dd) \
            - np.log(np.maximum(1.0 + S[upd] * dd, 0.0))
    gain = np.where(np.isfinite(gain), gain, 0.0)
    j = int(np.argmax(gain))
    # min_increase is 1e-6; anything 4 orders above it is a missed action.
    # Contract nuance (reference parity, src/sbl.jl:381-406): optimize!
    # BREAKS right after an acquisition stage that changed nothing,
    # WITHOUT running the deletion/update stage — so only
    # ADD-stationarity is guaranteed at termination. A pending
    # delete/update gain is the documented quirk; the engine-integrity
    # requirement is that ONE warm restart (fresh S/Q from alpha)
    # resolves it.
    if gain[j] > 1e-2:
        if add[j]:
            _flag(trial, f"rmps not add-stationary: atom {j} would still "
                         f"gain {gain[j]:.3e} marginal likelihood")
            return
        x2, alpha2 = cstpu.rmps(A, b, sigma, alpha0=alpha,
                                return_alpha=True)
        al2 = np.asarray(alpha2, np.float64)
        if np.array_equal(np.where(np.isfinite(al2), al2, 0),
                          np.where(np.isfinite(al), al, 0)):
            _flag(trial, f"rmps stuck: warm restart did not act on a "
                         f"{gain[j]:.3e} pending gain (atom {j})")


def check_analysis_utilities(trial, rng, A, b, k):
    """Dictionary-analysis identities on arbitrary inputs: Babel-function
    monotonicity and bounds (Tropp), generator contracts (unit column
    norms, exact perturbation norm), preconditioner consistency."""
    m = A.shape[1]
    kk = min(8, m - 1)
    mus = np.asarray(cstpu.cumbabel(A, kk), np.float64)
    mu = float(cstpu.coherence(A))
    if abs(mus[0] - mu) > 1e-6:
        _flag(trial, f"babel(1) {mus[0]} != coherence {mu}")
    if np.any(np.diff(mus) < -1e-9):
        _flag(trial, f"cumbabel not monotone: {mus}")
    if np.any(mus > np.arange(1, kk + 1) * mu + 1e-9):
        _flag(trial, "mu_1(i) > i*mu — Babel bound violated")
    for i in (1, kk):
        bi = float(cstpu.babel(A, i))
        if abs(bi - mus[i - 1]) > 1e-9:
            _flag(trial, f"babel({i}) {bi} != cumbabel[{i - 1}] {mus[i-1]}")
    cn = np.asarray(cstpu.colnorms(cstpu.normalize_columns(A)))
    if not np.allclose(cn, 1.0, atol=1e-5):
        _flag(trial, "normalize_columns did not produce unit columns")
    delta = float(10 ** rng.uniform(-3, -1))
    y = cstpu.perturb(jax.random.PRNGKey(trial), b, delta)
    got = float(jnp.linalg.norm(y - b))
    if abs(got - delta) > 1e-5 * (1 + delta):
        _flag(trial, f"perturb norm {got} != {delta}")
    P = cstpu.svd_preconditioner(np.asarray(A, np.float64), 1e-6)
    PA = np.asarray(P(np.asarray(A, np.float64)))
    if not np.allclose(PA, np.asarray(
            cstpu.precondition(np.asarray(A, np.float64), 1e-6)), atol=1e-8):
        _flag(trial, "precondition != svd_preconditioner(A) @ A")


CHECKS = [check_batch_vs_single, check_fused_vs_xla,
          check_sharded_vs_single, check_lasso_oracle,
          check_backward_batch_vs_single, check_sbl_batch_vs_single,
          check_bp_feasibility, check_active_set_sequence,
          check_bpd_oracle, check_convex_sharded, check_sbl_stationarity,
          check_analysis_utilities, check_sbl_woodbury_vs_direct]


def main() -> int:
    """fuzz.py [trials] [seed0] [check-substring]

    With a check-substring, EVERY trial runs the matching check (focused
    campaign, e.g. `fuzz.py 500 0 bpd`); otherwise trials round-robin
    over all checks. The trial number seeds the problem draw either way,
    so focused and round-robin campaigns see the same problems."""
    trials = int(_sys.argv[1]) if len(_sys.argv) > 1 else 60
    seed0 = int(_sys.argv[2]) if len(_sys.argv) > 2 else 0
    only = _sys.argv[3] if len(_sys.argv) > 3 else None
    if only is not None:
        matches = [c for c in CHECKS if only in c.__name__]
        if len(matches) != 1:
            print(f"check filter {only!r} matches "
                  f"{[c.__name__ for c in matches]}")
            return 2
    for trial in range(seed0, seed0 + trials):
        rng = np.random.default_rng(trial)
        A, x, b, k = _problem(rng, trial, dtype=_PROBLEM_DTYPE)
        check = matches[0] if only else CHECKS[trial % len(CHECKS)]
        check(trial, rng, A, b, k)
        if trial % 10 == 9:
            print(f"[fuzz] {trial + 1 - seed0}/{trials} trials, "
                  f"{len(VIOLATIONS)} violations", flush=True)
    print(f"[fuzz] done: {trials} trials, {len(VIOLATIONS)} violations")
    return 1 if VIOLATIONS else 0


if __name__ == "__main__":
    raise SystemExit(main())

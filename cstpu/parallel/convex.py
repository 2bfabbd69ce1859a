"""Column-sharded (tensor-parallel) convex solvers: basis pursuit ADMM and
ARD reweighting over a device mesh.

BASELINE config 5: reweighted Basis Pursuit with the ARD/SBL prior on a
~1M-atom dictionary column-sharded across chips/hosts. The primal vectors
(x, z, u, w) shard with the dictionary columns, so per-chip state is
m_local-sized; every ADMM iteration needs exactly one n-length all-reduce
(psum of the local A_s @ v_s products) — the same collective pattern as the
sharded pursuit argmax, riding ICI/DCN. The n x n normal-equation factor
AA' = psum(A_s A_s') is computed once and replicated.

The ARD weight rule (parity: ard_weights!,
/root/reference/src/basispursuit.jl:49-65) shards the same way: the kernel
matrix K = eps*I + A diag(|x|/w) A' is a psum of local outer products, its
Cholesky is replicated, and each shard extracts its own quadratic forms
w_j = sqrt(a_j' K^-1 a_j) locally.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P

from cstpu.models.basis_pursuit import _shrink
from cstpu.models.sbl import _f32_matmuls
from jax.scipy.linalg import cho_solve


def _with_matmul_precision(prec: str, fn):
    """Trace `fn` under a chosen TPU matmul precision.

    "float32" (HIGHEST, 6 bf16 passes) is the correctness-proven default
    for every iterative convex path (the bf16 default silently breaks
    ADMM feasibility — see benchmarks/README.md 2026-08-17).
    "tensorfloat32" (HIGH, 3 passes) carries ~f32-grade mantissa coverage
    at half the matmul cost and is offered as the measured middle ground
    (VERDICT round-1 item 8); callers pick per solve."""

    def wrapped(*a, **kw):
        with jax.default_matmul_precision(prec):
            return fn(*a, **kw)

    return wrapped


# Above this many bytes, the whitened copy of the local dictionary shard
# (L^-1 A, a full (n, m_local) temp) no longer pays for itself: at BASELINE
# config 5's single-chip scale (1024 x 1,048,576 f32 = 4 GB) the
# triangular solve's blocked temps + the copy overflow the 16 GB HBM
# (measured: 16.01 G of 15.75 G, r3). The lean path keeps A as the only
# (n, m)-sized buffer and applies the projection through an n x n
# cho_solve per iteration instead.
_WHITEN_BYTES_MAX = 1 << 28     # 256 MB


def _bp_admm_shard_body(A_local, b, w_local, rho, maxiter: int, tol,
                        axis: str, z0_local=None, u0_local=None):
    rho = jnp.asarray(rho, A_local.dtype)
    tol = jnp.asarray(tol, A_local.dtype)
    n, m_local = A_local.shape
    lean = (n * m_local * A_local.dtype.itemsize) > _WHITEN_BYTES_MAX
    if not lean:
        # Row-whiten the constraint exactly as the single-chip path does
        # (models/basis_pursuit._bp_admm): L = chol(psum(A_s A_s')) is
        # replicated, each shard whitens ITS columns, and the projection
        # becomes a psum'd GEMV pair with no per-iteration triangular
        # solve; two passes, same reason as the single-chip path: the
        # first whitening's forward error (O(cond * eps)) leaves the rows
        # measurably non-orthonormal at f32, and the fast projection
        # assumes orthonormality; the second pass contracts the defect
        # quadratically. One extra psum'd n x n Gram + triangular solve,
        # one-time.
        Aw_local, bw = A_local, b
        for _ in range(2):
            AAt = lax.psum(Aw_local @ Aw_local.T, axis)
            L = jnp.linalg.cholesky(AAt)
            Aw_local = solve_triangular(L, Aw_local, lower=True)
            bw = solve_triangular(L, bw, lower=True)

        def project(v_local):  # exact projection onto {x : Ax = b}
            Av = lax.psum(Aw_local @ v_local, axis)
            return v_local - (Av - bw) @ Aw_local

        x0 = bw @ Aw_local  # min-norm feasible point (local)
    else:
        # Memory-lean exact projection: same fixed point, no whitened
        # copy. P(v) = v - A'(AA')^-1 (Av - b) via the replicated n x n
        # Cholesky; the per-iteration cost adds two n x n triangular
        # solves on an n-VECTOR (microseconds) while the GEMV pair over
        # the shard (the real per-iteration cost at this scale) is
        # unchanged. Algebraically this IS the whitened projection
        # composed back through L, so the ADMM iterates match the
        # whitened path up to round-off; the convergence norms live on
        # m-vectors and are identical in both modes.
        AAt = lax.psum(A_local @ A_local.T, axis)
        L = jnp.linalg.cholesky(AAt)

        def _solve_n(v):  # (AA')^-1 v through the cached Cholesky
            return cho_solve((L, True), v)

        def project(v_local):
            Av = lax.psum(A_local @ v_local, axis)
            return v_local - _solve_n(Av - b) @ A_local

        x0 = _solve_n(b) @ A_local  # min-norm feasible point (local)
    relax = jnp.asarray(1.8, A_local.dtype)   # over-relaxation
    mu = jnp.asarray(10.0, A_local.dtype)     # residual balancing
    tau = jnp.asarray(2.0, A_local.dtype)

    def cond(c):
        x, z, u, rho_, t, done = c
        return (t < maxiter) & ~done

    def body(c):
        x, z, u, rho_, t, _ = c
        x = project(z - u)
        xh = relax * x + (1.0 - relax) * z
        z_new = _shrink(xh + u, w_local / rho_)
        u = u + xh - z_new
        # the three convergence norms ride ONE packed scalar collective
        # (each separate psum is a full latency-bound round trip on DCN)
        sq = lax.psum(jnp.stack([
            jnp.sum((x - z_new) * (x - z_new)),
            jnp.sum((z_new - z) * (z_new - z)),
            jnp.sum(z_new * z_new)]), axis)
        pri = jnp.sqrt(sq[0])
        dua = rho_ * jnp.sqrt(sq[1])
        scale = 1.0 + jnp.sqrt(sq[2])
        done = (pri < tol * scale) & (dua < tol * scale)
        # adaptive rho, identical to the unsharded _bp_admm (the docstring
        # promises matching semantics): rebalance every 64 iterations,
        # rescale the scaled dual with it
        adapt = (t % 64) == 63
        up = adapt & (pri > mu * dua)
        dn = adapt & (dua > mu * pri)
        fac = jnp.where(up, tau, jnp.where(dn, 1.0 / tau, 1.0))
        rho_new = jnp.clip(rho_ * fac, 1e-4, 1e6)
        fac = rho_new / rho_
        return x, z_new, u / fac, rho_new, t + 1, done

    z_init = x0 if z0_local is None else z0_local
    u_init = (jnp.zeros((m_local,), A_local.dtype)
              if u0_local is None else u0_local)
    _, z, u, rho_f, _, _ = lax.while_loop(
        cond, body, (x0, z_init, u_init, rho, jnp.int32(0),
                     jnp.bool_(False)))
    # rho_f must accompany (z, u) into any warm start (u is y/rho)
    return z, u, rho_f


@lru_cache(maxsize=64)
def _bp_jit(mesh: Mesh, atoms_axis: str, maxiter: int, tol: float,
            warm: bool, mm_prec: str = "float32"):
    """Memoized jitted sharded-BP callable.

    Rebuilding shard_map + jit per call costs ~1.3 s of retracing on every
    solve (dwarfing the actual ADMM time); callables are cached per
    (mesh, axis, maxiter, tol, warm-start arity, matmul precision). rho is
    a traced operand (the adaptive loop returns its final value for warm
    restarts). Shape changes retrace inside the cached jit as usual.
    """
    body = _with_matmul_precision(
        mm_prec, partial(_bp_admm_shard_body, maxiter=maxiter, tol=tol,
                         axis=atoms_axis))
    if not warm:
        return jax.jit(jax.shard_map(
            lambda A_l, b_l, w_l, rho: body(A_l, b_l, w_l, rho),
            mesh=mesh,
            in_specs=(P(None, atoms_axis), P(None), P(atoms_axis), P()),
            out_specs=(P(atoms_axis), P(atoms_axis), P()),
            check_vma=False,
        ))
    return jax.jit(jax.shard_map(
        lambda A_l, b_l, w_l, rho, z_l, u_l: body(A_l, b_l, w_l, rho,
                                                  z0_local=z_l,
                                                  u0_local=u_l),
        mesh=mesh,
        in_specs=(P(None, atoms_axis), P(None), P(atoms_axis), P(),
                  P(atoms_axis), P(atoms_axis)),
        out_specs=(P(atoms_axis), P(atoms_axis), P()),
        check_vma=False,
    ))


def bp_sharded(A, b, w=None, mesh: Mesh = None, rho: float = 1.0,
               maxiter: int = 20000, tol: float = None,
               atoms_axis: str = "atoms", warm=None,
               matmul_precision: str = "float32"):
    """(Weighted) basis pursuit with a column-sharded dictionary.

    Semantics match cstpu.bp (ADMM, incl. the adaptive-rho rebalancing);
    x/z/u/w live sharded with the columns. Returns (z, u, rho_final) —
    pass `warm=(z, u, rho_final)` to warm-start the next solve (the
    reweighting driver does; u is the SCALED dual y/rho so the adapted
    rho must travel with it). NOTE: callers wanting just the solution
    take element 0.
    """
    n, m = A.shape
    if tol is None:
        tol = 1e-9 if A.dtype == jnp.float64 else 1e-6
    if w is None:
        w = jnp.ones((m,), A.dtype)
    w = jnp.asarray(w, A.dtype)
    n_shards = mesh.shape[atoms_axis]
    if m % n_shards:
        raise ValueError(f"m = {m} not divisible by atom shards {n_shards}")

    tol = float(tol)
    rho = jnp.asarray(rho, A.dtype)
    if warm is None:
        fn = _bp_jit(mesh, atoms_axis, int(maxiter), tol, False,
                     str(matmul_precision))
        return fn(A, b, w, rho)
    fn = _bp_jit(mesh, atoms_axis, int(maxiter), tol, True,
                 str(matmul_precision))
    return fn(A, b, w, jnp.asarray(warm[2], A.dtype), warm[0], warm[1])


def _ard_chunk(m_local: int) -> int:
    """Column-chunk width for the lean ARD sweeps: the largest power-of-two
    divisor of m_local capped at 65536 (256 MB of f32 chunk temps at
    n = 1024)."""
    c = 1
    while c < 65536 and (m_local % (2 * c)) == 0:
        c *= 2
    return c


def _ard_weights_shard_body(A_local, x_local, w_local, eps, iters: int,
                            axis: str):
    eps = jnp.asarray(eps, A_local.dtype)
    n, m_local = A_local.shape
    lean = (n * m_local * A_local.dtype.itemsize) > _WHITEN_BYTES_MAX
    c = _ard_chunk(m_local)

    def body(_, w_l):
        wx = jnp.abs(x_local) / w_l
        if not lean:
            K = eps * jnp.eye(n, dtype=A_local.dtype) + lax.psum(
                (A_local * wx[None, :]) @ A_local.T, axis)
            KA = cho_solve((jnp.linalg.cholesky(K), True), A_local)
            q = jnp.sum(A_local * KA, axis=0)
        else:
            # chunked sweeps: (A * wx) and K^-1 A are full (n, m_local)
            # temps (4 GB at config-5 scale) — stream them in 256 MB
            # column chunks so A stays the only shard-sized buffer
            def kacc(j, Kacc):
                Ac = lax.dynamic_slice(A_local, (0, j * c), (n, c))
                wc = lax.dynamic_slice(wx, (j * c,), (c,))
                return Kacc + (Ac * wc[None, :]) @ Ac.T

            K = eps * jnp.eye(n, dtype=A_local.dtype) + lax.psum(
                lax.fori_loop(0, m_local // c, kacc,
                              jnp.zeros((n, n), A_local.dtype)), axis)
            Lk = jnp.linalg.cholesky(K)

            def qacc(j, qv):
                Ac = lax.dynamic_slice(A_local, (0, j * c), (n, c))
                qc = jnp.sum(Ac * cho_solve((Lk, True), Ac), axis=0)
                return lax.dynamic_update_slice(qv, qc, (j * c,))

            q = lax.fori_loop(0, m_local // c, qacc,
                              jnp.zeros((m_local,), A_local.dtype))
        # dtype-eps floor (global max over shards): a rounding-negative
        # form for a pruned atom must not clamp to an exact 0 weight —
        # the next |x|/w would NaN the solve (models/basis_pursuit.py)
        floor = jnp.maximum(
            8 * jnp.finfo(A_local.dtype).eps * lax.pmax(jnp.max(q), axis),
            jnp.finfo(A_local.dtype).tiny)
        return jnp.sqrt(jnp.maximum(q, floor))

    return lax.fori_loop(0, iters, body, w_local)


@lru_cache(maxsize=64)
def _ard_jit(mesh: Mesh, atoms_axis: str, eps: float, iters: int,
             mm_prec: str = "float32"):
    body = _with_matmul_precision(
        mm_prec, partial(_ard_weights_shard_body, eps=eps, iters=iters,
                         axis=atoms_axis))
    return jax.jit(jax.shard_map(
        lambda A_l, x_l, w_l: body(A_l, x_l, w_l),
        mesh=mesh,
        in_specs=(P(None, atoms_axis), P(atoms_axis), P(atoms_axis)),
        out_specs=P(atoms_axis),
        check_vma=False,
    ))


def ard_weights_sharded(A, x, w, mesh: Mesh, eps: float, iters: int = 8,
                        atoms_axis: str = "atoms"):
    """Column-sharded ARD weights (see module docstring)."""
    if bool(jnp.any(w == 0)):
        raise ValueError("weights cannot be zero")  # parity with the
    #                     unsharded rule (src/basispursuit.jl:50-51)
    return _ard_jit(mesh, atoms_axis, float(eps), int(iters))(A, x, w)


def bp_ard_sharded(A, b, mesh: Mesh, eps: float = 1e-2, maxiter: int = 8,
                   min_decrease: float = 1e-8, atoms_axis: str = "atoms",
                   maxiter_admm: int | None = None,
                   admm_chunk: int | None = None, **bp_kwargs):
    """ARD-reweighted basis pursuit, column-sharded end to end.

    The distributed counterpart of cstpu.bp_ard (parity:
    /root/reference/src/basispursuit.jl:70-74 + :18-31); per outer
    iteration: one sharded BP solve + one sharded ARD weight fixed point.
    `maxiter` is the OUTER reweighting count; `maxiter_admm` caps the
    inner ADMM solve (bp_sharded's maxiter — the names collide, hence
    the alias). `admm_chunk` splits each inner solve into warm-restarted
    device programs of at most that many iterations: at config-5 scale a
    full 6000-iteration while_loop over a 4 GB dictionary is a single
    >60 s device program, long enough to trip device/tunnel watchdogs —
    chunking bounds program runtime without changing the fixed point
    (rho travels with the warm start; one compile since every chunk has
    the same static maxiter)."""
    m = A.shape[1]
    if maxiter_admm is not None:
        bp_kwargs = {**bp_kwargs, "maxiter": int(maxiter_admm)}
    mm_prec = str(bp_kwargs.get("matmul_precision", "float32"))

    def solve(w, warm):
        if not admm_chunk:
            return bp_sharded(A, b, w, mesh, atoms_axis=atoms_axis,
                              warm=warm, **bp_kwargs)
        total = int(bp_kwargs.get("maxiter", 20000))
        kw = {**bp_kwargs, "maxiter": int(admm_chunk)}
        out = warm
        for _ in range(-(-total // int(admm_chunk))):
            out = bp_sharded(A, b, w, mesh, atoms_axis=atoms_axis,
                             warm=out, **kw)
        return out

    x, u, rho = solve(None, None)
    w = jnp.ones((m,), A.dtype)
    for _ in range(1, int(maxiter)):
        # call the jitted fixed point directly: the public entry's
        # zero-weight check is a blocking device-to-host sync of the full
        # sharded vector, validating an invariant the fixed point's
        # dtype-eps floor already guarantees for internally-produced w
        w = _ard_jit(mesh, atoms_axis, float(eps), 8, mm_prec)(A, x, w)
        xs, u, rho = solve(w, (x, u, rho))
        if float(jnp.linalg.norm(xs - x)) < min_decrease:
            return xs
        x = xs
    return x


# ---------------------------------------------------------------------------
# Sharded proximal-gradient path (ISTA/FISTA)
# ---------------------------------------------------------------------------

@_f32_matmuls
def _ista_shard_body(A_local, b, w_local, stepsize, maxiter: int,
                     axis: str, accelerated: bool):
    """(F)ISTA with x sharded over the atom axis: the only communication
    is the n-length psum of the partial fits A_s x_s per iteration; the
    gradient's correlation (r @ A_s) and the shrinkage are local.
    Parity: cstpu.models.basis_pursuit._ista/_fista."""
    m_local = A_local.shape[1]

    def fit(x_local):
        return lax.psum(A_local @ x_local, axis)

    def body(i, carry):
        x, y, t = carry
        r = b - fit(y)
        g = r @ A_local
        x_new = _shrink(y + 2 * stepsize * g, w_local * stepsize)
        if not accelerated:
            return x_new, x_new, t
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x0 = jnp.zeros((m_local,), A_local.dtype)
    x, _, _ = lax.fori_loop(0, maxiter, body,
                            (x0, x0, jnp.asarray(1.0, A_local.dtype)))
    return x


@lru_cache(maxsize=64)
def _ista_jit(mesh: Mesh, atoms_axis: str, maxiter: int, stepsize: float,
              accelerated: bool, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    step = jnp.asarray(stepsize, dtype)

    def shard_fn(A_local, b, w_local):
        return _ista_shard_body(A_local, b, w_local, step, maxiter,
                                atoms_axis, accelerated)

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, atoms_axis), P(None), P(atoms_axis)),
        out_specs=P(atoms_axis),
        check_vma=False,
    ))


def ista_sharded(A, b, lam, mesh: Mesh, maxiter: int = 1024,
                 stepsize: float | None = 1e-2, atoms_axis: str = "atoms",
                 accelerated: bool = False):
    """(F)ISTA with the dictionary and solution column-sharded: one
    n-length psum per iteration. `accelerated=True` is FISTA (Nesterov
    momentum). Semantics of cstpu.ista / cstpu.fista, including
    `stepsize=None` for the spectral (power-iteration) auto step."""
    from cstpu.models.basis_pursuit import _auto_stepsize

    n, m = A.shape
    n_shards = mesh.shape[atoms_axis]
    if m % n_shards:
        raise ValueError(f"m = {m} not divisible by atom shards {n_shards}")
    if stepsize is None:
        stepsize = float(_auto_stepsize(A))
    w = jnp.broadcast_to(jnp.asarray(lam, A.dtype), (m,))
    fn = _ista_jit(mesh, atoms_axis, int(maxiter), float(stepsize),
                   bool(accelerated), A.dtype.name)
    return fn(A, b, w)


def fista_sharded(A, b, lam, mesh: Mesh, maxiter: int = 1024,
                  stepsize: float | None = 1e-2, atoms_axis: str = "atoms"):
    """Sharded FISTA (see ista_sharded)."""
    return ista_sharded(A, b, lam, mesh, maxiter, stepsize, atoms_axis,
                        accelerated=True)

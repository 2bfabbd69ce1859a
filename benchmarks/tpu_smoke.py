"""Hardware conformance smoke: drive EVERY public solver on the real TPU.

The CPU-f64 conformance suite (tests/) cannot catch TPU-f32 failures —
plain `sbl` produced all-NaN on hardware while every CPU test was green
(the MacKay denominator rounds negative in f32; fixed in models/sbl.py).
This sweep solves one small planted problem per public entry point ON THE
DEVICE and asserts support recovery (or residual fit for the
approximation-regime solvers), printing one status line each.

Run:  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:/root/.axon_site \
          timeout 3600 python benchmarks/tpu_smoke.py
Exit code 0 = all pass. Expect ~10-20 min of tunnel compiles on first run.
"""

from __future__ import annotations

import os
import sys as _sys
import traceback

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import cstpu
    from cstpu import perturb, sparse_data, support

    print(f"device: {jax.devices()[0].device_kind} "
          f"backend={jax.default_backend()}", flush=True)

    DELTA = 1e-2
    kd = jax.random.PRNGKey(123)
    A, x, b = sparse_data(kd, n=64, m=96, k=3, dtype=jnp.float32)
    y = perturb(jax.random.PRNGKey(124), b, DELTA / 2)
    As, xs_, bs = sparse_data(jax.random.PRNGKey(125), n=64, m=64, k=3,
                              dtype=jnp.float32)  # square (backward)
    ys = perturb(jax.random.PRNGKey(126), bs, DELTA / 2)
    ref = list(support(x))
    refs = list(support(xs_))

    def sol_support(sol):
        if hasattr(sol, "nzind"):
            return sorted(np.asarray(sol.idx)[np.asarray(sol.mask)].tolist())
        v = np.abs(np.asarray(sol))
        return sorted(np.flatnonzero(v > 10 * DELTA).tolist())

    CASES = [
        ("mp", lambda: cstpu.mp(A, y, 30), "resid"),
        ("omp", lambda: cstpu.omp(A, y, 3), ref),
        ("gomp", lambda: cstpu.gomp(A, y, 2, 4), "superset"),
        ("oblivious", lambda: cstpu.oblivious(A, y, 3), ref),
        ("fr", lambda: cstpu.fr(A, y, sparsity=3), ref),
        ("br", lambda: cstpu.br(As, ys, sparsity=3), refs),
        ("br_naive", lambda: cstpu.br(As, ys, sparsity=3, naive=True), refs),
        ("fbr", lambda: cstpu.fbr(As, ys, sparsity=3), refs),
        ("lace", lambda: cstpu.lace(As, ys, sparsity=3), refs),
        ("sp", lambda: cstpu.sp(A, y, 3, DELTA), ref),
        ("ompr", lambda: cstpu.ompr(A, y, 3, DELTA), ref),
        ("srr_i1", lambda: cstpu.srr(A, y, 3, DELTA, initialization=1), ref),
        ("srr_i2", lambda: cstpu.srr(A, y, 3, DELTA, initialization=2), ref),
        ("srr_i3", lambda: cstpu.srr(A, y, 3, DELTA, initialization=3,
                                     key=jax.random.PRNGKey(7)), ref),
        ("rmp_k", lambda: cstpu.rmp(A, y, k=3), ref),
        ("rmp_delta", lambda: cstpu.rmp(A, y, delta=DELTA), ref),
        ("foba", lambda: cstpu.foba(A, y, DELTA), ref),
        ("sbl", lambda: cstpu.sbl(A, y, DELTA ** 2), ref),
        ("fsbl", lambda: cstpu.fsbl(A, y, DELTA ** 2), ref),
        ("rmps", lambda: cstpu.rmps(A, y, DELTA ** 2), ref),
        ("rmps_noise", lambda: cstpu.rmps_estimate_noise(
            A, y, DELTA ** 2, 1.0, DELTA ** 2)[0], ref),
        # traced variants are separate jitted programs (trace scatters in
        # the loop carry) — drive them on hardware too
        ("fsbl_traced", lambda: cstpu.fsbl_traced(A, y, DELTA ** 2)[0], ref),
        ("rmps_traced", lambda: cstpu.rmps_traced(A, y, DELTA ** 2)[0], ref),
        ("rmps_noise_b", lambda: cstpu.rmps_estimate_noise_batch(
            A, y[None, :], DELTA ** 2, 1.0, DELTA ** 2)[0][0], ref),
        ("bp", lambda: cstpu.bp(A, b), ref),
        ("bp_candes", lambda: cstpu.bp_candes(A, b), ref),
        ("bp_ard", lambda: cstpu.bp_ard(A, b), ref),
        ("bpd", lambda: cstpu.bpd(A, y, DELTA), "resid"),
        ("bpd_candes", lambda: cstpu.bpd_candes(A, y, DELTA), "resid"),
        ("bpd_ard", lambda: cstpu.bpd_ard(A, y, DELTA), "resid"),
        ("ista", lambda: cstpu.ista(A, y, DELTA / 10, maxiter=2048,
                                    stepsize=None), "resid"),
        ("fista", lambda: cstpu.fista(A, y, DELTA / 10, maxiter=2048,
                                      stepsize=None), "resid"),
        # exhaustive returns the best support tuple directly (host numpy)
        ("exhaustive", lambda: jnp.zeros((16,), jnp.float32).at[
            jnp.asarray(cstpu.exhaustive(A[:, :16], A[:, :16] @ (
                jnp.zeros((16,), jnp.float32)
                .at[jnp.array([2, 5, 9])].set(1.0)), 3))].set(1.0),
         [2, 5, 9]),
    ]

    # batched entry points at the fused kernels' SMALL shape corner
    # (m = 128, the minimum the VMEM gates accept; the benchmark suite
    # only exercises m = 1024+): dispatch must pick the kernels and
    # still recover exactly
    kb2 = jax.random.PRNGKey(200)
    A2 = jax.random.normal(kb2, (64, 128), jnp.float32)
    A2 = A2 / jnp.sqrt(jnp.sum(A2 * A2, axis=0, keepdims=True))
    sup2 = jax.vmap(lambda s: jax.random.permutation(s, 128)[:3])(
        jax.random.split(jax.random.PRNGKey(201), 8))
    X2 = jax.vmap(lambda s: jnp.zeros((128,), jnp.float32).at[s].set(1.0))(
        sup2)
    Bs2 = X2 @ A2.T
    A3 = jax.random.normal(jax.random.PRNGKey(202), (128, 128), jnp.float32)
    A3 = A3 / jnp.sqrt(jnp.sum(A3 * A3, axis=0, keepdims=True))
    X3 = jax.vmap(lambda s: jnp.zeros((128,), jnp.float32).at[s].set(1.0))(
        sup2)
    Bs3 = X3 @ A3.T

    def batch_recovery(sol, sup):
        got = np.where(np.asarray(sol.mask), np.asarray(sol.idx), 10 ** 6)
        planted = np.asarray(sup)
        return all(set(planted[i]) <= set(got[i])
                   for i in range(len(planted)))

    BATCH_CASES = [
        ("omp_batch_m128", lambda: cstpu.omp_batch(A2, Bs2, 3), sup2),
        ("fr_batch_m128", lambda: cstpu.fr_batch(A2, Bs2, sparsity=3), sup2),
        ("fbr_batch_m128", lambda: cstpu.fbr_batch(A3, Bs3, sparsity=3),
         sup2),
        ("lace_batch_m128", lambda: cstpu.lace_batch(A3, Bs3, sparsity=3),
         sup2),
        # every other fused-dispatching batch entry at the same corner
        ("gomp_batch_m128", lambda: cstpu.gomp_batch(A2, Bs2, 2, 4), sup2),
        ("sp_batch_m128", lambda: cstpu.sp_batch(A2, Bs2, 3, DELTA), sup2),
        ("ompr_batch_m128", lambda: cstpu.ompr_batch(A2, Bs2, 3, DELTA),
         sup2),
        ("srr_batch_m128", lambda: cstpu.srr_batch(A2, Bs2, 3, DELTA),
         sup2),
        ("rmp_batch_m128", lambda: cstpu.rmp_batch(A2, Bs2, delta=DELTA,
                                                   kmax=8), sup2),
        # the k variant rides the same fused kernel with kfinal >= 0
        # (kmax = n holds the exhaustion support, no capped fallback)
        ("rmp_batch_k_m128", lambda: cstpu.rmp_batch(
            A2, Bs2, k=3, kmax=A2.shape[0]), sup2),
        ("foba_batch_m128", lambda: cstpu.foba_batch(A2, Bs2, DELTA,
                                                     kmax=8), sup2),
    ]

    # mp_batch returns dense (B, m) — residual-fit oracle like the `mp` case
    def mp_batch_ok():
        X = cstpu.mp_batch(A2, Bs2, 60)
        r = jnp.linalg.norm(Bs2 - X @ A2.T, axis=1)
        return bool(jnp.all(jnp.isfinite(X)) and jnp.all(r < 3 * DELTA))

    failures = []
    try:
        ok = mp_batch_ok()
        print(f"{'PASS' if ok else 'FAIL'} {'mp_batch_m128':16s} "
              f"batch residual", flush=True)
        if not ok:
            failures.append("mp_batch_m128")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {'mp_batch_m128':16s} raised "
              f"{type(e).__name__}: {e}", flush=True)
        failures.append("mp_batch_m128")
    for name, run, sup in BATCH_CASES:
        try:
            ok = batch_recovery(run(), sup)
            print(f"{'PASS' if ok else 'FAIL'} {name:16s} batch recovery",
                  flush=True)
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name:16s} raised {type(e).__name__}: {e}",
                  flush=True)
            failures.append(name)

    for name, run, oracle in CASES:
        try:
            sol = run()
            dense = (sol.todense() if hasattr(sol, "todense")
                     else jnp.asarray(sol))
            finite = bool(jnp.all(jnp.isfinite(dense)))
            if oracle == "resid":
                # every resid-oracle case solves against (A, y); backward
                # solvers all use support oracles on the square system
                fit = float(jnp.linalg.norm(A @ dense - y))
                ok = finite and fit < 3 * DELTA
                detail = f"resid={fit:.2e}"
            elif oracle == "superset":
                got = sol_support(sol)
                ok = finite and set(ref) <= set(got)
                detail = f"support={got}"
            else:
                got = sol_support(sol)
                ok = finite and got == sorted(int(i) for i in oracle)
                detail = f"support={got}"
            print(f"{'PASS' if ok else 'FAIL'} {name:12s} {detail}",
                  flush=True)
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — a smoke must not abort
            print(f"FAIL {name:12s} raised {type(e).__name__}: {e}",
                  flush=True)
            traceback.print_exc(limit=2)
            failures.append(name)

    total = len(CASES) + len(BATCH_CASES) + 1  # +1: mp_batch_m128
    print(f"{total - len(failures)}/{total} passed"
          + (f"; FAILURES: {failures}" if failures else ""), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

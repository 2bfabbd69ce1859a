"""On-chip per-phase ablation of the fused SP kernel (config 2b shape).

Compiles one kernel variant per disabled phase (static `ablate` string)
and times each at a FORCED outer-iteration count so every variant does
identical round structure — the per-phase cost is the delta vs the full
"force" baseline. Recovery is meaningless for ablated variants (the math
is intentionally skipped); this is a timing instrument only, built to
answer VERDICT r4 item 2: does the rebuild inversion or the selection
floor bind the remaining SP gap to the 4M atom-sel/s target?

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/sp_ablation.py [outers]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    outers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from benchmarks.suite import _planted
    from cstpu.ops.fused_twostage import sp_fused_solve

    B, n, m, k = 64, 1024, 8192, 32
    A, X, Bs, sup = _planted(jax.random.PRNGKey(2), B, n, m, k)

    variants = [
        ("force", "full pipeline (baseline)"),
        ("force,noinv", "rebuild bordered inversion removed"),
        ("force,nocg", "union CG solve removed"),
        ("force,noacq", "top-k selection loop removed"),
        ("force,noblocks", "GU/W/S block GEMMs removed"),
        ("force,nocompact", "compaction permutation GEMMs removed"),
        ("force,norebuild", "entire rebuild (Gram+inv+refit) removed"),
        ("force,noacq,noblocks,nocg,nocompact,norebuild",
         "everything but correlation + loop shell"),
    ]
    results = {}
    for ab, desc in variants:
        t_c0 = time.perf_counter()
        sol, r = sp_fused_solve(A, Bs, k, maxiter=outers, ablate=ab)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t_c0
        # two-point chained protocol: per-call dispatch overhead on the
        # tunnel is ~40-80 ms, so time N chained solves via input nudge
        reps = 8
        t0 = time.perf_counter()
        cur = Bs
        for _ in range(reps):
            cur = cur * (1.0 + 1e-7)
            sol, r = sp_fused_solve(A, cur, k, maxiter=outers, ablate=ab)
        jax.block_until_ready(r)
        t1 = time.perf_counter()
        reps2 = 24
        cur = Bs
        t2 = time.perf_counter()
        for _ in range(reps2):
            cur = cur * (1.0 + 1e-7)
            sol, r = sp_fused_solve(A, cur, k, maxiter=outers, ablate=ab)
        jax.block_until_ready(r)
        t3 = time.perf_counter()
        ms = ((t3 - t2) - (t1 - t0)) / (reps2 - reps) * 1e3
        results[ab] = ms
        print(f"{ab:55s} {ms:8.3f} ms/solve   (compile {compile_s:.0f}s)"
              f"  # {desc}", flush=True)
    base = results.get("force")
    if base:
        print("\nphase cost (baseline - ablated):")
        for ab, ms in results.items():
            if ab != "force":
                print(f"  {ab:50s} {base - ms:8.3f} ms")


if __name__ == "__main__":
    main()

"""On-chip per-phase ablation of the fused SP kernel (config 2b shape).

Compiles one kernel variant per disabled phase (static `ablate` string)
and times each with the CHAINED two-point protocol (reps ride a fori_loop
inside one jit; per-call dispatch on the tunnel is ~40-80 ms and would
otherwise swamp sub-ms solves — the first version of this script learned
that the hard way). All variants run a FORCED outer-iteration count so
every variant does identical round structure — the per-phase cost is the
delta vs the full "force" baseline. Recovery is meaningless for ablated
variants (the math is intentionally skipped); this is a timing instrument
only, built to answer VERDICT r4 item 2: does the rebuild inversion or
the selection floor bind the remaining SP gap to 4M atom-sel/s?

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/sp_ablation.py [outers]
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def main():
    outers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from benchmarks.suite import _planted, _timers
    from cstpu.ops.fused_twostage import sp_fused_solve

    B, n, m, k = 64, 1024, 8192, 32
    A, X, Bs, sup = _planted(jax.random.PRNGKey(2), B, n, m, k)
    per_rep = _timers()

    def chain_for(ab):
        @partial(jax.jit, static_argnames=("reps",))
        def chain(Bs_, reps: int):
            def body(i, acc):
                sol, r = sp_fused_solve(
                    A, Bs_ * (1.0 + i.astype(jnp.float32) * 1e-7), k,
                    maxiter=outers, ablate=ab)
                return acc + jnp.sum(r) + jnp.sum(sol.val)
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return chain

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
        try:
            ms = per_rep(chain_for(ab), Bs, 1, 5) * 1e3
        except RuntimeError as e:
            print(f"{ab:55s} INVALID ({e})", flush=True)
            continue
        results[ab] = ms
        print(f"{ab:55s} {ms:8.3f} ms/solve   # {desc}", flush=True)
    base = results.get("force")
    if base:
        print("\nphase cost (baseline - ablated):")
        for ab, ms in results.items():
            if ab != "force":
                print(f"  {ab:50s} {base - ms:8.3f} ms")


if __name__ == "__main__":
    main()

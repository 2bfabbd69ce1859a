"""Same-session interleaved A/B: in-kernel sorted-solution epilogue vs
the XLA `_to_solution` stage (VERDICT r4 weak-5 — one timing boundary).

Each arm times the FULL public path (kernel + solution assembly + value
fetch) with the chained two-point protocol; arms alternate A/B/A/B so
session weather cancels. Run on the axon device.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from benchmarks.suite import _planted, _timers
    from cstpu.ops.fused_solve import omp_fused_solve

    B, n, m, k = 64, 1024, 8192, 32
    A, X, Bs, sup = _planted(jax.random.PRNGKey(2), B, n, m, k)
    per_rep = _timers()

    def chain_for(in_kernel: bool):
        @partial(jax.jit, static_argnames=("reps",))
        def chain(Bs_, reps: int):
            def body(i, acc):
                sol, r = omp_fused_solve(
                    A, Bs_ * (1.0 + i.astype(jnp.float32) * 1e-7), k,
                    sort_in_kernel=in_kernel)
                return (acc + jnp.sum(sol.val)
                        + jnp.sum(sol.idx.astype(jnp.float32))
                        + jnp.sum(sol.mask))
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return chain

    chains = {True: chain_for(True), False: chain_for(False)}
    samples = {True: [], False: []}
    for rnd in range(4):
        for arm in (True, False):
            ms = per_rep(chains[arm], Bs, 2, 22) * 1e3
            samples[arm].append(ms)
            print(f"round {rnd} sort_in_kernel={arm}: {ms:.4f} ms/solve",
                  flush=True)
    for arm in (True, False):
        s = sorted(samples[arm])
        print(f"sort_in_kernel={arm}: best {s[0]:.4f} ms  "
              f"median {s[len(s) // 2]:.4f} ms  "
              f"-> {B * k / (s[len(s) // 2] / 1e3) / 1e6:.2f} M atom-sel/s"
              f" median")


if __name__ == "__main__":
    main()

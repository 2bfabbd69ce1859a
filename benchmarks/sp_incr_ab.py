"""Same-session interleaved A/B: incremental Ginv11 maintenance vs the
full per-round rebuild inversion in the fused SP kernel (config 2b).

Production protocol (convergence latch ACTIVE — this is the suite-row
configuration, not the forced-iteration ablation). Recovery asserted in
both arms. Run on the axon device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    from benchmarks.suite import _planted, _recovery, _timers
    from cstpu.models.batched import sp_batch
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
                    maxiter=8, ablate=ab)
                return acc + jnp.sum(r) + jnp.sum(sol.val)
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return chain

    # recovery gate first (public dispatch path)
    sol = sp_batch(A, Bs, k, maxiter=8)
    rec = _recovery(sol, sup, m)
    print(f"recovery (incremental, public path): {rec}", flush=True)
    assert rec == 1.0

    chains = {"incr": chain_for(""), "full": chain_for("noincr")}
    samples = {a: [] for a in chains}
    for rnd in range(4):
        for arm, ch in chains.items():
            ms = per_rep(ch, Bs, 1, 5) * 1e3
            samples[arm].append(ms)
            print(f"round {rnd} {arm}: {ms:.4f} ms/solve", flush=True)
    for arm, s in samples.items():
        s = sorted(s)
        med = s[len(s) // 2]
        print(f"{arm}: best {s[0]:.4f} ms  median {med:.4f} ms  -> "
              f"{B * k / (med / 1e3) / 1e6:.2f} M atom-sel/s median")


if __name__ == "__main__":
    main()

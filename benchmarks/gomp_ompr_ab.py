"""Same-session GOMP (config 2a) and OMPR (config 2c) rows with an
epochs protocol — VERDICT r4 item 5.

Question 2a: is the r4 GOMP reading (5.2M atom-sel/s) vs the r3
all-time best (8.85M) session weather or a code regression? Answer by
running MANY two-point epochs in one session and reporting the spread:
a best epoch near the old number with a wide spread = weather; a tight
spread far below = regression.

Question 2c: a current OMPR row (the only fused body without an r4
number), with the executed-iteration count so the per-iteration cost is
explicit.

Run on the axon device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    from benchmarks.suite import _planted, _recovery, _timers
    from cstpu.models.batched import gomp_batch
    from cstpu.ops.fused_twostage import ompr_fused_solve

    per_rep = _timers()
    B, n, m, k = 64, 1024, 8192, 32
    A, X, Bs, sup = _planted(jax.random.PRNGKey(2), B, n, m, k)

    # --- 2a: GOMP l=4 ----------------------------------------------------
    gsolver = lambda Bs_: gomp_batch(A, Bs_, 4, k)
    rec = _recovery(gsolver(Bs), sup, m)
    print(f"2a gomp recovery: {rec}", flush=True)
    assert rec == 1.0

    @partial(jax.jit, static_argnames=("reps",))
    def gchain(Bs_, reps: int):
        def body(i, acc):
            sol = gsolver(Bs_ * (1.0 + i.astype(jnp.float32) * 1e-7))
            return acc + jnp.sum(sol.val)
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    gs = []
    for e in range(8):
        ms = per_rep(gchain, Bs, 2, 22) * 1e3
        gs.append(ms)
        print(f"2a epoch {e}: {ms:.4f} ms/solve "
              f"({B * k / ms * 1e3 / 1e6:.2f} M)", flush=True)
    s = sorted(gs)
    print(f"2a gomp: best {s[0]:.4f} ms ({B * k / s[0] * 1e3 / 1e6:.2f} M)"
          f"  median {s[4]:.4f} ms ({B * k / s[4] * 1e3 / 1e6:.2f} M)"
          f"  worst {s[-1]:.4f} ms", flush=True)

    # --- 2c: OMPR --------------------------------------------------------
    sol, r, iters = ompr_fused_solve(A, Bs, k, 1e-12, return_iters=True)
    rec = _recovery(sol, sup, m)
    print(f"2c ompr recovery: {rec}  executed_iters: {int(iters)}",
          flush=True)
    assert rec == 1.0

    @partial(jax.jit, static_argnames=("reps",))
    def ochain(Bs_, reps: int):
        def body(i, acc):
            sol, r = ompr_fused_solve(
                A, Bs_ * (1.0 + i.astype(jnp.float32) * 1e-7), k, 1e-12)
            return acc + jnp.sum(r) + jnp.sum(sol.val)
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    os_ = []
    for e in range(6):
        # sub-ms solves need the wide trip counts: at (1, 5) the 4-solve
        # delta (~1 ms) loses to dispatch noise and the guard trips
        try:
            ms = per_rep(ochain, Bs, 2, 42) * 1e3
        except RuntimeError as err:
            print(f"2c epoch {e}: invalid ({err})", flush=True)
            continue
        os_.append(ms)
        print(f"2c epoch {e}: {ms:.4f} ms/solve", flush=True)
    s = sorted(os_)
    it = max(int(iters), 1)
    med = s[len(s) // 2]
    print(f"2c ompr: best {s[0]:.4f} ms  median {med:.4f} ms  "
          f"({med / it:.4f} ms/executed-iter at {it} iters; "
          f"{B * k / med * 1e3 / 1e6:.2f} M atom-sel/s median)")


if __name__ == "__main__":
    main()

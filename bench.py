"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: batched-OMP atom-selection throughput on the BASELINE config-2
style workload (shared 1024 x 8192 Gaussian dictionary, 64 problem
instances, k=32). The reference publishes no numbers (BASELINE.md), so
`vs_baseline` is measured throughput relative to the HBM-roofline ideal:
every OMP step must read the dictionary once from HBM (n*m*4 bytes,
amortized across the whole batch by the batched-GEMM formulation), so
ideal atoms/sec = B * BW / (n*m*4). The BASELINE target is >= 0.8 of
roofline for the correlation pass.

Extra diagnostics (correlation-GEMM GB/s, wall times) go to stderr.
"""

import json
import sys
import time


def _device_bw(dev) -> float:
    """Nominal HBM bandwidth (bytes/s) by device kind."""
    kind = dev.device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819e9
    if "v5p" in kind or "v5" in kind:
        return 2765e9
    if "v6" in kind:
        return 1640e9
    if "v4" in kind:
        return 1228e9
    if "cpu" in kind:
        return 100e9  # nominal, CPU runs are for smoke only
    return 819e9


def _time(fn, reps=5):
    fn()  # warmup + compile
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from cstpu import omp

    dev = jax.devices()[0]
    bw = _device_bw(dev)
    on_cpu = "cpu" in dev.device_kind.lower()

    B, n, m, k = (64, 1024, 8192, 32) if not on_cpu else (8, 256, 1024, 8)

    key = jax.random.PRNGKey(0)
    ka, kx = jax.random.split(key)
    A = jax.random.normal(ka, (n, m), jnp.float32)
    A = A / jnp.sqrt(jnp.sum(A * A, axis=0, keepdims=True))
    # batch of k-sparse ground truths -> measurements
    sup = jax.vmap(lambda kk: jax.random.permutation(kk, m)[:k])(
        jax.random.split(kx, B))
    X = jnp.zeros((B, m), jnp.float32)
    X = jax.vmap(lambda x, s: x.at[s].set(1.0))(X, sup)
    Bs = X @ A.T  # (B, n)

    solve = jax.jit(jax.vmap(lambda bb: omp(A, bb, k).todense(),
                             in_axes=0))

    def run():
        jax.block_until_ready(solve(Bs))

    t = _time(run)
    atoms_per_sec = B * k / t
    ideal = B * bw / (n * m * 4)
    vs = atoms_per_sec / ideal

    # diagnostic: raw correlation GEMM bandwidth
    corr = jax.jit(lambda R: jnp.abs(A.T @ R.T))
    tc = _time(lambda: jax.block_until_ready(corr(Bs)))
    corr_bytes = (n * m + n * B + m * B) * 4
    print(f"[bench] device={dev.device_kind} B={B} n={n} m={m} k={k} "
          f"solve={t*1e3:.2f}ms corr={tc*1e3:.3f}ms "
          f"corr_GBps={corr_bytes/tc/1e9:.1f} roofline_frac={vs:.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "omp_batched_atom_selections_per_sec",
        "value": round(atoms_per_sec, 1),
        "unit": "atoms/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()

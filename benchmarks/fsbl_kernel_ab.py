"""A/B: per-instance fused FSBL + RMPS kernels vs the TPU-default XLA paths.

Interleaves both paths per shape in one process so tunnel/session drift
cancels. Each (n, m, B) triple is a separate compile; n >= 256 is the
shape class whose all-batch predecessor hung the Mosaic compile.

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
           timeout 2400 python -u benchmarks/fsbl_kernel_ab.py [n,m,B ...]
       (default shapes: 128,1024,8  256,1024,8)
"""
import sys
import time

import jax
import jax.numpy as jnp

import cstpu
from cstpu.models.batched import fsbl_batch, rmps_batch
from cstpu.ops.fused_sbl import (fsbl_fused_solve, rmps_fused_solve,
                                 supported_fsbl)

shapes = ([tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
          or [(128, 1024, 8), (256, 1024, 8)])
k, sigma = 8, 1e-2


def timeit(name, fn):
    """fn(Bs) -> output; each steady rep gets a RELATIVELY perturbed
    input (an additive sub-ulp tweak would round to identical bits and
    let a caching layer behind the tunnel serve reps 2-3 — see
    bench.py's protocol)."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(Bs))
    _ = float(jnp.sum(out))  # warm the fetch kernel OUTSIDE the timed window
    t1 = time.perf_counter()
    reps = 3
    t2 = time.perf_counter()
    for rep in range(reps):
        out = jax.block_until_ready(fn(Bs * (1.0 + (rep + 1) * 1e-7)))
    _ = float(jnp.sum(out))  # value fetch: block_until_ready under-syncs
    t3 = time.perf_counter()
    print(f"  {name}: compile+run {t1 - t0:.1f}s, steady "
          f"{(t3 - t2) / reps * 1e3:.2f} ms/batch", flush=True)
    return jax.block_until_ready(fn(Bs))  # conformance compare: clean Bs


for n, m, B in shapes:
    kd = jax.random.PRNGKey(0)
    keys = jax.random.split(kd, B + 1)
    A, x, b = cstpu.sparse_data(keys[0], n=n, m=m, k=k, dtype=jnp.float32)
    Bs = jnp.stack([cstpu.perturb(keys[i + 1], b, sigma) for i in range(B)])
    print(f"n={n} m={m} B={B} k={k} "
          f"supported={supported_fsbl(A, Bs, sigma ** 2)}", flush=True)

    for label, fused_fn, xla_fn in (
        ("fsbl", lambda Bs_: fsbl_fused_solve(A, Bs_, sigma ** 2),
         lambda Bs_: fsbl_batch(A, Bs_, sigma ** 2)),
        ("rmps", lambda Bs_: rmps_fused_solve(A, Bs_, sigma ** 2),
         lambda Bs_: rmps_batch(A, Bs_, sigma ** 2)),
    ):
        xf = timeit(f"{label} fused", fused_fn)
        xr = timeit(f"{label} xla  ", xla_fn)
        err = float(jnp.max(jnp.abs(xf - xr)))
        sup_f = jnp.abs(xf) > sigma
        rec = float(jnp.mean(jax.vmap(
            lambda s: (s == (jnp.abs(x) > 0)).all())(sup_f)
            .astype(jnp.float32)))
        print(f"  {label}: max|fused-xla|={err:.2e} recovery={rec:.3f}",
              flush=True)

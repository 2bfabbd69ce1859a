"""Weak-scaling sweep for the column-sharded production path.

BASELINE config 5 targets >= 85% weak-scaling efficiency on a
column-sharded 1M-atom dictionary at 2+ hosts. This harness makes that
measurable: for shard counts s = 1, 2, 4, ..., it builds a (1, s) mesh
over the first s devices, grows the dictionary so the PER-SHARD atom
count stays constant (weak scaling), runs the fused hybrid OMP path
(per-shard streaming select kernel + collective argmax), and reports

    efficiency(s) = t(1) / t(s)        (ideal weak scaling: 1.0)

Run on a pod slice (all hosts):  python benchmarks/weak_scaling.py
CPU smoke (8 virtual devices, interpret-mode kernels — validates the
harness, NOT a performance number):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python benchmarks/weak_scaling.py 1024

Arguments: [m_per_shard] [B] [k]  (defaults 16384, 8, 32 — per-shard
work equals the single-chip beyond-VMEM streaming regime).
"""

from __future__ import annotations

import json
import os
import sys as _sys
import time

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cstpu.parallel.mesh import make_mesh
    from cstpu.parallel.sharded import omp_sharded_fused

    args = [int(a) for a in _sys.argv[1:]]
    m_per_shard = args[0] if len(args) > 0 else 16384
    B = args[1] if len(args) > 1 else 8
    k = args[2] if len(args) > 2 else 32
    n = 1024
    interp = jax.default_backend() != "tpu"
    if interp:
        # CPU harness validation: tiny shapes, interpret-mode kernels.
        # The per-shard width stays small so the TOTAL aspect ratio m/n
        # remains well-posed for exact recovery at every shard count
        m_per_shard, B, k, n = 128, 8, 4, 64

    ndev = jax.device_count()
    counts = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= ndev]
    base_t = None
    for s in counts:
        mesh = make_mesh((1, s), devices=jax.devices()[:s])
        m = m_per_shard * s
        key = jax.random.PRNGKey(0)
        ka, kx = jax.random.split(key)
        A = jax.random.normal(ka, (n, m), jnp.float32)
        A = A / jnp.sqrt(jnp.sum(A * A, axis=0, keepdims=True))
        sup = jax.vmap(lambda kk: jax.random.permutation(kk, m)[:k])(
            jax.random.split(kx, B))
        X = jax.vmap(lambda ss: jnp.zeros((m,), jnp.float32)
                     .at[ss].set(1.0))(sup)
        Bs = X @ A.T

        solver = lambda Bs_: omp_sharded_fused(  # noqa: E731
            A, Bs_, k, mesh, corr_dtype=jnp.bfloat16, interpret=interp)
        sol = solver(Bs)                        # compile + warm
        jax.block_until_ready(sol.idx)
        import numpy as np
        got = np.where(np.asarray(sol.mask), np.asarray(sol.idx), m)
        rec = float(np.mean([set(np.asarray(sup)[i]) <= set(got[i])
                             for i in range(B)]))
        assert rec == 1.0, f"s={s}: recovery {rec} != 1.0"

        dts = []
        for rep in range(3):                    # min-of-3, perturbed reps
            t0 = time.perf_counter()
            jax.block_until_ready(
                solver(Bs * (1.0 + (rep + 1) * 1e-7)).idx)
            dts.append(time.perf_counter() - t0)
        t = min(dts)
        if base_t is None:
            base_t = t
        print(json.dumps({
            "config": f"weak_scaling_omp_hybrid_{s}shards",
            "shards": s, "m": m, "B": B, "k": k,
            "ms_per_batch": round(t * 1e3, 2),
            "efficiency": round(base_t / t, 4),
            "atom_selections_per_sec": round(B * k / t, 1),
            "interpret_smoke": interp,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local chipless TPU-AOT compile probe — the tunnel-free Mosaic debug loop.

The remote-compile tunnel can degrade to 20-40 minutes per fresh compile;
libtpu's AOT compiler runs LOCALLY with no device and reproduces the exact
Mosaic legalization/VMEM/spill errors in seconds-to-minutes (this is how
r4 bisected the SP kernel's 472 MB register-spill blowup — see
docs/DESIGN.md "Round-4 Mosaic engineering findings").

Usage:
    python benchmarks/aot_compile.py sp      # fused SP kernel, config 2b
    python benchmarks/aot_compile.py omp     # fused OMP kernel
    python benchmarks/aot_compile.py ompr|srr|rmp|foba

Prints compile wall time + the executable's memory analysis, or the full
compiler error. Do NOT run while an axon device process is live (both
dlopen libtpu and fight over /tmp/libtpu_lockfile — rm it after a crash).
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    which = sys.argv[1] if len(sys.argv) > 1 else "sp"
    B, n, m, k = 64, 1024, 8192, 32
    topo = topologies.get_topology_desc(topology_name="v5e:2x2x1",
                                        platform="tpu")
    sh = SingleDeviceSharding(topo.devices[0])
    A = jax.ShapeDtypeStruct((n, m), jnp.float32, sharding=sh)
    Bs = jax.ShapeDtypeStruct((B, n), jnp.float32, sharding=sh)

    from cstpu.ops import fused_solve, fused_twostage as ft

    traces = {
        "sp": lambda: ft._sp_fused_call.trace(
            A, Bs, k, 16 * k, 1e-24, jnp.bfloat16),
        "omp": lambda: fused_solve._omp_fused_call.trace(
            A, Bs, k, jnp.bfloat16),
        "ompr": lambda: ft._ompr_fused_call.trace(
            A, Bs, k, n, 1e-24, 1.0, jnp.bfloat16),
        "srr": lambda: ft._srr_fused_call.trace(
            A, Bs, k, 1, 4 * k, 1e-24, jnp.bfloat16),
        "rmp": lambda: ft._rmp_fused_call.trace(
            A, Bs, k, 1, 1e-4, -1, jnp.bfloat16),
        "foba": lambda: ft._foba_fused_call.trace(
            A, Bs, k, n, 1e-4, jnp.bfloat16),
    }
    if which not in traces:
        print(f"unknown kernel {which!r}; choose from {sorted(traces)}")
        return 2
    low = traces[which]().lower(lowering_platforms=("tpu",))
    t0 = time.time()
    try:
        comp = low.compile()
    except Exception as e:  # noqa: BLE001
        print(f"{which}: COMPILE FAILED after {time.time() - t0:.0f}s:\n"
              f"{type(e).__name__}: {str(e)[:2000]}")
        return 1
    print(f"{which}: compiled in {time.time() - t0:.0f}s")
    print(comp.memory_analysis())
    return 0


if __name__ == "__main__":
    sys.exit(main())

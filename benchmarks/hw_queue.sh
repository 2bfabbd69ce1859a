#!/bin/bash
# Sequential hardware validation queue — run when the compile tunnel is up.
# ONE device job at a time (concurrent processes serialize behind the
# tunnel and inflate each other's timings 3-5x); everything under timeout
# because tunnel hangs happen.
#
#   bash benchmarks/hw_queue.sh [logdir]
#
# Order: cheapest signal first.
#   1. tunnel probe (tiny matmul)
#   2. tpu_smoke — full public-surface conformance (37 cases)
#   3. fsbl_kernel_ab — fused-vs-XLA A/B for the FSBL + RMPS kernels
#   4. bench.py — headline number
set -u
LOG=${1:-/tmp/hw_queue_$(date -u +%H%M)}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon
cd /root/repo

echo "== probe ==" | tee "$LOG/status"
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('TUNNEL_UP', jax.devices()[0].device_kind)" \
    >> "$LOG/status" 2>&1 || { echo "probe FAILED" >> "$LOG/status"; exit 1; }

echo "== tpu_smoke ==" | tee -a "$LOG/status"
timeout 3600 python benchmarks/tpu_smoke.py > "$LOG/smoke.log" 2>&1
echo "smoke exit=$? $(tail -1 "$LOG/smoke.log")" >> "$LOG/status"

echo "== fsbl/rmps kernel A/B ==" | tee -a "$LOG/status"
timeout 5400 python benchmarks/fsbl_kernel_ab.py 128,1024,8 256,1024,8 \
    > "$LOG/ab.log" 2>&1
echo "ab exit=$? $(tail -3 "$LOG/ab.log" | tr '\n' ' ')" >> "$LOG/status"

echo "== bench ==" | tee -a "$LOG/status"
timeout 900 python bench.py > "$LOG/bench.log" 2>&1
echo "bench exit=$? $(tail -1 "$LOG/bench.log")" >> "$LOG/status"

echo "== suite (fused-kernel configs) ==" | tee -a "$LOG/status"
timeout 3600 python benchmarks/suite.py 3 4 > "$LOG/suite34.log" 2>&1
echo "suite34 exit=$? $(tail -1 "$LOG/suite34.log")" >> "$LOG/status"

echo "== weak scaling (single-chip point) ==" | tee -a "$LOG/status"
timeout 1800 python benchmarks/weak_scaling.py > "$LOG/weak.log" 2>&1
echo "weak exit=$? $(tail -1 "$LOG/weak.log")" >> "$LOG/status"

echo "== done ==" >> "$LOG/status"
cat "$LOG/status"

#!/bin/bash
# Sequential hardware validation queue — run when the compile tunnel is up.
# ONE device job at a time (concurrent processes serialize behind the
# tunnel and inflate each other's timings 3-5x); everything under timeout
# because tunnel hangs happen.
#
#   bash benchmarks/hw_queue.sh [logdir]
#
# Order: cheapest/highest-value signal first (r5 edition).
#   1. tunnel probe (tiny matmul)
#   2. bench.py — headline number
#   3. tpu_smoke — full public-surface conformance
#   4. suite config 2 (official 2a/2b rows, NS kernel)
#   5. suite config 8 (config5bpd incl. the secant rows)
#   6. suite config 7 (4e SBL rows at refresh budget 128, honest sync)
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

echo "== bench ==" | tee -a "$LOG/status"
timeout 1800 python bench.py > "$LOG/bench.log" 2>&1
echo "bench exit=$? $(tail -1 "$LOG/bench.log")" >> "$LOG/status"

echo "== tpu_smoke ==" | tee -a "$LOG/status"
timeout 5400 python benchmarks/tpu_smoke.py > "$LOG/smoke.log" 2>&1
echo "smoke exit=$? $(tail -1 "$LOG/smoke.log")" >> "$LOG/status"

echo "== suite config2 ==" | tee -a "$LOG/status"
timeout 5400 python benchmarks/suite.py 2 > "$LOG/suite2.log" 2>&1
echo "suite2 exit=$? $(grep -h '^{' "$LOG/suite2.log" | tail -2 | tr '\n' ' ')" >> "$LOG/status"

echo "== suite config5bpd ==" | tee -a "$LOG/status"
timeout 5400 python benchmarks/suite.py 8 > "$LOG/suite8.log" 2>&1
echo "suite8 exit=$? $(grep -h '^{' "$LOG/suite8.log" | tail -1)" >> "$LOG/status"

echo "== suite config4e ==" | tee -a "$LOG/status"
timeout 5400 python benchmarks/suite.py 7 > "$LOG/suite7.log" 2>&1
echo "suite7 exit=$? $(grep -h '^{' "$LOG/suite7.log" | tail -2 | tr '\n' ' ')" >> "$LOG/status"

echo "== done ==" >> "$LOG/status"
cat "$LOG/status"

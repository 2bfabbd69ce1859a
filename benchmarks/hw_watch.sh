#!/bin/bash
# Tunnel watcher: probe the axon compile tunnel every 15 min; when it
# answers, run the full hardware validation queue (hw_queue.sh) once and
# exit. Writes state to $LOG/watch.log so a human (or the driver) can see
# how long the outage has lasted.
#
#   bash benchmarks/hw_watch.sh [logdir]
set -u
LOG=${1:-/tmp/hw_watch}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon
cd /root/repo

while true; do
    if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('TUNNEL_UP', jax.devices()[0].device_kind)" \
        >> "$LOG/watch.log" 2>&1; then
        echo "$(date -u +%FT%TZ) tunnel UP — firing hw_queue" >> "$LOG/watch.log"
        if bash benchmarks/hw_queue.sh "$LOG/queue_$(date -u +%H%M)"; then
            echo "$(date -u +%FT%TZ) hw_queue done" >> "$LOG/watch.log"
            exit 0
        fi
        # The queue's own probe gate hit a transient flap (HTTP 500s
        # happen) — keep watching instead of abandoning the validation.
        echo "$(date -u +%FT%TZ) hw_queue FAILED (transient flap?) — retrying" \
            >> "$LOG/watch.log"
    else
        echo "$(date -u +%FT%TZ) tunnel still down" >> "$LOG/watch.log"
    fi
    sleep 900
done

#!/bin/bash
# Poll TPU liveness every ~6 min; log one line per probe with the
# first-compute latency.  Each probe is a fresh subprocess (a wedged
# runtime can hang jax.devices()).  Runs until killed or N probes.
LOG=${1:-/tmp/tpu_watch.log}
N=${2:-120}
for i in $(seq 1 "$N"); do
  ts=$(date +%H:%M:%S)
  out=$(timeout 420 python - <<'EOF' 2>&1
import time
t0 = time.time()
import jax, jax.numpy as jnp
t1 = time.time()
y = (jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()
print(f"ALIVE first_compute={time.time()-t1:.0f}s import={t1-t0:.0f}s "
      f"dev={jax.devices()[0]}")
EOF
)
  rc=$?
  line=$(echo "$out" | grep ALIVE | head -1)
  if [ -n "$line" ]; then
    echo "$ts $line" >> "$LOG"
  else
    echo "$ts dead (rc=$rc)" >> "$LOG"
  fi
  sleep 360
done

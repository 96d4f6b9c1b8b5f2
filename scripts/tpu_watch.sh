#!/bin/bash
# Poll TPU liveness every 10 min; append one line per probe to the log.
# Each probe is a fresh subprocess (a wedged runtime can hang jax.devices()).
LOG=${1:-/tmp/tpu_watch.log}
for i in $(seq 1 80); do
  ts=$(date +%H:%M:%S)
  out=$(timeout 150 python - <<'EOF' 2>&1
import jax, jax.numpy as jnp
y = (jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()
print("ALIVE", float(y[0,0]), str(jax.devices()[0]))
EOF
)
  rc=$?
  line=$(echo "$out" | grep ALIVE | head -1)
  if [ -n "$line" ]; then
    echo "$ts ALIVE: $line" >> "$LOG"
    exit 0
  else
    echo "$ts dead (rc=$rc)" >> "$LOG"
  fi
  sleep 600
done

#!/bin/bash
# Background TPU health logger: every ~3 min, probe compute latency and
# scalar-D2H latency in a fresh process (the degraded-runtime windows are
# per-tunnel-state, not per-process — STATUS r5).  Appends one line per
# probe to output/tpu_health.log.  Bounded: exits after MAX_PROBES.
cd "$(dirname "$0")/.." || exit 1
MAX_PROBES=${MAX_PROBES:-200}
for i in $(seq 1 "$MAX_PROBES"); do
  ts=$(date +%H:%M:%S)
  out=$(timeout 240 python - <<'EOF' 2>/dev/null
import time
import jax, jax.numpy as jnp
t0 = time.time()
y = (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
t_mm = time.time() - t0
t0 = time.time()
v = float(y[0, 0])
t_d2h = time.time() - t0
print(f"mm={t_mm:.2f} d2h={t_d2h:.2f}")
EOF
)
  rc=$?
  if [ $rc -ne 0 ]; then out="TIMEOUT_OR_FAIL rc=$rc"; fi
  echo "$ts $out" >> output/tpu_health.log
  sleep 150
done

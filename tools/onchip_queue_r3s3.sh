#!/bin/bash
# Round-3 session-3 on-chip queue: waits for the axon TPU tunnel to recover,
# then runs the validations/measurements queued while it was down
# (ROUND3_NOTES "Session 2"): one-hot-epilogue parity+timing, block re-sweep,
# paired flash-geo, SOS step, final bench. One TPU process at a time
# (two stall each other — CLAUDE.md). Logs to /tmp/onchip_r3s3/.
set -u
OUT=/tmp/onchip_r3s3
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH="${PYTHONPATH:-}:/root/repo"

probe() {
  timeout 300 python - <<'EOF' >>"$OUT/probe.log" 2>&1
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(jnp.sum((x @ x).astype(jnp.float32))))
EOF
}

echo "$(date -u +%T) queue armed" >"$OUT/status"
n=0
until probe; do
  n=$((n+1))
  echo "$(date -u +%T) probe $n failed; retrying in 150s" >>"$OUT/status"
  sleep 150
done
echo "$(date -u +%T) TPU UP after $n failed probes" >>"$OUT/status"

run() {
  name=$1; tmo=$2; shift 2
  echo "$(date -u +%T) START $name" >>"$OUT/status"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "$(date -u +%T) DONE $name rc=$rc" >>"$OUT/status"
}

run fused_render 3000 python tools/perf_fused_render.py
run epilogue_sweep 3600 python tools/perf_epilogue_sweep.py
run flash_corr 2400 python tools/perf_flash_corr.py
run sos_r3 2400 python tools/perf_sos_r3.py
run fused_train 2400 python tools/perf_fused_train.py
run bench 3600 python bench.py
echo "$(date -u +%T) ALL DONE" >>"$OUT/status"

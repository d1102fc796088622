#!/bin/bash
# Ordered TPU measurement backlog — run this the moment the axon tunnel
# recovers from an outage (CLAUDE.md: serialize TPU runs, one process at a
# time). Each step is bounded so a mid-run relapse can't wedge the session.
#
#   bash scripts/tpu_recovery_runlist.sh 2>&1 | tee /tmp/tpu_recovery.log
#
# NOTE: the watcher snapshots this file before running it — bash reads
# scripts by byte offset, so NEVER edit a copy that is currently executing.
#
# Round-5 state (2026-08-20 15:10Z): banked — headline 3016.3/3025.4 img/s
# (1.59x), dw-MA REJECTED (1226), packed-mask REJECTED (902), qresnet18
# im2col A/B (forced 6.3-6.5x worse; auto wins -23.2% bs32), seg 2048x1024
# INT8 5.92x, gan auto 1075 (= r4) / forced-on 461. The ONE missing datum
# is the cls serving --im2col auto leg (probe-skipped in its window) —
# measure it back-to-back with the off leg for a same-window A/B.
set -u
cd /root/repo  # absolute: the watcher runs a /tmp snapshot of this file

for _ in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  awk "BEGIN{exit !($load < 1.5)}" && break
  echo "host busy (loadavg $load); waiting 60s for quiet"
  sleep 60
done

probe() {
  timeout 90 python -c 'import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float(jax.jit(lambda a:(a@a).sum())(x)))' >/dev/null 2>&1
}

run() {
  echo "=== [$(date -u +%FT%TZ)] $* ==="
  if ! probe; then
    echo "=== SKIPPED (tunnel probe failed) ==="
    return 1
  fi
  timeout 1800 "$@"
  echo "=== exit=$? ==="
}

# Final leg: same-run fp32/qat/int8 cls serving under the stem-im2col
# default, so the round-5 cls ratio is same-run honest (r4: 2.74x).
run python scripts/bench_int8_serving.py --modes fp32,qat,int8

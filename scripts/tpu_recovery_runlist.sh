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

# cls serving stem-im2col A/B: the 15:30Z same-window pair ran DURING the
# close-out pytest suite (contended; CLAUDE.md: untrustworthy) and read
# +3% (105.9k vs 102.7k) — the clean cross-window pair read +27%
# (112.1k auto 15:20Z vs 88.0k off 14:56Z). Re-measure the pair on a
# QUIET host, alternating to bound drift.
run python scripts/bench_int8_serving.py --modes int8 --im2col auto
run python scripts/bench_int8_serving.py --modes int8 --im2col off
run python scripts/bench_int8_serving.py --modes int8 --im2col auto

# margin-1.0 confirmation legs (contended 15:30Z attempt measured them
# much WORSE: qresnet18 7.87 ms vs 1.77 auto, gan 677 vs 1075 img/s —
# plausibly real: a 7x7 stem means 49 strided slices; confirm quiet).
run python scripts/latency_table.py --models qresnet18 --batch 32 --reps 3 --im2col-margin 1.0
run python scripts/bench_workload_serving.py --workloads gan --modes int8 --im2col-margin 1.0

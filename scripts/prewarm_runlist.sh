#!/bin/bash
# Pre-warm the persistent compile cache for EVERY measurement leg in
# scripts/tpu_recovery_runlist.sh, without executing anything big on device.
#
# Why this works: the axon tunnel's degraded mode (round 5) still serves
# remote compiles — a novel program compiled in ~12 s mid-outage — while
# large-executable loads and readbacks stall. FROSTNET_COMPILE_ONLY=1 makes
# chain_time / latency_check.time_mode / bench.py --child stop after
# .lower().compile(), so running this DURING an outage banks all the compile
# minutes; when a window opens, every runlist leg starts warm.
#
#   bash scripts/prewarm_runlist.sh 2>&1 | tee /tmp/prewarm.log
set -u
cd "$(dirname "$0")/.."
export FROSTNET_COMPILE_ONLY=1

run() {
  echo "=== [$(date -u +%FT%TZ)] prewarm: $* ==="
  timeout 1500 "$@"
  echo "=== exit=$? ==="
}

# bench legs (plain + dw-MA). The child executes only the small init before
# compiling the step, which survives the degraded mode.
run python bench.py --child
run env BENCH_DW_MA=1 python bench.py --child
run env BENCH_PACKED_MASK=1 python bench.py --child

# qresnet18 im2col A/B legs
run python scripts/latency_table.py --models qresnet18 --batch 8  --reps 3 --im2col auto
run python scripts/latency_table.py --models qresnet18 --batch 8  --reps 3 --im2col on
run python scripts/latency_table.py --models qresnet18 --batch 32 --reps 3 --im2col auto
run python scripts/latency_table.py --models qresnet18 --batch 32 --reps 3 --im2col on

# cls serving im2col A/B
run python scripts/bench_int8_serving.py --modes int8 --im2col auto
run python scripts/bench_int8_serving.py --modes int8 --im2col off

# full-res cityscapes seg point
run python scripts/bench_workload_serving.py --workloads seg --batch 1 --image 1024

# GAN im2col legs
run python scripts/bench_workload_serving.py --workloads gan --im2col auto
run python scripts/bench_workload_serving.py --workloads gan --im2col on

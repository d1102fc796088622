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
# Round-5 state: the headline bench (3016.3 img/s, 1.588x) was banked at
# 13:33Z from the committed warm cache — the UNMEASURED A/B legs now come
# first so a short window yields new information, and the headline re-run
# sits at the end as window-quality revalidation.
set -u
cd /root/repo  # absolute: the watcher runs a /tmp snapshot of this file

# Quiet-host guard: chained timings taken while a pytest suite (or any heavy
# CPU job) runs measure contention, not the device (CLAUDE.md). Wait for the
# 1-min loadavg to settle before measuring, but not forever — the tunnel
# window may be short; a capped wait then proceeding beats missing it.
for _ in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  awk "BEGIN{exit !($load < 1.5)}" && break
  echo "host busy (loadavg $load); waiting 60s for quiet"
  sleep 60
done

# Readback probe: the degraded-tunnel mode that matters passes small RPCs
# but stalls bulk transfers, so legs without internal probes would burn
# their whole timeout. Gate every leg on a fresh probe and skip when dead.
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

# 1. dw-MA float-depthwise whole-step A/B (VERDICT item 2).
run env BENCH_DW_MA=1 python bench.py

# 2. bit-packed STE-mask residuals A/B (round-5 lever: 8x smaller
#    fake-quant backward residuals on an HBM-bound step; exact grads).
run env BENCH_PACKED_MASK=1 python bench.py

# (a combined dw-MA + packed-mask leg was tried and dropped: the joint
#  program fails remote compile with HBM OOM at bs256 (32.92G/15.75G) AND
#  bs128 (16.44G) while each lever alone compiles at bs256 — the packed
#  residual breaks the fusion/memory reuse the dw-MA bwd relies on; only
#  individually-winning levers can become defaults.)

# 3. qresnet18 INT8 im2col A/B (VERDICT item 3): auto gate vs forced-on
#    at bs8/bs32 (auto == off for resnet18: every shape is gate-rejected).
run python scripts/latency_table.py --models qresnet18 --batch 8  --reps 3 --im2col auto
run python scripts/latency_table.py --models qresnet18 --batch 8  --reps 3 --im2col on
run python scripts/latency_table.py --models qresnet18 --batch 32 --reps 3 --im2col auto
run python scripts/latency_table.py --models qresnet18 --batch 32 --reps 3 --im2col on

# 4. cls serving: the auto im2col gate engages every mobile model's stem —
#    verify it does not regress the headline cls serving row (r4: 69.3k).
run python scripts/bench_int8_serving.py --modes int8 --im2col auto
run python scripts/bench_int8_serving.py --modes int8 --im2col off

# 5. Full-resolution cityscapes seg serving point (VERDICT item 6):
#    2048x1024 = the reference latency_check resolution; bs1 to fit HBM.
run python scripts/bench_workload_serving.py --workloads seg --batch 1 --image 1024

# 6. GAN generator with forced im2col (dense 3x3 body: gate says off —
#    measure to confirm or flip).
run python scripts/bench_workload_serving.py --workloads gan --im2col auto
run python scripts/bench_workload_serving.py --workloads gan --im2col on

# 7. Headline driver bench re-run (already banked at 3016.3; revalidates
#    the window and keeps bench_cache warm).
run python bench.py

# 8. Re-warm the entry() compile cache so the driver's compile-check is fast.
run python -c "
import __graft_entry__ as g, jax
fn, args = g.entry()
out = jax.jit(fn)(*args)
print('entry ok', jax.tree_util.tree_map(lambda x: x.shape, out))
"

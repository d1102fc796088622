#!/bin/bash
# Ordered TPU measurement backlog — run this the moment the axon tunnel
# recovers from an outage (CLAUDE.md: serialize TPU runs, one process at a
# time). Each step is bounded so a mid-run relapse can't wedge the session.
#
#   bash scripts/tpu_recovery_runlist.sh 2>&1 | tee /tmp/tpu_recovery.log
#
# Order: cheapest/most-important first, so a short recovery window still
# yields the headline number.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== [$(date -u +%FT%TZ)] $* ==="
  timeout 1800 "$@"
  echo "=== exit=$? ==="
}

# 1. Headline driver bench (QAT train img/s) — warms bench_cache too.
run python bench.py

# 2. Cross-workload INT8-vs-FP32 serving table (PARITY.md pending row).
run python scripts/bench_workload_serving.py --workloads seg,gan,det

# 3. Re-warm the entry() compile cache so the driver's compile-check is fast.
run python -c "
import __graft_entry__ as g, jax
fn, args = g.entry()
out = jax.jit(fn)(*args)
print('entry ok', jax.tree_util.tree_map(lambda x: x.shape, out))
"

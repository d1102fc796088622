#!/usr/bin/env python
"""Capture a real jax.profiler trace of the headline QAT train step.

VERDICT r3 item 5: the ~81%-of-HBM-roofline claim that justifies leaving
~3,000 img/s as final was derived from XLA cost_analysis bytes divided by
measured wall time. This script turns it into a measured fact: one
jax.profiler device trace of the exact bench.py step (frostnet_large_1_0,
224x224, bs256, bf16 compute) on a quiet host, plus a summary of device
busy time and the implied HBM bandwidth.

Run serially (ONE TPU user at a time): python scripts/profile_train_step.py
Outputs: runs/profile_r04/ (trace) and a printed summary for PARITY.md.
"""
import glob
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "bench_cache", "jax"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BATCH, IMAGE, STEPS = 256, 224, 10
LOGDIR = os.path.join(REPO, "runs", "profile_r04")
HBM_PEAK_GB_S = 819.0  # v5e


def build_step():
    from frostnet_tpu.models import create_model
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
    from frostnet_tpu.train import create_train_state, make_train_step

    model = create_model("frostnet_quant_large_1_0", num_classes=1000,
                         dtype=jnp.bfloat16)
    tx = get_optimizer("QSGD", 0.04, weight_decay=grouped_weight_decay(4e-5))
    sample = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    state = state.start_qat()
    batch = {"image": jnp.ones((BATCH, IMAGE, IMAGE, 3), jnp.float32),
             "label": jnp.zeros((BATCH,), jnp.int32)}
    step = make_train_step(model, QAT, num_classes=1000)
    return step, state, batch


def summarize_trace(logdir):
    """Parse the perfetto trace.json.gz: device-track op durations."""
    from frostnet_tpu.utils.profiling import load_device_trace

    loaded = load_device_trace(logdir)
    if loaded is None:
        print("no trace.json.gz found under", logdir)
        return None
    events, proc, threads = loaded
    device_pids = [p for p, n in proc.items()
                   if "TPU" in n or "/device" in n.lower()]
    print("processes:", {p: n for p, n in proc.items()})
    by_track = defaultdict(list)  # (pid,tid) -> [(ts, dur, name)]
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            by_track[(e["pid"], e.get("tid"))].append(
                (e["ts"], e["dur"], e.get("name", "")))
    summary = {}
    for key, evs in sorted(by_track.items(),
                           key=lambda kv: -sum(d for _, d, _ in kv[1])):
        pid, tid = key
        tname = threads.get(key, "")
        busy = sum(d for _, d, _ in evs)
        t0 = min(ts for ts, _, _ in evs)
        t1 = max(ts + d for ts, d, _ in evs)
        span = t1 - t0
        if pid in device_pids or "XLA" in tname or "Steps" in tname:
            summary[f"{proc.get(pid, pid)}/{tname}"] = {
                "events": len(evs), "busy_us": busy, "span_us": span,
                "busy_frac": busy / max(span, 1)}
    # top ops on the busiest device track
    dev_tracks = [(k, v) for k, v in by_track.items()
                  if k[0] in device_pids]
    if dev_tracks:
        k, evs = max(dev_tracks, key=lambda kv: sum(d for _, d, _ in kv[1]))
        by_name = defaultdict(float)
        for _, d, n in evs:
            by_name[n] += d
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
        summary["top_ops_us"] = top
    return summary


def main():
    step, state, batch = build_step()
    # warm + compile with an honest readback
    state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    wall = time.perf_counter() - t0
    print(f"pre-trace: {STEPS} steps in {wall:.3f}s -> "
          f"{BATCH*STEPS/wall:,.0f} img/s")

    os.makedirs(LOGDIR, exist_ok=True)
    jax.profiler.start_trace(LOGDIR)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    wall_traced = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced:    {STEPS} steps in {wall_traced:.3f}s -> "
          f"{BATCH*STEPS/wall_traced:,.0f} img/s")

    summary = summarize_trace(LOGDIR)
    if summary:
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "top_ops_us"}, indent=2, default=str))
        for name, us in summary.get("top_ops_us", []):
            print(f"  {us/1e3:10.2f} ms  {name[:90]}")
    # files present regardless; record the listing
    for p in sorted(glob.glob(os.path.join(LOGDIR, "**", "*"),
                              recursive=True)):
        if os.path.isfile(p):
            print("file:", os.path.relpath(p, LOGDIR),
                  f"{os.path.getsize(p)/1e6:.2f} MB")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""jax.profiler trace of the frozen-INT8 GAN generator forward (serving).

GAN INT8 serving wins only 1.31x over FP32 (runs/workload_serving_r04.txt)
while seg/det/cls win 2.7-3.8x. The generator's FLOPs live in dense 3x3
convs (ResnetGenerator blocks at 64x64x256), which keep the s32 `lax.conv`
formulation (nn/conv.py dense branch). This script answers WHERE the
16 ms/batch goes before any kernel work: device op durations by HLO
category and source line, from a hardware-measured trace.

Run serially (ONE TPU user): python scripts/profile_gan_int8.py
"""
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "bench_cache", "jax"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

BATCH, IMAGE, STEPS = 16, 256, 10
LOGDIR = os.path.join(REPO, "runs", "profile_gan_int8")


def build_int8_forward():
    from frostnet_tpu.gan.networks import define_g
    from frostnet_tpu.nn import INT8, QAT

    model = define_g(ngf=64, netG="resnet_9blocks", quantized=True)
    x = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)

    # frozen deployment semantics: variables are closure constants
    @jax.jit
    def fwd(inp, carry):
        y = model.apply(variables, inp + carry * 0, mode=INT8)
        return jnp.mean(y.astype(jnp.float32))

    return fwd, x


def summarize(logdir):
    from frostnet_tpu.utils.profiling import load_device_trace

    loaded = load_device_trace(logdir)
    if loaded is None:
        print("no trace found under", logdir)
        return
    events, proc, threads = loaded
    dev_pids = {p for p, n in proc.items() if "TPU" in n}
    by_cat = defaultdict(float)
    by_src = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    nevents = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or e["pid"] not in dev_pids:
            continue
        tname = threads.get((e["pid"], e.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        args = e.get("args", {}) or {}
        dur = e["dur"]
        total += dur
        nevents += 1
        cat = args.get("hlo_category", "?")
        by_cat[cat] += dur
        src = args.get("source_info", args.get("source", ""))
        if src:
            by_src[src] += dur
        by_name[e.get("name", "?")] += dur
    print(f"XLA Ops: {nevents} events, busy {total/1e3:.2f} ms "
          f"({total/1e3/STEPS:.2f} ms/step)")
    print("-- by hlo_category (ms/step) --")
    for c, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/1e3/STEPS:8.3f}  {c}")
    print("-- top sources (ms/step) --")
    for s, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {us/1e3/STEPS:8.3f}  {s}")
    print("-- top ops (ms/step) --")
    for n, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {us/1e3/STEPS:8.3f}  {n[:100]}")


def main():
    fwd, x = build_int8_forward()
    acc = jnp.float32(0)
    acc = fwd(x, acc)
    float(acc)  # compile + one honest readback
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(STEPS):
        acc = fwd(x, acc)
    float(acc)
    wall = time.perf_counter() - t0
    print(f"pre-trace: {STEPS} chained fwd in {wall:.3f}s -> "
          f"{BATCH*STEPS/wall:,.0f} img/s ({wall/STEPS*1e3:.2f} ms/batch)")

    os.makedirs(LOGDIR, exist_ok=True)
    jax.profiler.start_trace(LOGDIR)
    acc = jnp.float32(0)
    for _ in range(STEPS):
        acc = fwd(x, acc)
    float(acc)
    jax.profiler.stop_trace()
    summarize(LOGDIR)


if __name__ == "__main__":
    main()

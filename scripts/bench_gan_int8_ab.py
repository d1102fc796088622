#!/usr/bin/env python
"""GAN INT8 whole-net A/B: {s2d tail} x {pallas preshift} — equality + timing.

Four legs over the frozen-INT8 pix2pix resnet_9blocks generator
(16x256x256): baseline XLA composition, the space-to-depth FP-tail route
(ops/s2d_conv), the preshift Pallas dense-3x3 kernel
(ops/pallas_int8_conv VARIANT="preshift"), and both. Asserts the tail
route stays within reassociation noise of baseline, then chained-readback
times each leg (CLAUDE.md timing rules). Run on a quiet host.
"""
import os, sys, time

REPO = "/root/repo"
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "bench_cache", "jax"))

import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

BATCH, IMAGE, STEPS = 16, 256, 20
TIMING = os.environ.get("AB_TIMING", "1") == "1"

from frostnet_tpu.gan.networks import define_g
from frostnet_tpu.nn import INT8, QAT
from frostnet_tpu.nn import conv as _conv
from frostnet_tpu.ops import pallas_int8_conv as pic


model = define_g(ngf=64, netG="resnet_9blocks", quantized=True)
x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, IMAGE, IMAGE, 3), jnp.float32)
variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
    jax.random.PRNGKey(0), x)

def make_fwd(s2d_on, pallas_on):
    _conv.set_s2d_float_conv(s2d_on)
    _conv.set_pallas_int8_dense(pallas_on)
    pic.VARIANT = "preshift"
    @jax.jit
    def full(inp):
        return model.apply(variables, inp, mode=INT8)
    y = np.asarray(jax.device_get(full(x)))
    @jax.jit
    def fwd(inp, carry):
        out = model.apply(variables, inp + carry * 0, mode=INT8)
        return jnp.mean(out.astype(jnp.float32))
    float(fwd(x, jnp.float32(0)))  # force trace+compile under THIS config
    return fwd, y

legs = [("baseline", False, False),
        ("s2d-tail", True, False),
        ("s2d+preshift", True, True),
        ("preshift-only", False, True)]
built = {}
for name, s2d_on, pal_on in legs:
    t0 = time.perf_counter()
    fwd, y = make_fwd(s2d_on, pal_on)
    built[name] = (fwd, y)
    print(f"built {name} in {time.perf_counter()-t0:.1f}s", flush=True)

ref = built["baseline"][1]
for name, _, _ in legs[1:]:
    y = built[name][1]
    if np.array_equal(ref, y):
        print(f"equal(baseline, {name}) = True (bitwise)")
    else:
        d = np.abs(ref.astype(np.float64) - y.astype(np.float64))
        rel = d.max() / (np.abs(ref).max() + 1e-9)
        print(f"equal(baseline, {name}) = False  max_abs={d.max():.3e} "
              f"max_rel={rel:.3e} frac_diff={np.mean(d>0):.4f}")
        # tanh tail output in [-1,1]: reassociation-level diffs only
        assert d.max() < 1e-4, "s2d tail diverges beyond reassociation noise"

if not TIMING:
    sys.exit(0)

def timeit(fwd, label):
    acc = jnp.float32(0)
    acc = fwd(x, acc); float(acc)
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(STEPS):
            acc = fwd(x, acc)
        float(acc)
        wall = time.perf_counter() - t0
        ips = BATCH * STEPS / wall
        best = max(best or 0, ips)
        print(f"  {label} rep{rep}: {wall/STEPS*1e3:.2f} ms/batch  {ips:,.0f} img/s",
              flush=True)
    return best

results = {}
for name, _, _ in legs:
    print(f"{name}:")
    results[name] = timeit(built[name][0], name)
base = results["baseline"]
for name, v in results.items():
    print(f"{name:16s} {v:,.0f} img/s  ({v/base:.2f}x vs baseline)")

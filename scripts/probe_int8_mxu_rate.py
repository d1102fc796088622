#!/usr/bin/env python
"""Probe the achievable MXU rate for int8 vs bf16 dots, XLA and Pallas.

Decides whether the Pallas INT8 conv kernels (ops/pallas_int8_conv.py) can
beat XLA's s32 conv at all: if int8 dot_general lowers to f32/bf16 MXU
passes instead of the native int8 path, the fused kernel's compute leg has
no 2x headroom and only the epilogue-fusion saving (~2.5 ms/GAN step)
remains. v5e peaks: 197 bf16 TFLOPS / 394 int8 TOPS.

Timing: utils.profiling.chain_time feedback="full" (same-shape fns; the
only audited methodology on this transport — CLAUDE.md).

Run serially on a quiet host: python scripts/probe_int8_mxu_rate.py
"""
import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "bench_cache", "jax"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from frostnet_tpu.utils.profiling import chain_time  # noqa: E402

N = int(os.environ.get("PROBE_N", "1024"))  # 2*N^3 MACs per dot
INNER = int(os.environ.get("PROBE_INNER", "64"))  # dots per loop iteration


def xla_int8(x, w):
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc & 0x3f).astype(jnp.int8)  # cheap feedback requant


def xla_bf16(x, w):
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # keep the chained magnitude stable: |x|~2^6 -> |y|~2^6*2^6*2^10=2^22,
    # so scale by 2^-16 to land back at ~2^6 (a *1e-3 scale diverges)
    return (y * jnp.float32(2.0 ** -16)).astype(jnp.bfloat16)


def _pallas_dot_kernel(x_ref, w_ref, o_ref, *, dtype, acc_t, post):
    acc = jax.lax.dot_general(x_ref[...], w_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=acc_t)
    o_ref[...] = post(acc)


def make_pallas(dtype, acc_t, post):
    kern = functools.partial(_pallas_dot_kernel, dtype=dtype, acc_t=acc_t,
                             post=post)
    def fn(x, w):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N), dtype),
            interpret=jax.default_backend() != "tpu",  # CPU smoke runs
        )(x, w)
    return fn


pallas_int8 = make_pallas(jnp.int8, jnp.int32,
                          lambda a: (a & 0x3f).astype(jnp.int8))
pallas_bf16 = make_pallas(jnp.bfloat16, jnp.float32,
                          lambda a: (a * jnp.float32(2.0 ** -16))
                          .astype(jnp.bfloat16))


def main():
    k = jax.random.PRNGKey(0)
    xi = jax.random.randint(k, (N, N), -64, 64, jnp.int32).astype(jnp.int8)
    wi = jax.random.randint(k, (N, N), -64, 64, jnp.int32).astype(jnp.int8)
    xb = xi.astype(jnp.bfloat16)
    wb = wi.astype(jnp.bfloat16)
    macs = 2 * N ** 3
    rows = [("xla_int8", xla_int8, xi, wi), ("xla_bf16", xla_bf16, xb, wb)]
    # the pallas legs keep whole operands in VMEM (no grid): skip when the
    # WORST leg's residency would blow the ~16 MB scoped-vmem limit — that is
    # bf16 at 10 B/elem (2+2 operands, 4 acc, 2 out; int8 is 7 B/elem)
    if N * N * (2 + 2 + 4 + 2) <= 12 * 1024 * 1024:
        rows += [("pallas_int8", pallas_int8, xi, wi),
                 ("pallas_bf16", pallas_bf16, xb, wb)]
    print(f"{N}x{N}x{N} dots, {INNER} per iter, best-of-3 "
          f"(v5e peaks: 197 bf16 TFLOPS / 394 int8 TOPS)")
    for name, fn, x, w in rows:
        s = chain_time(jax.jit(fn), x, w, steps=10, inner=INNER,
                       feedback="full")
        print(f"  {name:12s} {s*1e6:9.2f} us/dot  {macs/s/1e12:8.1f} Tops/s")


if __name__ == "__main__":
    main()

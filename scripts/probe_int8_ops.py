#!/usr/bin/env python
"""Microbenchmarks: does s8xs8->s32 conv beat bf16 conv on this chip, and
what do the requant epilogue / depthwise convs cost?

Representative frostnet_large_1_0 shapes at bs128. Honest chained timing
(device-side fori_loop, one readback).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from frostnet_tpu.utils.profiling import chain_time


def conv(x, w, groups=1, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=out_dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    B = args.batch
    key = jax.random.PRNGKey(0)

    # 1x1 "expand" conv at 14x14: (B,14,14,136) x (1,1,136,816)
    xb = jax.random.normal(key, (B, 14, 14, 136), jnp.bfloat16)
    wb = jax.random.normal(key, (1, 1, 136, 816), jnp.bfloat16)
    x8 = jax.random.randint(key, (B, 14, 14, 136), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (1, 1, 136, 816), -127, 127, jnp.int8)

    t_bf = chain_time(lambda x, w: conv(x, w, out_dtype=jnp.float32), xb, wb,
                      steps=30)
    t_s8 = chain_time(lambda x, w: conv(x, w, out_dtype=jnp.int32), x8, w8,
                      steps=30)
    print(f"1x1 136->816 @14x14: bf16 {t_bf*1e6:.0f} us, s8 {t_s8*1e6:.0f} us "
          f"(ratio {t_bf/t_s8:.2f}x)", flush=True)

    # same conv with fused requant epilogue to uint8
    def s8_requant(x, w):
        acc = conv(x, w, out_dtype=jnp.int32)
        y = acc.astype(jnp.float32) * 0.01 + 0.5
        y = jnp.clip(jnp.round(y / 0.05), 0, 255).astype(jnp.uint8)
        return y

    t_rq = chain_time(s8_requant, x8, w8, steps=30)
    print(f"  + requant epilogue: {t_rq*1e6:.0f} us (epilogue adds "
          f"{(t_rq-t_s8)*1e6:.0f} us)", flush=True)

    # depthwise 5x5 at 28x28x408
    xdb = jax.random.normal(key, (B, 28, 28, 408), jnp.bfloat16)
    wdb = jax.random.normal(key, (5, 5, 1, 408), jnp.bfloat16)
    xd8 = jax.random.randint(key, (B, 28, 28, 408), -127, 127, jnp.int8)
    wd8 = jax.random.randint(key, (5, 5, 1, 408), -127, 127, jnp.int8)
    t_dwb = chain_time(lambda x, w: conv(x, w, groups=408,
                                         out_dtype=jnp.float32),
                       xdb, wdb, steps=30)
    t_dw8 = chain_time(lambda x, w: conv(x, w, groups=408,
                                         out_dtype=jnp.int32),
                       xd8, wd8, steps=30)
    print(f"dw 5x5 @28x28x408: bf16 {t_dwb*1e6:.0f} us, s8 {t_dw8*1e6:.0f} us "
          f"(ratio {t_dwb/t_dw8:.2f}x)", flush=True)

    # stem conv 3x3 s2 at 224 (the big spatial one)
    xs = jax.random.normal(key, (B, 224, 224, 3), jnp.bfloat16)
    ws = jax.random.normal(key, (3, 3, 3, 32), jnp.bfloat16)
    xs8 = jax.random.randint(key, (B, 224, 224, 3), -127, 127, jnp.int8)
    ws8 = jax.random.randint(key, (3, 3, 3, 32), -127, 127, jnp.int8)

    def stem(x, w, od):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=od)

    t_sb = chain_time(lambda x, w: stem(x, w, jnp.float32), xs, ws, steps=30)
    t_s8s = chain_time(lambda x, w: stem(x, w, jnp.int32), xs8, ws8, steps=30)
    print(f"stem 3x3s2 @224: bf16 {t_sb*1e6:.0f} us, s8 {t_s8s*1e6:.0f} us",
          flush=True)


if __name__ == "__main__":
    main()

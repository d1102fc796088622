#!/usr/bin/env python
"""Trustworthy per-op timing: chain SAME-shape ops so each iteration's input
is the previous full output — no reductions (bandwidth pollution), no
element-slicing (XLA can narrow a conv whose output is only sliced).

Used to decide whether XLA's bf16 depthwise lowering is pathological enough
to justify a Pallas VPU depthwise kernel.
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


from frostnet_tpu.utils.profiling import chain_time as _chain_time


def chain_time(op, x, steps=30, reps=3, tag=""):
    # feedback="full": the whole output is the next input, so XLA cannot
    # narrow the op under test (see utils/profiling.chain_time).
    per = _chain_time(op, x, steps=steps, reps=reps, feedback="full")
    print(f"{tag}: {per*1e6:.0f} us/op", flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--hw", type=int, default=28)
    p.add_argument("--ch", type=int, default=408)
    p.add_argument("--k", type=int, default=5)
    args = p.parse_args()
    B, HW, C, K = args.batch, args.hw, args.ch, args.k
    key = jax.random.PRNGKey(0)

    # no-op baseline: measures the per-iteration floor of this transport
    chain_time(lambda x: x + jnp.bfloat16(1.0),
               jax.random.normal(key, (B, HW, HW, C), jnp.bfloat16),
               tag=f"add-scalar (B{B},{HW}x{HW},{C}) bf16")

    wd_b = jax.random.normal(key, (K, K, 1, C), jnp.bfloat16) * 0.05

    def dw_bf16(x):
        return jax.lax.conv_general_dilated(
            x, wd_b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            preferred_element_type=jnp.bfloat16)

    chain_time(dw_bf16, jax.random.normal(key, (B, HW, HW, C), jnp.bfloat16),
               tag=f"dw {K}x{K} bf16")

    wd_8 = jax.random.randint(key, (K, K, 1, C), -20, 20, jnp.int8)

    def dw_s8(x):
        acc = jax.lax.conv_general_dilated(
            x, wd_8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            preferred_element_type=jnp.int32)
        return jnp.clip(acc // 256, -127, 127).astype(jnp.int8)

    chain_time(dw_s8, jax.random.randint(key, (B, HW, HW, C), -127, 127, jnp.int8),
               tag=f"dw {K}x{K} s8 (+requant)")

    w1_b = jax.random.normal(key, (1, 1, C, C), jnp.bfloat16) * 0.02

    def pw_bf16(x):
        return jax.lax.conv_general_dilated(
            x, w1_b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    chain_time(pw_bf16, jax.random.normal(key, (B, HW, HW, C), jnp.bfloat16),
               tag=f"1x1 {C}->{C} bf16")

    w1_8 = jax.random.randint(key, (1, 1, C, C), -20, 20, jnp.int8)

    def pw_s8(x):
        acc = jax.lax.conv_general_dilated(
            x, w1_8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.clip(acc // 4096, -127, 127).astype(jnp.int8)

    chain_time(pw_s8, jax.random.randint(key, (B, HW, HW, C), -127, 127, jnp.int8),
               tag=f"1x1 {C}->{C} s8 (+requant)")


if __name__ == "__main__":
    main()

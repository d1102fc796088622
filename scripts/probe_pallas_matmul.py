#!/usr/bin/env python
"""Validate + time the Pallas s8xs8 matmul w/ fused requant on the real chip.

1) bit-check vs the plain-XLA spec on TPU (interpret mode already matches on
   CPU; Mosaic lowering must agree too),
2) honest chained timing Pallas vs XLA on the 1x1-conv shapes that dominate
   frostnet INT8 serving (M = B*H*W).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from frostnet_tpu.ops.pallas_int8_matmul import (
    int8_matmul_requant, reference_int8_matmul_requant)
from frostnet_tpu.utils.profiling import chain_time


def make_args(m, k, n, seed=0):
    rng = np.random.RandomState(seed)
    x8 = jnp.asarray(rng.randint(-128, 128, (m, k), np.int8))
    w8 = jnp.asarray(rng.randint(-128, 128, (k, n), np.int8))
    scale = jnp.asarray(rng.rand(n).astype(np.float32) * 1e-3 + 1e-4)
    bias = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)
    return x8, w8, scale, bias, jnp.float32(0.02), jnp.float32(7.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    B = args.batch
    print("devices:", jax.devices())

    # bit-check on hardware
    a = make_args(1000, 136, 816)
    want = np.asarray(reference_int8_matmul_requant(*a))
    got = np.asarray(int8_matmul_requant(*a))
    diff = int(np.abs(want.astype(np.int32) - got.astype(np.int32)).max())
    print(f"bitcheck max|diff| = {diff}  ({'OK' if diff == 0 else 'MISMATCH'})")

    # frostnet_large_1_0 1x1 shapes (M = B*H*W)
    shapes = [
        ("expand 14x14 136->816", B * 14 * 14, 136, 816),
        ("project 14x14 816->136", B * 14 * 14, 816, 136),
        ("expand 28x28 64->384", B * 28 * 28, 64, 384),
        ("head 7x7 248->1488", B * 7 * 7, 248, 1488),
    ]
    for name, m, k, n in shapes:
        xa = make_args(m, k, n)
        tx = chain_time(reference_int8_matmul_requant, xa[0], *xa[1:],
                steps=10, inner=16)
        tp = chain_time(int8_matmul_requant, xa[0], *xa[1:],
                steps=10, inner=16)
        gbytes = (m * k + k * n + m * n) / 1e9
        print(f"{name:28s} M={m:6d} K={k:4d} N={n:4d}  "
              f"xla {tx*1e3:7.3f} ms ({gbytes/tx:6.1f} GB/s)  "
              f"pallas {tp*1e3:7.3f} ms ({gbytes/tp:6.1f} GB/s)  "
              f"speedup {tx/tp:5.2f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fused Frost-block kernel on the real chip: bit-check + A/B vs XLA chain."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from frostnet_tpu.ops.pallas_frost_block import (
    FrostBlockSpec, frost_block_int8, random_block_case,
    reference_frost_block_int8, pick_batch_tile)
from frostnet_tpu.utils.profiling import chain_time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    B = args.batch
    print("devices:", jax.devices())

    cases = [
        ("cas 14x14 c96 e360 k5s1 res", FrostBlockSpec(
            h=14, w=14, cin=96, cout=96, kernel=5, stride=1,
            has_squeeze=True, has_expand=True, c_sq=24, c_e=360, residual=True)),
        ("cas 28x28 c40 e336 k5s2", FrostBlockSpec(
            h=28, w=28, cin=40, cout=80, kernel=5, stride=2,
            has_squeeze=True, has_expand=True, c_sq=16, c_e=336, residual=False)),
        ("mb 56x56 c24 e144 k3s1 res", FrostBlockSpec(
            h=56, w=56, cin=24, cout=24, kernel=3, stride=1,
            has_squeeze=False, has_expand=True, c_sq=0, c_e=144, residual=True)),
        ("cas 7x7 c192 e1152 k5s1 res", FrostBlockSpec(
            h=7, w=7, cin=192, cout=192, kernel=5, stride=1,
            has_squeeze=True, has_expand=True, c_sq=48, c_e=1152, residual=True)),
    ]
    for name, spec in cases:
        bt = pick_batch_tile(spec, B) or 1
        x_q, params = random_block_case(spec, B)
        want = np.asarray(jax.jit(
            lambda x: reference_frost_block_int8(x, params, spec))(x_q))
        got = np.asarray(frost_block_int8(x_q, params, spec, bt=bt))
        diff = int(np.abs(want.astype(np.int32) - got.astype(np.int32)).max())
        tx = chain_time(lambda x: reference_frost_block_int8(x, params, spec),
                        x_q, steps=10, inner=8)
        tp = chain_time(lambda x: frost_block_int8(x, params, spec, bt=bt),
                        x_q, steps=10, inner=8)
        print(f"{name:30s} bt={bt:2d} max|diff|={diff}  "
              f"xla {tx*1e3:7.3f} ms  pallas {tp*1e3:7.3f} ms  "
              f"speedup {tx/tp:5.2f}x")


if __name__ == "__main__":
    main()

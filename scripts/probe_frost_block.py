#!/usr/bin/env python
"""Fused Frost-block kernel on the real chip: bit-check + A/B vs XLA chain."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from frostnet_tpu.ops.pallas_frost_block import (
    FrostBlockSpec, build_params, frost_block_int8,
    reference_frost_block_int8, pick_batch_tile)

def _rand_conv(rng, cin, cout, k=1):
    qw = rng.randint(-127, 128, (k, k, cin if k == 1 else 1, cout), np.int8)
    scale = (rng.rand(cout).astype(np.float32) * 1e-3 + 1e-4)
    bias = rng.randn(cout).astype(np.float32) * 0.05
    return qw, scale, bias, np.float32(rng.rand() * 0.05 + 0.01), np.int32(rng.randint(0, 255))


def make_case(spec, batch, seed=0):
    rng = np.random.RandomState(seed)
    x_q = jnp.asarray(rng.randint(0, 256, (batch, spec.h, spec.w, spec.cin), np.uint8))
    c_cat = spec.c_sq + spec.cin if spec.has_squeeze else spec.cin
    params = build_params(
        spec,
        x_scale=np.float32(0.02), x_zp=np.int32(114),
        sq=_rand_conv(rng, spec.cin, spec.c_sq) if spec.has_squeeze else None,
        cat=(np.float32(0.018), np.int32(120)) if spec.has_squeeze else None,
        ex=_rand_conv(rng, c_cat, spec.c_e) if spec.has_expand else None,
        dw=_rand_conv(rng, 1, spec.c_e, k=spec.kernel),
        rd=_rand_conv(rng, spec.c_e, spec.cout),
        add=(np.float32(0.03), np.int32(100)) if spec.residual else None,
    )
    return x_q, params


def timeit(fn, x8, steps=10, inner=8, reps=3):
    def chained(x0):
        def body(i, carry):
            for _ in range(inner):
                y = fn(carry)
                carry = carry + (y[0, 0, 0, 0] * 0).astype(carry.dtype)
            return carry
        final = jax.lax.fori_loop(0, steps, body, x0)
        return fn(final)[0, 0, 0, 0].astype(jnp.float32)

    cfn = jax.jit(chained)
    _ = float(cfn(x8))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(cfn(x8))
        best = min(best, time.perf_counter() - t0)
    return best / (steps * inner + 1)


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
        x_q, params = make_case(spec, B)
        want = np.asarray(jax.jit(
            lambda x: reference_frost_block_int8(x, params, spec))(x_q))
        got = np.asarray(frost_block_int8(x_q, params, spec, bt=bt))
        diff = int(np.abs(want.astype(np.int32) - got.astype(np.int32)).max())
        tx = timeit(lambda x: reference_frost_block_int8(x, params, spec), x_q)
        tp = timeit(lambda x: frost_block_int8(x, params, spec, bt=bt), x_q)
        print(f"{name:30s} bt={bt:2d} max|diff|={diff}  "
              f"xla {tx*1e3:7.3f} ms  pallas {tp*1e3:7.3f} ms  "
              f"speedup {tx/tp:5.2f}x")


if __name__ == "__main__":
    main()

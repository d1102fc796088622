#!/usr/bin/env python
"""Micro-experiments: does the int8 conv requant epilogue fuse on TPU?

Compiles single-op variants and prints the ENTRY computation, to find a
formulation where the s32 accumulator never hits HBM (VERDICT r4 item 1).
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def entry_ops(compiled):
    out, in_entry = [], False
    for line in compiled.as_text().splitlines():
        s = line.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and s == "}":
            break
        if in_entry:
            m = re.match(r"%?[\w.\-]+ = ((?:\([^)]*\))|(?:\S+)) ([\w-]+)", s)
            if m and m.group(2) not in ("parameter", "constant", "tuple",
                                        "get-tuple-element", "bitcast"):
                out.append(f"{m.group(2):<16s} {m.group(1)[:60]}")
    return out


def report(name, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    cost = c.cost_analysis()
    print(f"\n== {name}: bytes={cost.get('bytes accessed', 0)/1e6:.1f}MB ==")
    for op in entry_ops(c):
        print("   ", op)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=256)
    p.add_argument("--w", type=int, default=512)
    args = p.parse_args()

    N, H, W, C, OC = 4, args.h, args.w, 64, 64
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (N, H, W, C), 0, 255, jnp.uint8)
    qw = jax.random.randint(key, (1, 1, C, OC), -127, 127, jnp.int8)
    qw3 = jax.random.randint(key, (3, 3, 1, C), -127, 127, jnp.int8)
    x_scale = jnp.float32(0.05)
    x_zp = jnp.int32(130)
    w_scale = jnp.float32(0.02)
    bias = jnp.zeros((OC,), jnp.float32)
    out_scale = jnp.float32(0.1)
    out_zp = jnp.int32(128)

    def epilogue(acc, w_sum, zp_eff):
        acc = acc - zp_eff * w_sum
        y = acc.astype(jnp.float32) * (x_scale * w_scale) + bias
        y = jnp.maximum(y, 0.0)
        q = jnp.clip(jnp.round(y / out_scale) + out_zp, 0, 255)
        return q.astype(jnp.uint8)

    # A: current formulation — 1x1 conv, s32 accum, f32 epilogue
    def conv1x1(xq):
        x8 = (xq.astype(jnp.int32) - 128).astype(jnp.int8)
        zp_eff = x_zp - 128
        acc = jax.lax.conv_general_dilated(
            x8, qw, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        w_sum = jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
        return epilogue(acc, w_sum, zp_eff)

    # B: dot formulation for the 1x1
    def dot1x1(xq):
        x8 = (xq.astype(jnp.int32) - 128).astype(jnp.int8)
        zp_eff = x_zp - 128
        acc = jax.lax.dot_general(
            x8.reshape(-1, C), qw.reshape(C, OC), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        w_sum = jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
        return epilogue(acc, w_sum, zp_eff).reshape(N, H, W, OC)

    # C: dw 3x3 with zp pad (current)
    def dw3x3(xq):
        x8 = (xq.astype(jnp.int32) - 128).astype(jnp.int8)
        zp_eff = x_zp - 128
        x8p = jax.lax.pad(x8, zp_eff.astype(jnp.int8),
                          ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))
        acc = jax.lax.conv_general_dilated(
            x8p, qw3, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C, preferred_element_type=jnp.int32)
        w_sum = jnp.sum(qw3.astype(jnp.int32), axis=(0, 1, 2))
        return epilogue(acc, w_sum, zp_eff)

    # D: dw 3x3 in f32 (dequantized input, conv pads with real zero like
    # fake-quant; epilogue quantizes) — the "just don't do integer dw" option
    def dw3x3_f32(xq):
        xf = (xq.astype(jnp.float32) - jnp.float32(x_zp)) * x_scale
        wf = qw3.astype(jnp.float32) * w_scale
        y = jax.lax.conv_general_dilated(
            xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        y = jnp.maximum(y.astype(jnp.float32) + bias[:C], 0.0)
        q = jnp.clip(jnp.round(y / out_scale) + out_zp, 0, 255)
        return q.astype(jnp.uint8)

    report("A conv1x1 s32+f32epi", conv1x1, xq)
    report("B dot1x1 s32+f32epi", dot1x1, xq)
    report("C dw3x3 zp-pad s32", dw3x3, xq)
    report("D dw3x3 bf16", dw3x3_f32, xq)
    extra(args)


def extra(args):
    N, H, W, C, OC = 4, args.h, args.w, 64, 64
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (N, H, W, C), 0, 255, jnp.uint8)
    qw = jax.random.randint(key, (1, 1, C, OC), -127, 127, jnp.int8)
    qw3 = jax.random.randint(key, (3, 3, 1, C), -127, 127, jnp.int8)
    x_scale = jnp.float32(0.05)
    x_zp = jnp.int32(130)
    w_scale = jnp.float32(0.02)
    bias = jnp.zeros((OC,), jnp.float32)
    out_scale = jnp.float32(0.1)
    out_zp = jnp.int32(128)

    def epilogue(acc, w_sum, zp_eff):
        acc = acc - zp_eff * w_sum
        y = acc.astype(jnp.float32) * (x_scale * w_scale) + bias
        y = jnp.maximum(y, 0.0)
        q = jnp.clip(jnp.round(y / out_scale) + out_zp, 0, 255)
        return q.astype(jnp.uint8)

    # F: 1x1 as 4-D dot_general (no reshape)
    def dot4d(xq):
        x8 = (xq.astype(jnp.int32) - 128).astype(jnp.int8)
        zp_eff = x_zp - 128
        acc = jax.lax.dot_general(
            x8, qw.reshape(C, OC), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        w_sum = jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
        return epilogue(acc, w_sum, zp_eff)

    # E: dw 3x3 as 9 shifted multiply-adds (one loop fusion, s32 accum)
    def dw_shift(xq):
        zp_eff = x_zp - 128
        x8 = (xq.astype(jnp.int32) - 128).astype(jnp.int8)
        x8p = jax.lax.pad(x8, zp_eff.astype(jnp.int8),
                          ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))
        acc = jnp.zeros((N, H, W, C), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                tap = qw3[dy, dx, 0].astype(jnp.int32)
                acc = acc + tap * x8p[:, dy:dy + H, dx:dx + W, :].astype(jnp.int32)
        w_sum = jnp.sum(qw3.astype(jnp.int32), axis=(0, 1, 2))
        return epilogue(acc, w_sum, zp_eff)

    # G: dw 3x3 shifted adds WITHOUT explicit pad (virtual zp padding via
    # per-tap slices of the unpadded tensor + boundary correction baked in)
    def dw_shift_nopad(xq):
        zp_eff = (x_zp - 128).astype(jnp.int32)
        x8 = (xq.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jnp.zeros((N, H, W, C), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                tap = qw3[dy, dx, 0].astype(jnp.int32)
                sl = x8[:, max(dy-1,0):H+min(dy-1,0), max(dx-1,0):W+min(dx-1,0), :]
                pads = ((0,0,0),
                        (max(1-dy,0), max(dy-1,0), 0),
                        (max(1-dx,0), max(dx-1,0), 0),
                        (0,0,0))
                sl = jax.lax.pad(sl.astype(jnp.int32), zp_eff, pads)
                acc = acc + tap * sl
        w_sum = jnp.sum(qw3.astype(jnp.int32), axis=(0, 1, 2))
        return epilogue(acc, w_sum, zp_eff)

    report("F dot4d 1x1", dot4d, xq)
    report("E dw3x3 shifted-adds", dw_shift, xq)
    report("G dw3x3 shifted-nopad", dw_shift_nopad, xq)


if __name__ == "__main__":
    main()

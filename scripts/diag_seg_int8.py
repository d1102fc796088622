#!/usr/bin/env python
"""Dump compiled TPU HLO + buffer stats for the seg INT8 vs FP32 forward.

Round-4 diagnostic for the seg INT8 serving regression (VERDICT r3 item 1):
bytes/img 952.6 -> 1708.6 MB. Finds what materializes in the optimized HLO.

    python scripts/diag_seg_int8.py --modes int8,fp32 [--image 512]
"""
import argparse
import collections
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

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "s16": 2, "u16": 2, "f16": 2, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"\b(f32|bf16|s32|u32|s8|u8|s16|u16|f16|pred|s64|u64)\[([0-9,]*)\]")


def shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def analyze(hlo_text, batch, top=40):
    """Per-op-kind bytes WRITTEN by ENTRY-computation ops only.

    Instructions inside %fused_computation bodies do not materialize; only
    the ops sequenced in ENTRY (incl. fusion roots) write HBM buffers.
    """
    writes = collections.Counter()
    biggest = []
    in_entry = False
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if stripped.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and stripped == "}":
            in_entry = False
            continue
        if not in_entry:
            continue
        mm = re.match(r"%?[\w.\-]+ = ((?:\([^)]*\))|(?:\w+\[[0-9,]*\][^ ]*)) ([\w-]+)",
                      stripped)
        if not mm:
            continue
        opcode = mm.group(2)
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue
        shapes = SHAPE_RE.finditer(mm.group(1))
        b = sum(shape_bytes(s) for s in shapes)
        if b == 0:
            continue
        writes[opcode] += b
        if b >= 2 * 1024 * 1024:
            biggest.append((b, opcode, stripped[:240]))
    biggest.sort(key=lambda t: -t[0])
    total = sum(writes.values())
    print(f"  -- ENTRY bytes written by opcode (MB/img, batch {batch}; "
          f"total {total / batch / 1e6:.1f}) --")
    for op, b in writes.most_common(15):
        print(f"    {op:<24s} {b / batch / 1e6:10.1f}")
    print(f"  -- {min(top, len(biggest))} largest single writes --")
    for b, opcode, line in biggest[:top]:
        print(f"    {b / batch / 1e6:8.1f} MB/img  {line}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="int8,fp32")
    p.add_argument("--image", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dump", default="runs/seg_hlo")
    args = p.parse_args()

    from frostnet_tpu.nn import FP32, QAT_FROZEN, INT8, QAT
    from frostnet_tpu.segmentation.models import get_seg_model

    mode_map = {"fp32": FP32, "qat": QAT_FROZEN, "int8": INT8}

    model = get_seg_model("mobilenetv3_large", num_classes=19, dtype=jnp.bfloat16)
    h = args.image
    x = jnp.zeros((args.batch, h, 2 * h, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)

    os.makedirs(args.dump, exist_ok=True)
    for name in args.modes.split(","):
        mode = mode_map[name]
        fn = lambda inp: model.apply(variables, inp, mode=mode)  # noqa: E731
        compiled = jax.jit(fn).lower(x).compile()
        cost = compiled.cost_analysis()
        print(f"== {name} ({h}x{2*h}, batch {args.batch}) ==")
        print(f"  flops/img={cost.get('flops', 0)/args.batch/1e6:.1f}M  "
              f"bytes/img={cost.get('bytes accessed', 0)/args.batch/1e6:.2f}MB")
        txt = compiled.as_text()
        path = os.path.join(args.dump, f"{name}_{h}.hlo.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"  optimized HLO -> {path} ({len(txt)/1e6:.1f} MB)")
        analyze(txt, args.batch)


if __name__ == "__main__":
    main()

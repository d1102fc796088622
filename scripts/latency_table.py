#!/usr/bin/env python
"""Per-model FP32/QAT/INT8 latency table on the real chip.

The reference's only machine-readable baseline is the 9-model CPU latency
table (Classification/README.md:31-47, mirrored in BASELINE.md). This runs
our honest chained-timing probe (train/latency_check.py) across the same
model set and prints a markdown table for PARITY.md.

Run serially on a quiet host: python scripts/latency_table.py [--batch 1]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# the reference table's rows (Classification/README.md:33-47), our names
MODELS = [
    "qresnet18",
    "qshufflenet_v2_x0_5",
    "qshufflenet_v2_x1_0",
    "qmobilenet_v2_ReLU",
    "qmobilenet_v2_ReLU6",
    "qmobilenet_v3_large_HS",
    "qmobilenet_v3_small_HS",
    "qmobilenet_v3_large_ReLU",
    "qmobilenet_v3_small_ReLU",
    "frostnet_quant_large_1_0",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--reps", type=int, default=1,
                   help="repetitions per mode; >1 reports median ± spread")
    p.add_argument("--models", default=None, help="comma list override")
    p.add_argument("--im2col", default="auto", choices=["auto", "on", "off"],
                   help="dense-k>1 INT8 im2col route (nn/conv.py): auto = "
                        "modeled-win gate, on/off force for A/Bs")
    p.add_argument("--im2col-margin", type=float, default=None,
                   help="auto-gate margin override (2.0 default; 1.0 also "
                        "engages 7x7x3 stems)")
    args = p.parse_args()

    if args.im2col != "auto":
        from frostnet_tpu.nn.conv import set_int8_dense_im2col
        set_int8_dense_im2col(args.im2col == "on")
    if args.im2col_margin is not None:
        from frostnet_tpu.nn.conv import set_im2col_gate_margin
        set_im2col_gate_margin(args.im2col_margin)

    from frostnet_tpu.train import latency_check

    rows = []
    for name in (args.models.split(",") if args.models else MODELS):
        ns = argparse.Namespace(model=name, backend="fbgemm", num_classes=1000,
                                image_size=224, batch_size=args.batch,
                                iters=args.iters, reps=args.reps, seg=False)
        try:
            r = latency_check.main(ns)
            rows.append((name, r))
        except Exception as e:  # noqa: BLE001 — keep the sweep going
            print(f"| {name} | ERROR {type(e).__name__}: {e} |", flush=True)

    def cell(r, k):
        ms, sp = r[f"{k}_ms"], r.get(f"{k}_spread", 0.0)
        return f"{ms:.2f} ± {sp/2:.2f}" if args.reps > 1 else f"{ms:.2f}"

    print(f"\nbatch={args.batch} iters={args.iters} reps={args.reps} "
          "(median ± half-spread, chained timing)")
    print("| model | FP32 ms | QAT ms | INT8 ms | INT8 vs FP32 |")
    print("|---|---|---|---|---|")
    for name, r in rows:
        print(f"| {name} | {cell(r, 'fp')} | {cell(r, 'qat')} | "
              f"{cell(r, 'int8')} | {r['rate']:+.1f}% |")


if __name__ == "__main__":
    main()

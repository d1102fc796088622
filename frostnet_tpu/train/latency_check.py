"""Latency probe: FP32 vs fake-quant vs frozen-INT8 inference timing.

Replaces the reference's latency checkers (Classification/utils/
helper_functions.py:353-398 latency_val, Semantic_Segmentation/
latency_check.py) — 100-batch steady-state timing per mode on the attached
device, plus model-size report. Uses the 'fbgemm' (per-channel) qconfig by
default like the reference probes (latency_check.py:222).

Run: python -m frostnet_tpu.train.latency_check --model qmobilenet_v2_ReLU
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..models import create_model
from ..nn import FP32, QAT_FROZEN, INT8, QAT
from ..quant import get_qconfig
from ..utils.logging import MetricLogger
from .evaluate import int8_model_size_bytes
from .state import create_train_state
from ..optim import get_optimizer


def time_mode(model, variables, x, mode, iters=100, warmup=3, reps=1,
              frozen=False):
    # honest timing: chain iterations through a scalar that feeds the next
    # input and read back once — on this host's transport block_until_ready
    # returns before execution finishes (see CLAUDE.md), and a per-iteration
    # readback would add the ~30 ms tunnel round trip to every batch.
    # With reps > 1 returns (median_ms, spread_ms) over reps repetitions so
    # callers can report run-to-run jitter (the bs1 table's ±1 ms swings).
    #
    # frozen=True closes the jit over the variables (quant/freeze.py
    # semantics — the torch.quantization.convert equivalent): XLA
    # constant-folds BN-fold + weight quantization + tap sums into the
    # executable, like a converted qnnpack graph. This is what INT8
    # deployment runs (serve.py uses freeze()); timing INT8 with variables
    # as jit ARGUMENTS instead re-does the whole convert per call AND blocks
    # constant folding — measured r4 at bs32 it made frostnet INT8 look
    # 4x slower than its frozen (real) latency.
    import statistics

    import jax.numpy as jnp

    if frozen:
        jfn = jax.jit(lambda i, a: model.apply(variables, i + a * 0, mode=mode)
                      .astype(jnp.float32).sum() * 1e-30)
        fn = lambda a: jfn(x, a)  # noqa: E731
        lower_args = (x, jnp.float32(0))
    else:
        jfn = jax.jit(lambda v, i, a: model.apply(v, i + a * 0, mode=mode)
                      .astype(jnp.float32).sum() * 1e-30)
        fn = lambda a: jfn(variables, x, a)  # noqa: E731
        lower_args = (variables, x, jnp.float32(0))
    import os
    if os.environ.get("FROSTNET_COMPILE_ONLY") == "1":
        # prewarm the persistent compile cache without executing (the
        # degraded tunnel serves compiles while readbacks stall — CLAUDE.md)
        jfn.lower(*lower_args).compile()
        return (float("nan"), 0.0) if reps > 1 else float("nan")
    acc = jnp.float32(0)
    for _ in range(warmup):
        acc = fn(acc)
    float(acc)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = fn(acc)
        float(acc)
        samples.append((time.perf_counter() - t0) / iters * 1000.0)
    if reps == 1:
        return samples[0]  # ms/batch (backwards-compatible)
    return statistics.median(samples), max(samples) - min(samples)


def main(args):
    logger = MetricLogger(None, name="latency")
    if args.seg:
        # segmentation latency probe (val_seg_latency / Semantic_Segmentation/
        # latency_check.py — full-res 2048x1024 eval by default there; pass
        # --image_size for the probe resolution)
        from ..segmentation.models import get_seg_model

        model = get_seg_model(args.model, num_classes=args.num_classes,
                              qconfig=get_qconfig(args.backend))
    else:
        model = create_model(args.model, num_classes=args.num_classes,
                             qconfig=get_qconfig(args.backend))
    x = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3))
    tx = get_optimizer("SGD", 1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x,
                               init_kwargs={"mode": QAT, "train": True})
    variables = state.model_variables

    reps = getattr(args, "reps", 1)
    fp = time_mode(model, variables, x, FP32, args.iters, reps=reps)
    qat = time_mode(model, variables, x, QAT_FROZEN, args.iters, reps=reps)
    # INT8 is timed CONVERTED (frozen jit closure), matching the reference's
    # latency_val which times the converted qnnpack model, and serve.py's
    # deployment path (quant/freeze.py).
    int8 = time_mode(model, variables, x, INT8, args.iters, reps=reps,
                     frozen=True)
    if reps > 1:
        (fp_ms, fp_sp), (qat_ms, qat_sp), (int8_ms, int8_sp) = fp, qat, int8
    else:
        fp_ms, qat_ms, int8_ms = fp, qat, int8
        fp_sp = qat_sp = int8_sp = 0.0
    rate = (int8_ms - fp_ms) / fp_ms * 100.0
    size_int8 = int8_model_size_bytes(model, state) / 1e6
    size_fp = sum(v.size * 4 for v in jax.tree.leaves(state.params)) / 1e6

    logger.info(f"model={args.model} backend={args.backend} batch={args.batch_size}")
    logger.info(f"FP32:      {fp_ms:8.2f} ms/batch   size {size_fp:.2f} MB")
    logger.info(f"QAT sim:   {qat_ms:8.2f} ms/batch")
    logger.info(f"INT8:      {int8_ms:8.2f} ms/batch   size {size_int8:.2f} MB  "
                f"rate {rate:+.2f}%")
    return {"fp_ms": fp_ms, "qat_ms": qat_ms, "int8_ms": int8_ms, "rate": rate,
            "fp_spread": fp_sp, "qat_spread": qat_sp, "int8_spread": int8_sp}


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="qmobilenet_v2_ReLU")
    p.add_argument("--backend", default="fbgemm")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--reps", type=int, default=1,
                   help=">1 reports median over reps with run-to-run spread")
    p.add_argument("--seg", action="store_true",
                   help="treat --model as a segmentation model name")
    main(p.parse_args())


if __name__ == "__main__":
    cli()

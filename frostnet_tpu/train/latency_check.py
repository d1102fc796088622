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


def time_mode(model, variables, x, mode, iters=100, warmup=3):
    fn = jax.jit(lambda v, i: model.apply(v, i, mode=mode))
    for _ in range(warmup):
        fn(variables, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000.0  # ms/batch


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

    fp_ms = time_mode(model, variables, x, FP32, args.iters)
    qat_ms = time_mode(model, variables, x, QAT_FROZEN, args.iters)
    int8_ms = time_mode(model, variables, x, INT8, args.iters)
    rate = (int8_ms - fp_ms) / fp_ms * 100.0
    size_int8 = int8_model_size_bytes(model, state) / 1e6
    size_fp = sum(v.size * 4 for v in jax.tree.leaves(state.params)) / 1e6

    logger.info(f"model={args.model} backend={args.backend} batch={args.batch_size}")
    logger.info(f"FP32:      {fp_ms:8.2f} ms/batch   size {size_fp:.2f} MB")
    logger.info(f"QAT sim:   {qat_ms:8.2f} ms/batch")
    logger.info(f"INT8:      {int8_ms:8.2f} ms/batch   size {size_int8:.2f} MB  "
                f"rate {rate:+.2f}%")
    return {"fp_ms": fp_ms, "qat_ms": qat_ms, "int8_ms": int8_ms, "rate": rate}


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
    p.add_argument("--seg", action="store_true",
                   help="treat --model as a segmentation model name")
    main(p.parse_args())


if __name__ == "__main__":
    cli()

"""Real-TPU training convergence record (round 5).

Every learning test runs on the virtual CPU mesh; this script runs the full
StatAssist -> QAT phase sequence ON THE REAL CHIP and records the loss/top1
trajectory plus the dual-accuracy endpoint, so the repo carries direct
evidence that QAT training converges on actual TPU hardware, not just under
the CPU backend. Same linearly-separable color task as
tests/test_convergence.py (chance = 1/3).

Honest readback protocol: batches are staged on device; each logged point
is a host readback of metrics that depend on the step (block_until_ready
does not wait on this transport - CLAUDE.md).

Usage: python scripts/tpu_training_demo.py   (serialize with other TPU use)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import FP32, QAT, QAT_FROZEN, INT8
from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
from frostnet_tpu.train import (create_train_state, make_train_step,
                                make_eval_step, recalibrate)

BS, IMG, NCLASS = 128, 48, 3
FP_STEPS, QAT_STEPS, LOG_EVERY = 40, 160, 10


def make_batch(rng):
    labels = rng.randint(0, NCLASS, BS)
    x = rng.randn(BS, IMG, IMG, 3).astype(np.float32)
    for i, c in enumerate(labels):
        x[i, :, :, c] += 0.35  # weak shift: visible descent, not instant saturation
    return {"image": jnp.asarray(x), "label": jnp.asarray(labels.astype(np.int32))}


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True,
                     num_classes=NCLASS)
    tx = get_optimizer("QAdam", 1e-3,
                       weight_decay=grouped_weight_decay(1e-5), clip_by=1e-3)
    rng = np.random.RandomState(0)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               make_batch(rng)["image"],
                               init_kwargs={"mode": QAT, "train": True})

    lines = [f"Real-TPU training run ({jax.devices()[0]}), "
             f"FrostNet-tiny, color task, bs{BS} {IMG}x{IMG}, QAdam 1e-3"]

    fp_step = make_train_step(model, FP32, num_classes=NCLASS, donate=False)
    t0 = time.time()
    for i in range(FP_STEPS):
        state, m = fp_step(state, make_batch(rng))
        if (i + 1) % LOG_EVERY == 0 or i < 5:
            line = (f"  fp   step {i+1:4d}: loss {float(m['loss']):.4f} "
                    f"top1 {float(m['top1']):.3f}")
            print(line, flush=True)
            lines.append(line)
    state = state.start_qat()

    qat_step = make_train_step(model, QAT, num_classes=NCLASS, donate=False)
    for i in range(QAT_STEPS):
        state, m = qat_step(state, make_batch(rng))
        if (i + 1) % LOG_EVERY == 0:
            line = (f"  qat  step {i+1:4d}: loss {float(m['loss']):.4f} "
                    f"top1 {float(m['top1']):.3f}")
            print(line, flush=True)
            lines.append(line)
    train_s = time.time() - t0

    # dual-accuracy endpoint on held-out batches (reference evaluate.py flow)
    state = recalibrate(model, state, [make_batch(rng) for _ in range(20)])
    heldout = [make_batch(np.random.RandomState(10_000 + i)) for i in range(5)]
    accs = {}
    for name, mode in (("QAT_FROZEN", QAT_FROZEN), ("INT8", INT8)):
        ev = make_eval_step(model, mode, num_classes=NCLASS)
        tot = 0.0
        for b in heldout:
            tot += float(ev(state, b)["top1"])
        accs[name] = tot / len(heldout)
    lines.append(f"  held-out dual accuracy: QAT_FROZEN {accs['QAT_FROZEN']:.3f} "
                 f"INT8 {accs['INT8']:.3f} (chance 0.333)")
    lines.append(f"  train wall: {train_s:.1f}s for {FP_STEPS + QAT_STEPS} steps "
                 f"(incl. per-step host batch generation + readbacks)")
    out = "\n".join(lines) + "\n"
    print(out, flush=True)
    with open(os.path.join(REPO, "runs", "tpu_training_run_r05.txt"), "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()

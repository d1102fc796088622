"""Learning sanity: the StatAssist->QAT pipeline actually learns.

A linearly-separable synthetic task (class = dominant color channel) must be
fit by a tiny FrostNet through the full phase sequence: FP32 warm-up with
GradBoost stats -> QAT with fake-quant + noise -> INT8 eval. Chance is 1/3;
we require near-perfect train accuracy and INT8 agreement.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import FP32, QAT, QAT_FROZEN, INT8
from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
from frostnet_tpu.train import (create_train_state, make_train_step,

                                make_eval_step, recalibrate)



# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

def _make_batch(rng, n=64):
    # per-pixel noise + a mean shift on the label channel: linearly separable
    # but non-degenerate (each activation map has real per-example variance,
    # so BN statistics and quant observers see realistic distributions)
    labels = rng.randint(0, 3, n)
    x = rng.randn(n, 48, 48, 3).astype(np.float32)
    for i, c in enumerate(labels):
        x[i, :, :, c] += 2.0
    return {"image": jnp.asarray(x), "label": jnp.asarray(labels.astype(np.int32))}


def test_statassist_qat_learns_color_task():
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=3)
    # QAdam: the QSGD variants are chaotic at the fake-quant transition on
    # this saturated toy task (an over-hot warm-up diverges exactly like
    # torch QAT does); the adaptive optimizer rides through it.
    tx = get_optimizer("QAdam", 1e-3, weight_decay=grouped_weight_decay(1e-5),
                       clip_by=1e-3)
    rng = np.random.RandomState(0)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               _make_batch(rng)["image"],
                               init_kwargs={"mode": QAT, "train": True})

    fp_step = make_train_step(model, FP32, num_classes=3, donate=False)
    for _ in range(15):
        state, m = fp_step(state, _make_batch(rng))
    state = state.start_qat()

    qat_step = make_train_step(model, QAT, num_classes=3, donate=False)
    for _ in range(25):
        state, m = qat_step(state, _make_batch(rng))
    assert float(m["top1"]) > 0.9, float(m["top1"])

    # BN/observer re-estimation before eval. A 40-step toy run leaves BN
    # running stats (momentum 0.1 EMA) far from the final weights' activation
    # statistics — train-mode (batch-stats) accuracy is perfect while ANY
    # running-stats eval collapses, FP32 included; this is the classic
    # train/eval BN mismatch, not a quantization effect (verified: frozen
    # eval with fake-quant disabled matches FP32 eval to 1e-5). ~50 batches
    # drive the 0.1-momentum EMA to <1% residual.
    state = recalibrate(model, state, [_make_batch(rng) for _ in range(50)])

    eval_batch = _make_batch(np.random.RandomState(99), 64)
    qat_eval = make_eval_step(model, QAT_FROZEN, 3)(state, eval_batch)
    int8_eval = make_eval_step(model, INT8, 3)(state, eval_batch)
    assert float(qat_eval["top1"]) > 0.8, float(qat_eval["top1"])
    # the frozen INT8 graph preserves the learned behavior
    assert abs(float(int8_eval["top1"]) - float(qat_eval["top1"])) < 0.1

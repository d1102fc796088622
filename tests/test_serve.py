"""Serving: Int8Predictor loads artifacts and checkpoints and predicts."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import INT8, QAT
from frostnet_tpu.optim import get_optimizer
from frostnet_tpu.quant import export_int8
from frostnet_tpu.serve import Int8Predictor
from frostnet_tpu.train import create_train_state, make_train_step
from frostnet_tpu.utils.checkpoint import save_checkpoint

MODEL = "frostnet_quant_tiny"  # not a registry name; built directly below


def _trained_state(tmp_path):
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=5)
    tx = get_optimizer("QSGD", 0.01)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 5, 4).astype(np.int32))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch["image"],
                               init_kwargs={"mode": QAT, "train": True})
    step = make_train_step(model, QAT, num_classes=5, donate=False)
    for _ in range(2):
        state, _ = step(state, batch)
    return model, state, batch


def test_predictor_from_artifact_matches_int8_mode(tmp_path, monkeypatch):
    model, state, batch = _trained_state(tmp_path)
    art = str(tmp_path / "m.npz")
    export_int8(state.model_variables, art)

    # route the predictor's create_model to this tiny architecture
    import frostnet_tpu.models as models_pkg
    monkeypatch.setattr(
        models_pkg, "create_model",
        lambda name, **kw: FrostNet(mode="tiny", width_mult=1.0,
                                    quantized=True, num_classes=5))
    pred = Int8Predictor("tiny", num_classes=5, artifact=art, image_size=32)

    want = np.asarray(model.apply(state.model_variables, batch["image"],
                                  mode=INT8))
    got = np.asarray(pred(np.asarray(batch["image"])))
    np.testing.assert_array_equal(got, want)

    idx, scores = pred.predict_topk(np.asarray(batch["image"]), k=3)
    assert idx.shape == (4, 3) and scores.shape == (4, 3)
    np.testing.assert_array_equal(idx[:, 0], want.argmax(-1))


def test_predictor_from_checkpoint(tmp_path, monkeypatch):
    model, state, batch = _trained_state(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state)

    import frostnet_tpu.models as models_pkg
    monkeypatch.setattr(
        models_pkg, "create_model",
        lambda name, **kw: FrostNet(mode="tiny", width_mult=1.0,
                                    quantized=True, num_classes=5))
    pred = Int8Predictor("tiny", num_classes=5, checkpoint=ckpt, image_size=32)
    want = np.asarray(model.apply(state.model_variables, batch["image"],
                                  mode=INT8))
    got = np.asarray(pred(np.asarray(batch["image"])))
    np.testing.assert_allclose(got, want, atol=1e-5)

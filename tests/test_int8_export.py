"""INT8 deployment artifact: export/load roundtrip is exact and ~4x smaller.

Covers the reference's converted-model save + print_size_of_model flow
(Classification/evaluate.py:117-120,140-143) as an explicit on-disk contract.
"""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import QAT, QAT_FROZEN, INT8
from frostnet_tpu.optim import get_optimizer
from frostnet_tpu.quant import export_int8, load_int8, freeze
from frostnet_tpu.train import create_train_state, make_train_step

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow


def _trained_state(rng_seed=0, steps=3):
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=5)
    tx = get_optimizer("QSGD", 0.01)
    rng = np.random.RandomState(rng_seed)
    batch = {"image": jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 5, 4).astype(np.int32))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch["image"],
                               init_kwargs={"mode": QAT, "train": True})
    step = make_train_step(model, QAT, num_classes=5, donate=False)
    for _ in range(steps):  # populate observers + move BN stats off init
        state, _ = step(state, batch)
    return model, state, batch


def test_export_int8_roundtrip_exact(tmp_path):
    model, state, batch = _trained_state()
    path = str(tmp_path / "artifact.npz")
    size = export_int8(state.model_variables, path)
    assert size == os.path.getsize(path)

    restored = load_int8(path)
    ref = model.apply(state.model_variables, batch["image"], mode=INT8)
    got = model.apply(restored, batch["image"], mode=INT8)
    # both graphs quantize on identical observer grids and identical int8
    # kernels (quantize(dequantize(q)) == q), so the integer pipeline and
    # hence the float logits match exactly
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # frozen-sim eval also runs on the restored tree
    sim = model.apply(restored, batch["image"], mode=QAT_FROZEN)
    assert np.isfinite(np.asarray(sim)).all()

    # freeze() serves from the artifact
    infer = freeze(model, restored)
    np.testing.assert_array_equal(np.asarray(infer(batch["image"])),
                                  np.asarray(got))


def test_export_int8_is_smaller_on_disk(tmp_path):
    model, state, _ = _trained_state()
    q_path = str(tmp_path / "int8.npz")
    q_size = export_int8(state.model_variables, q_path)

    import flax.serialization
    f32 = flax.serialization.to_state_dict(state.model_variables)
    flat = {}

    def flatten(node, prefix=""):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    flatten(f32)
    f32_path = str(tmp_path / "f32.npz")
    with open(f32_path, "wb") as f:
        np.savez(f, **flat)
    ratio = os.path.getsize(f32_path) / q_size
    # conv kernels dominate -> close to 4x (npz header overhead on the many
    # small observer arrays eats a bit of it at tiny model scale)
    assert ratio > 2.0, ratio


def test_export_int8_roundtrip_fbgemm_per_channel(tmp_path):
    """Per-channel weights (fbgemm): channel axis is inferred from the
    observer shape for both HWIO conv kernels and QDense (I,F,1,1) kernels."""
    import flax.linen as fnn

    from frostnet_tpu.nn import QConvBNAct, QDense, QuantStub, dequant
    from frostnet_tpu.quant import FBGEMM

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, mode, train=False):
            x = QuantStub(qconfig=FBGEMM)(x, mode)
            x = QConvBNAct(8, 3, padding=1, qconfig=FBGEMM, act="relu")(
                x, mode=mode, train=train)
            x = x.dequantize() if hasattr(x, "dequantize") else x
            x = x.mean(axis=(1, 2))
            x = QDense(4, qconfig=FBGEMM)(x, mode)
            return dequant(x)

    model = Tiny()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    variables = jax.jit(lambda r, x: model.init(r, x, mode=QAT, train=True))(
        jax.random.PRNGKey(0), img)
    # populate observers + move BN stats
    _, upd = model.apply(variables, img, mode=QAT, train=True,
                         mutable=["batch_stats", "quant"])
    variables = {**variables, **upd}

    from frostnet_tpu.quant import export_int8, load_int8
    path = str(tmp_path / "fbgemm.npz")
    export_int8(variables, path, qconfig=FBGEMM)
    restored = load_int8(path)

    ref = model.apply(variables, img, mode=INT8)
    got = model.apply(restored, img, mode=INT8)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_frozen_int8_serving_data_parallel():
    """freeze()'d INT8 inference over a dp-sharded batch matches the
    single-device result (the serving-at-scale path: replicated int8
    closure constants, batch over 'dp')."""
    from frostnet_tpu.parallel import make_mesh, shard_batch

    model, state, batch = _trained_state()
    infer = freeze(model, state.model_variables)
    ref = np.asarray(infer(batch["image"]))

    mesh = make_mesh()  # 8-way dp (conftest forces 8 CPU devices)
    big = jnp.tile(batch["image"], (4, 1, 1, 1))  # 16 examples over 8 devices
    sharded = shard_batch({"image": big}, mesh)["image"]
    out = np.asarray(infer(sharded))
    np.testing.assert_array_equal(out[:4], ref)
    np.testing.assert_array_equal(out[4:8], ref)

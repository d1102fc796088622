"""FrostNet architecture tests: shape/param parity vs the reference
implementation (executed via a timm shim as an *oracle*; we compare counts,
never code), and mode coverage (FP32 / QAT / QAT_FROZEN / INT8).

Param-parity uses jax.eval_shape (trace only, no XLA compile) because CPU
XLA conv compiles are slow; forward tests run one small width end-to-end and
rely on the persistent compile cache.
"""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu import nn as fnn_q
from frostnet_tpu.models import create_model, list_models

SMALL = "frostnet_quant_small_0_35"


def _japply(model, mode, **kw):
    # jit the whole apply: eager flax dispatch compiles each primitive
    # separately (slow fixed overhead on this CPU backend).
    return jax.jit(lambda v, x: model.apply(v, x, mode=mode, **kw))


def _jtrain(model, mode, mutable):
    return jax.jit(lambda v, x, rng: model.apply(
        v, x, mode=mode, train=True, mutable=list(mutable),
        rngs={"dropout": rng}))


def _load_reference_frostnet():
    """Import /root/reference/frostnet.py with a minimal timm shim so we can
    count its parameters as an architecture oracle."""
    if "ref_frostnet" in sys.modules:
        return sys.modules["ref_frostnet"]
    timm = types.ModuleType("timm")
    timm_data = types.ModuleType("timm.data")
    for n in ("IMAGENET_DEFAULT_MEAN", "IMAGENET_DEFAULT_STD",
              "IMAGENET_INCEPTION_MEAN", "IMAGENET_INCEPTION_STD"):
        setattr(timm_data, n, (0.5, 0.5, 0.5))
    timm_models = types.ModuleType("timm.models")
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = lambda f: f
    sys.modules.update({
        "timm": timm, "timm.data": timm_data,
        "timm.models": timm_models, "timm.models.registry": timm_registry,
    })
    spec = importlib.util.spec_from_file_location("ref_frostnet", "/root/reference/frostnet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_frostnet"] = mod
    return mod


@pytest.mark.parametrize("mode,width", [("large", 1.0), ("base", 1.0), ("small", 1.0),
                                        ("large", 0.5), ("small", 1.25), ("base", 0.35)])
def test_param_count_matches_reference(mode, width):
    ref = _load_reference_frostnet()
    tmodel = ref.FrostNet(nclass=1000, mode=mode, width_mult=width,
                          bottleneck=ref.CascadePreExBottleneck)
    ref_params = sum(p.numel() for p in tmodel.parameters())

    model = create_model(f"frostnet_{mode}_{str(width).replace('.', '_')}")
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x), jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # BN running stats are buffers in torch (not parameters); count 'params' only.
    ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert ours == ref_params, (ours, ref_params)


def test_registry_has_all_30_variants():
    names = list_models("frostnet")
    assert len(names) == 30  # 15 quant + 15 fp, reference frostnet.py:354-451
    assert "frostnet_quant_large_1_0" in names
    assert "frostnet_small_0_35" in names


def test_forward_shapes_all_modes():
    model = create_model(SMALL, num_classes=10)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    assert "quant" in variables and "batch_stats" in variables

    # FP32 eval
    out = _japply(model, fnn_q.FP32)(variables, x)
    assert out.shape == (2, 10)

    # FP32 train (mutable batch stats + dropout rng)
    out, updates = _jtrain(model, fnn_q.FP32, ("batch_stats",))(
        variables, x, jax.random.PRNGKey(1))
    assert out.shape == (2, 10) and "batch_stats" in updates

    # QAT train: observers update
    out, updates = _jtrain(model, fnn_q.QAT, ("batch_stats", "quant"))(
        variables, x, jax.random.PRNGKey(1))
    assert out.shape == (2, 10)
    obs_vals = jax.tree.leaves(updates["quant"])
    assert any(bool(jnp.isfinite(v).all()) for v in obs_vals)

    variables = {**variables, **updates}
    # QAT eval (frozen observers)
    out_qat = _japply(model, fnn_q.QAT_FROZEN)(variables, x)
    assert out_qat.shape == (2, 10)

    # INT8 frozen inference
    out_int8 = _japply(model, fnn_q.INT8)(variables, x)
    assert out_int8.shape == (2, 10)
    assert jnp.isfinite(out_int8).all()


def test_qat_sim_close_to_int8():
    """The dual-accuracy contract (SURVEY.md §3.2): after calibration, the
    fake-quant simulation and the frozen INT8 graph must agree closely."""
    model = create_model(SMALL, num_classes=10)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    variables = jax.jit(model.init)(key, x)
    train_fn = _jtrain(model, fnn_q.QAT, ("batch_stats", "quant"))
    for i in range(3):
        xb = jax.random.normal(jax.random.fold_in(key, i), (2, 32, 32, 3))
        _, updates = train_fn(variables, xb, key)
        variables = {**variables, **updates}
    qat = _japply(model, fnn_q.QAT_FROZEN)(variables, x)
    int8 = _japply(model, fnn_q.INT8)(variables, x)
    # integer conv vs float fake-quant sim: small accumulation differences only
    assert np.abs(np.asarray(qat) - np.asarray(int8)).max() < 0.1, (
        np.abs(np.asarray(qat) - np.asarray(int8)).max())


def test_features_only_multiscale():
    model = create_model(SMALL)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(lambda v, i: model.apply(
        v, i, mode=fnn_q.FP32, features_only=True))(variables, x)
    assert len(feats) == 4
    # strides 4, 8, 16, 32 (reference frostnet_features.py:342-352)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]

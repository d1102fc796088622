"""Model-zoo coverage: every family builds, traces in QAT mode, and matches
the reference/torchvision parameter counts where an oracle exists.

Trace-only (jax.eval_shape) so the suite stays fast: forward execution of the
block machinery is covered by test_frostnet_model.py end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu import nn as fnn_q
from frostnet_tpu.models import create_model, list_models


def param_count(model, size=64):
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, mode=fnn_q.QAT, train=True),
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))


@pytest.mark.parametrize("name,size", [
    ("qmobilenet_v2_ReLU", 64),
    ("qmobilenet_v3_large_HS", 64),
    ("qmobilenet_v3_small_ReLU", 64),
    ("qresnet18", 64),
    ("qresnet50", 64),
    ("qshufflenet_v2_x1_0", 64),
    ("qvgg16", 224),
    ("qalexnet", 224),
])
def test_zoo_traces_in_qat(name, size):
    model = create_model(name, num_classes=10)
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, mode=fnn_q.QAT, train=True),
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3)))
    assert "quant" in shapes and "params" in shapes


# torchvision is not installed in this image; these are the canonical
# published parameter counts for the torchvision architectures the reference
# wraps (Classification/models/imagenet/*).
CANONICAL_PARAMS = {
    "qmobilenet_v2_ReLU": 3_504_872,
    "qresnet18": 11_689_512,
    "qresnet50": 25_557_032,
    "qshufflenet_v2_x1_0": 2_278_604,
    "qvgg16": 138_357_544,
    "qalexnet": 61_100_840,
    # FP-only baselines (reference Classification/models/imagenet/FP_only/*)
    "densenet121": 7_978_856,
    "squeezenet1_0": 1_248_424,
    "squeezenet1_1": 1_235_496,
    "mnasnet1_0": 4_383_312,
    "inception_v3": 23_834_568,  # torchvision without aux classifier
}


@pytest.mark.parametrize("name,want", sorted(CANONICAL_PARAMS.items()))
def test_param_count_matches_canonical(name, want):
    size = {"qvgg16": 224, "qalexnet": 224, "inception_v3": 299}.get(name, 64)
    model = create_model(name, num_classes=1000)
    if name in ("densenet121", "squeezenet1_0", "squeezenet1_1", "mnasnet1_0",
                "inception_v3"):
        shapes = jax.eval_shape(
            lambda k, x: model.init(k, x, train=True),
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
        got = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    else:
        got = param_count(model, size=size)
    assert got == want, (name, got, want)


def test_mobilenetv3_param_count_matches_reference():
    """Oracle: the reference's own quantizable MobileNetV3
    (Classification/models/imagenet/mobilenetv3.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_mbv3", "/root/reference/Classification/models/imagenet/mobilenetv3.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for m, ro in (("large", False), ("small", False), ("large", True)):
        tmodel = mod.MobileNetV3(nclass=1000, mode=m, RE=ro)
        want = sum(p.numel() for p in tmodel.parameters())
        got = param_count(create_model(
            f"qmobilenet_v3_{m}_{'ReLU' if ro else 'HS'}", num_classes=1000))
        assert got == want, (m, ro, got, want)


def test_zoo_registry_size():
    names = list_models()
    # 30 frostnet + mbv2(6) + mbv3(8) + resnet(12) + shufflenet(8) + vgg(16) + alexnet(2)
    assert len(names) >= 80


def test_mbv3_qat_sim_close_to_int8():
    """hswish/SE/add_scalar INT8 paths agree with the fake-quant sim."""
    import numpy as np
    from frostnet_tpu import nn as fq

    model = create_model("qmobilenet_v3_small_HS", num_classes=10)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 64, 3))
    v = jax.jit(lambda k, xx: model.init(k, xx, mode=fq.QAT, train=True))(key, x)
    step = jax.jit(lambda vv, xx: model.apply(
        vv, xx, mode=fq.QAT, train=True, mutable=["batch_stats", "quant"],
        rngs={"dropout": key}))
    for i in range(3):
        _, upd = step(v, jax.random.normal(jax.random.fold_in(key, i), x.shape))
        v = {**v, **upd}
    qat = jax.jit(lambda vv, xx: model.apply(vv, xx, mode=fq.QAT_FROZEN))(v, x)
    int8 = jax.jit(lambda vv, xx: model.apply(vv, xx, mode=fq.INT8))(v, x)
    assert np.abs(np.asarray(qat) - np.asarray(int8)).max() < 0.25, (
        np.abs(np.asarray(qat) - np.asarray(int8)).max())

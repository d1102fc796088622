"""Serialized serving program (jax.export/StableHLO deployment artifact).

The TPU-native counterpart of shipping the reference's converted module for
deployment (Classification/evaluate.py:140-143): the frozen INT8 *program*
is serialized with the weights baked in, runs at any batch size (symbolic
batch dim), and needs no frostnet_tpu code — only jax — to serve.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import QAT
from frostnet_tpu.optim import get_optimizer
from frostnet_tpu.quant import export_serving, load_serving, freeze
from frostnet_tpu.train import create_train_state, make_train_step

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained():
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=5)
    tx = get_optimizer("QSGD", 0.01)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 5, 4).astype(np.int32))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch["image"],
                               init_kwargs={"mode": QAT, "train": True})
    step = make_train_step(model, QAT, num_classes=5, donate=False)
    for _ in range(3):  # populate observers + move BN stats off init
        state, _ = step(state, batch)
    return model, state.model_variables


def test_program_roundtrip_exact_and_batch_polymorphic(trained, tmp_path):
    model, variables = trained
    path = str(tmp_path / "model.shlo")
    size = export_serving(model, variables, path, image_size=32)
    assert size == os.path.getsize(path) > 0

    serve = load_serving(path)
    rng = np.random.RandomState(1)
    for bs in (4, 7):  # 7: a batch size never seen at export time
        x = rng.randn(bs, 32, 32, 3).astype(np.float32)
        want = np.asarray(freeze(model, variables)(jnp.asarray(x)))
        got = np.asarray(serve(x))
        assert got.shape == (bs, 5)
        np.testing.assert_array_equal(got, want)


def test_program_serves_without_model_code(trained, tmp_path):
    """Deserialize + run in a subprocess that imports ONLY jax/numpy."""
    model, variables = trained
    path = str(tmp_path / "model.shlo")
    export_serving(model, variables, path, image_size=32)

    rng = np.random.RandomState(2)
    x = rng.randn(3, 32, 32, 3).astype(np.float32)
    np.save(tmp_path / "x.npy", x)
    want = np.asarray(freeze(model, variables)(jnp.asarray(x)))

    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax import export\n"
        f"exported = export.deserialize(open({path!r}, 'rb').read())\n"
        f"y = exported.call(np.load({str(tmp_path / 'x.npy')!r}))\n"
        f"np.save({str(tmp_path / 'y.npy')!r}, np.asarray(y))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # plain 1-device CPU client is fine here
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=300)
    got = np.load(tmp_path / "y.npy")
    np.testing.assert_array_equal(got, want)


def test_static_batch_program_rejects_other_batch(trained, tmp_path):
    model, variables = trained
    path = str(tmp_path / "model_b4.shlo")
    export_serving(model, variables, path, image_size=32, batch=4)
    serve = load_serving(path)
    x = np.zeros((4, 32, 32, 3), np.float32)
    assert np.asarray(serve(x)).shape == (4, 5)
    with pytest.raises(Exception):
        serve(np.zeros((2, 32, 32, 3), np.float32))


def test_serve_predictor_program_path(trained, tmp_path):
    """serve.Int8Predictor(program=...) matches the artifact-built one."""
    from frostnet_tpu.quant import export_int8
    from frostnet_tpu.serve import Int8Predictor

    model, variables = trained
    npz = str(tmp_path / "model_int8.npz")
    export_int8(variables, npz)

    pred = Int8Predictor.__new__(Int8Predictor)  # bypass 1000-class ctor
    pred.model, pred.variables, pred.image_size = model, variables, 32
    pred._apply = freeze(model, variables)
    prog = str(tmp_path / "model.shlo")
    pred.export_program(prog)

    served = Int8Predictor("unused", program=prog, image_size=32)
    assert served.variables is None and served.model is None
    x = np.random.RandomState(3).randn(2, 32, 32, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(served(x)),
                                  np.asarray(pred(x)))
    with pytest.raises(ValueError):
        served.export_program(str(tmp_path / "again.shlo"))


def test_serve_predictor_dp_sharded_program(trained, tmp_path):
    """A program-served batch sharded over dp chips matches dp=1."""
    from frostnet_tpu.serve import Int8Predictor

    model, variables = trained
    prog = str(tmp_path / "model.shlo")
    export_serving(model, variables, prog, image_size=32)

    one = Int8Predictor("unused", program=prog, image_size=32)
    dp4 = Int8Predictor("unused", program=prog, image_size=32, dp=4)
    x = np.random.RandomState(4).randn(8, 32, 32, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(dp4(x)), np.asarray(one(x)))

    # batch not divisible by dp: shards over the largest divisor (the
    # DataParallel small-batch behavior) instead of crashing
    dp3 = Int8Predictor("unused", program=prog, image_size=32, dp=3)
    np.testing.assert_array_equal(np.asarray(dp3(x)), np.asarray(one(x)))
    x5 = x[:5]
    np.testing.assert_array_equal(np.asarray(dp3(x5)), np.asarray(one(x5)))


def test_mbv3_program_roundtrip_exact(tmp_path):
    """MBv3 small through export: the Hswish/Hsigmoid/SE INT8 ops (integer
    clamp relu6, broadcast gate mul, scalar add/mul zero-point shifts) must
    all lower through jax.export and serve bit-identically to freeze()."""
    from frostnet_tpu.models import create_model

    model = create_model("qmobilenet_v3_small_HS", num_classes=5)
    rng = np.random.RandomState(0)
    k = jax.random.PRNGKey(0)
    x0 = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    v = jax.jit(lambda kk, xx: model.init({"params": kk, "dropout": kk}, xx,
                                          mode=QAT, train=True))(k, x0)
    apply_qat = jax.jit(lambda vv, xx: model.apply(
        vv, xx, mode=QAT, train=True, mutable=["quant", "batch_stats"],
        rngs={"dropout": k}))
    for i in range(2):
        _, mut = apply_qat(v, jnp.asarray(
            rng.randn(2, 64, 64, 3).astype(np.float32)))
        v = {"params": v["params"], **mut}

    path = str(tmp_path / "mbv3.shlo")
    export_serving(model, v, path, image_size=64)
    serve = load_serving(path)
    x = rng.randn(3, 64, 64, 3).astype(np.float32)
    want = np.asarray(freeze(model, v)(jnp.asarray(x)))
    got = np.asarray(serve(x))
    np.testing.assert_array_equal(got, want)

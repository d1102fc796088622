"""frostnet_features parity: torch checkpoint round-trips into the TPU model
with matching forward numerics (FP path), using the reference torch FrostNet
as the oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from frostnet_tpu.models import create_model
from frostnet_tpu.models.frostnet_features import (
    FrostNetFeatures,
    load_torch_frostnet_checkpoint,
)
from frostnet_tpu.nn import FP32
from tests.test_frostnet_model import _load_reference_frostnet


def test_load_torch_checkpoint_matches_forward():
    ref = _load_reference_frostnet()
    torch.manual_seed(0)
    tmodel = ref.FrostNet(nclass=10, mode="small", width_mult=0.35,
                          bottleneck=ref.CascadePreExBottleneck)
    tmodel.eval()
    state = {("module." + k): v for k, v in tmodel.state_dict().items()}

    model = create_model("frostnet_small_0_35", num_classes=10)
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_torch_frostnet_checkpoint(state, variables)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jax.jit(lambda v, i: model.apply(v, i, mode=FP32))(
        variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_features_backbone_shapes_and_freeze():
    m = FrostNetFeatures(mode="small", width_mult=0.35, frozen_stages=2)
    x = jnp.ones((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(lambda vv, xx: m.apply(vv, xx))(v, x)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]

"""Golden test: resize_bilinear vs torch F.interpolate."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from frostnet_tpu.ops import resize_bilinear, resize_nearest


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((12, 9), (24, 18)), ((24, 24), (7, 7)),
                                          ((5, 5), (160, 160))])
def test_bilinear_matches_torch(align, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw,
                         mode="bilinear", align_corners=align).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 8, 2).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(25, 15), mode="nearest").numpy()
    got = np.asarray(resize_nearest(jnp.asarray(x), (25, 15)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want)

"""ESPNetv2 param parity vs the reference implementation (run as oracle from
/root/reference/Semantic_Segmentation) + seg geometry."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu import nn as fnn_q
from frostnet_tpu.segmentation.espnet import EESPNet, ESPNetv2Seg


def _count(model, x, **kw):
    v = jax.eval_shape(lambda k, xx: model.init(k, xx, mode=fnn_q.QAT, train=True, **kw),
                       jax.random.PRNGKey(0), x)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"])), v


@pytest.fixture(scope="module")
def ref_pkg():
    sys.path.insert(0, "/root/reference/Semantic_Segmentation")
    import model.backbones.espnetv2 as be
    import model.espnetv2 as se
    return be, se


@pytest.mark.parametrize("s", [0.5, 1.0, 2.0])
def test_eespnet_classifier_param_parity(ref_pkg, s):
    be, _ = ref_pkg

    class A:
        num_classes = 1000

    A.s = s
    want = sum(p.numel() for p in be.EESPNet(A()).parameters())
    got, _ = _count(EESPNet(num_classes=1000, s=s), jnp.zeros((1, 64, 64, 3)))
    assert got == want, (s, got, want)


def test_espnetv2_seg_param_parity(ref_pkg):
    _, se = ref_pkg

    class A:
        num_classes = 20
        s = 1.0

    want = sum(p.numel() for p in se.ESPNetv2Seg(A(), classes=20).parameters())
    got, _ = _count(ESPNetv2Seg(num_classes=20, s=1.0), jnp.zeros((1, 64, 64, 3)))
    assert got == want, (got, want)


def test_espnetv1_param_parity_and_geometry(ref_pkg):
    import model.espnet as v1

    from frostnet_tpu.segmentation.espnet import ESPNetSeg

    want = sum(p.numel() for p in v1.ESPNetSeg(classes=20, p=2, q=8).parameters())
    m = ESPNetSeg(num_classes=20, p=2, q=8)
    got, v = _count(m, jnp.zeros((1, 64, 64, 3)))
    assert got == want, (got, want)
    v0 = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), v)
    out = jax.eval_shape(lambda vv, xx: m.apply(vv, xx, mode=fnn_q.FP32),
                         v0, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 20)


def test_espnetv2_seg_geometry():
    m = ESPNetv2Seg(num_classes=20, s=1.0)
    x = jnp.zeros((1, 64, 64, 3))
    _, v = _count(m, x)
    v0 = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), v)
    out = jax.eval_shape(lambda vv, xx: m.apply(vv, xx, mode=fnn_q.FP32), v0, x)
    assert out.shape == (1, 64, 64, 20)

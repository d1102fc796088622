"""Pretrained SSD trunk import: torch MobileNetV2 checkpoint round-trips into
SSDMobileNetV2Feat with matching float forward numerics, using the reference
detection MobileNetV2 (ssd_qmv2.py:113-186, the dilated trunk) as the oracle.

The reference qssd recipe loads weights/mobilenet_v2-float.pth into the trunk
before training (ssd_qmv2.py:338-341); load_torch_mobilenet_v2_checkpoint is
our equivalent, so users can bring the same .pth."""
import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import torch

from frostnet_tpu.detection.models import (
    SSDMobileNetV2Feat,
    load_torch_mobilenet_v2_checkpoint,
)
from frostnet_tpu.nn import FP32, QAT


def _load_reference_ssd_qmv2():
    if "ref_ssd_qmv2" in sys.modules:
        return sys.modules["ref_ssd_qmv2"]
    # shim the imports the trunk classes never touch (torchvision's MBv2 is
    # shadowed by the file's own definition; layers/data only feed the head)
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_mob = types.ModuleType("torchvision.models.mobilenet")
    tv_mob.InvertedResidual = tv_mob.ConvBNReLU = tv_mob.MobileNetV2 = object
    layers = types.ModuleType("layers")
    layers.__all__ = []
    data = types.ModuleType("data")
    data.voc = {}
    data.coco = {}
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x, **kw: x
    sys.modules.update({
        "torchvision": tv, "torchvision.models": tv_models,
        "torchvision.models.mobilenet": tv_mob, "layers": layers,
        "data": data, "tqdm": tqdm_mod,
    })
    spec = importlib.util.spec_from_file_location(
        "ref_ssd_qmv2", "/root/reference/Object_Detection/ssd_qmv2.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_ssd_qmv2"] = mod
    return mod


def test_basenet_import_matches_reference_trunk():
    ref = _load_reference_ssd_qmv2()
    torch.manual_seed(0)
    tmbv2 = ref.MobileNetV2()
    # give BN stats non-trivial values so folding paths are exercised
    for m in tmbv2.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.7, 1.5)
    tmbv2.eval()

    feat = SSDMobileNetV2Feat()
    x = np.random.RandomState(0).randn(2, 96, 96, 3).astype(np.float32)
    variables = jax.jit(lambda k, i: feat.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_torch_mobilenet_v2_checkpoint(tmbv2.state_dict(), variables)

    sources = jax.jit(lambda v, i: feat.apply(v, i, mode=FP32))(
        variables, jnp.asarray(x))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want0 = tmbv2.features[:7](xt).numpy()          # first source tap
        want1 = tmbv2.features(xt).numpy()              # final 1280 conv

    got0 = np.asarray(sources[0]).transpose(0, 3, 1, 2)
    got1 = np.asarray(sources[1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got0, want0, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got1, want1, atol=2e-3, rtol=1e-3)


def test_basenet_leaves_extras_intact():
    ref = _load_reference_ssd_qmv2()
    torch.manual_seed(1)
    tmbv2 = ref.MobileNetV2()

    feat = SSDMobileNetV2Feat()
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = jax.jit(lambda k, i: feat.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)
    before = jax.tree.map(np.asarray, variables["params"]["extra0"])
    loaded = load_torch_mobilenet_v2_checkpoint(tmbv2.state_dict(), variables)
    after = jax.tree.map(np.asarray, loaded["params"]["extra0"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # but the trunk did change
    assert not np.allclose(np.asarray(loaded["params"]["stem"]["kernel"]),
                           np.asarray(variables["params"]["stem"]["kernel"]))

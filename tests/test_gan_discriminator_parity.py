"""Discriminator norm parity vs the reference Style_Transfer networks.

The reference's --norm flag is honored by the DISCRIMINATORS only: the
quantized generator core compares a functools.partial against the string
'none' (networks.py:11-19) and therefore always builds BatchNorm — so our
generator is BN-always by design, while define_d takes norm='batch'
(pix2pix, pix2pix_model.py:32) or 'none' (the repo base default that
cyclegan inherits, base_options.py:36). These tests pin exact param-count
parity against the reference classes executed as oracles."""
import importlib.util

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/Style_Transfer/models/networks.py"


@pytest.fixture(scope="module")
def ref_nets():
    spec = importlib.util.spec_from_file_location("ref_gan_networks", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_params(net):
    return sum(p.numel() for p in net.parameters())


def _our_params(model, channels):
    x = np.zeros((1, 16, 16, channels), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


@pytest.mark.parametrize("norm", ["batch", "none"])
def test_nlayer_discriminator_param_parity(ref_nets, norm):
    from frostnet_tpu.gan.networks import define_d

    norm_layer = ref_nets.get_norm_layer(norm)
    ref = ref_nets.NLayerDiscriminator(6, ndf=64, n_layers=3,
                                       norm_layer=norm_layer)
    ours = define_d(ndf=64, netD="basic", norm=norm)
    want = _ref_params(ref)
    got = _our_params(ours, 6)
    # 'batch': our BN carries batch_stats outside params; count only params.
    assert got == want, (got, want)


@pytest.mark.parametrize("norm", ["batch", "none"])
def test_pixel_discriminator_param_parity(ref_nets, norm):
    from frostnet_tpu.gan.networks import define_d

    norm_layer = ref_nets.get_norm_layer(norm)
    ref = ref_nets.PixelDiscriminator(3, ndf=64, norm_layer=norm_layer)
    ours = define_d(ndf=64, netD="pixel", norm=norm)
    assert _our_params(ours, 3) == _ref_params(ref)


def test_reference_generator_norm_flag_is_inert(ref_nets):
    """Documents WHY define_g has no norm knob: the reference quant core
    builds the same params for norm='none' and norm='batch' (the string
    comparison in its conv wrappers never fires once define_G converts the
    flag to a partial)."""
    g_batch = ref_nets.ResnetGenerator(
        3, 3, ngf=16, norm_layer=ref_nets.get_norm_layer("batch"), n_blocks=2)
    g_none = ref_nets.ResnetGenerator(
        3, 3, ngf=16, norm_layer=ref_nets.get_norm_layer("none"), n_blocks=2)
    assert _ref_params(g_batch) == _ref_params(g_none)
    names = [n for n, _ in g_none.named_modules()]
    assert any("bn" in n.lower() or "batchnorm" in type(m).__name__.lower()
               for n, m in g_none.named_modules()), \
        "expected BatchNorm modules even under norm='none'"

"""GAN multi-step sanity: pix2pix losses behave over ~30 toy steps.

The reference's only automated check is test_before_push.py ("1 epoch,
assert it doesn't crash", Style_Transfer/scripts/test_before_push.py:7-51);
this adds the assertions it lacks: over 30 steps on a fixed synthetic task
the G L1 term must decrease materially and the lsgan D loss must stay in a
sane band (no collapse, no explosion). Also covers the colorization data
mode (L -> ab channels, data/colorization_dataset.py equivalent)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from frostnet_tpu.gan import (
    SyntheticPairs,
    define_d,
    define_g,
    make_net_state,
    make_pix2pix_steps,
)
from frostnet_tpu.gan.data import ColorizationDataset
from frostnet_tpu.nn import FP32, QAT
from frostnet_tpu.optim import adam, qadam, set_warmup

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

WARMUP, QAT_STEPS = 10, 20


def _run_pix2pix(batch, out_nc, warmup=WARMUP, qat_steps=QAT_STEPS):
    """The StatAssist recipe at toy scale: FP warm-up -> is_warmup=False ->
    QAT steps (Style_Transfer/train.py:42-74)."""
    netG = define_g(output_nc=out_nc, netG="resnet_6blocks", quantized=True)
    netD = define_d()
    rng = jax.random.PRNGKey(0)
    g_state = make_net_state(netG, qadam(2e-4, b1=0.5), rng, batch["A"],
                             init_kwargs={"mode": QAT, "train": True})
    d_state = make_net_state(
        netD, adam(2e-4, b1=0.5), rng,
        jnp.concatenate([batch["A"], batch["B"]], -1),
        init_kwargs={"train": True})

    l1_hist, d_hist = [], []
    for mode, n in ((FP32, warmup), (QAT, qat_steps)):
        d_step, g_step = make_pix2pix_steps(netG, netD, mode)
        for _ in range(n):
            d_state, md = d_step(g_state, d_state, batch)
            g_state, mg = g_step(g_state, d_state, batch)
            l1_hist.append(float(mg["loss_G_L1"]))
            d_hist.append(float(md["loss_D"]))
        if mode is FP32:
            g_state = g_state.replace(
                opt_state=set_warmup(g_state.opt_state, False))
    return np.asarray(l1_hist), np.asarray(d_hist)


def test_pix2pix_losses_behave_over_30_steps():
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(SyntheticPairs(32, 2, 2, seed=0))).items()}
    l1_hist, d_hist = _run_pix2pix(batch, 3)

    assert np.isfinite(l1_hist).all() and np.isfinite(d_hist).all()
    # the L1 reconstruction term must fall materially on a fixed batch
    start, end = l1_hist[:5].mean(), l1_hist[-5:].mean()
    assert end < 0.7 * start, (start, end)
    # lsgan D loss: 0.5*((D(fake)-0)^2 + (D(real)-1)^2); equilibrium ~0.25.
    # no collapse to 0 (D wins outright) and no explosion
    assert 0.01 < d_hist[-5:].mean() < 1.5, d_hist[-5:]


def test_pix2pix_colorization_mode(tmp_path):
    """Colorization: A = L channel (1ch), B = ab channels (2ch)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    (tmp_path / "train").mkdir()
    for i in range(2):
        arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / "train" / f"{i}.png")
    ds = ColorizationDataset(str(tmp_path), phase="train", batch_size=2,
                             load_size=36, crop_size=32)
    batch = {k: jnp.asarray(v) for k, v in next(iter(ds)).items()}
    assert batch["A"].shape[-1] == 1 and batch["B"].shape[-1] == 2

    l1_hist, d_hist = _run_pix2pix(batch, 2, warmup=5, qat_steps=10)
    assert np.isfinite(l1_hist).all() and np.isfinite(d_hist).all()
    assert l1_hist[-3:].mean() < l1_hist[:3].mean()

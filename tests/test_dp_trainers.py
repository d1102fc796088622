"""Data-parallel execution of the detection and GAN trainer steps on the
virtual 8-device CPU mesh.

The reference DataParallels the SSD feat net AND head
(Object_Detection/qtrainval.py:124-126) and every GAN net via init_net
(Style_Transfer/models/networks.py:207-208); here the same jitted steps run
with state replicated and the batch sharded over the mesh's 'dp' axis, and
pjit inserts the gradient psum.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.nn import QAT, QAT_FROZEN
from frostnet_tpu.parallel import make_mesh, replicate, shard_batch

pytestmark = [
    pytest.mark.slow,  # heavy tier: excluded from `pytest -m "not slow"`
    pytest.mark.skipif(jax.device_count() < 8,
                       reason="needs the 8-device CPU mesh"),
]


def test_detection_dp_step_runs_sharded():
    import optax

    from frostnet_tpu.detection.anchors import CONFIGS, make_priors
    from frostnet_tpu.detection.data import SyntheticDetection
    from frostnet_tpu.detection.models import build_ssd
    from frostnet_tpu.detection.train import DetState, make_det_train_step
    from frostnet_tpu.optim import get_optimizer

    mesh = make_mesh()          # (8, 1)
    assert mesh.size == 8
    priors = jnp.asarray(make_priors(CONFIGS["voc"]))
    feat, head = build_ssd(num_classes=21)
    bs = 8
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((bs, 300, 300, 3), jnp.float32)
    fv = jax.jit(lambda r, x: feat.init(r, x, mode=QAT, train=True))(rng, sample)
    sources = jax.eval_shape(lambda v, x: feat.apply(v, x, mode=QAT_FROZEN),
                             fv, sample)
    hv = jax.jit(lambda r, s: head.init(r, s, train=True))(
        rng, [jnp.zeros(s.shape, s.dtype) for s in sources])
    tx = get_optimizer("QSGD", 1e-3)
    state = DetState(
        step=jnp.zeros([], jnp.int32),
        feat_params=fv["params"], feat_batch_stats=fv.get("batch_stats", {}),
        feat_quant=fv.get("quant", {}),
        head_params=hv["params"], head_batch_stats=hv.get("batch_stats", {}),
        opt_state=tx.init((fv["params"], hv["params"])), rng=rng, tx=tx)
    state = replicate(state, mesh)

    batch = shard_batch(next(iter(SyntheticDetection(20, 300, bs, bs, 0))), mesh)
    # each shard holds bs/8 images
    assert batch["image"].sharding.num_devices == 8

    step = make_det_train_step(feat, head, QAT, priors, 21)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state.step)) == 1
    # params stay replicated after the update
    leaf = jax.tree.leaves(state.feat_params)[0]
    assert leaf.sharding.is_fully_replicated
    del optax


def test_pix2pix_dp_steps_run_sharded():
    from frostnet_tpu.gan.models import (make_net_state, make_pix2pix_steps)
    from frostnet_tpu.gan.networks import define_d, define_g
    from frostnet_tpu.optim import adam, qadam

    mesh = make_mesh()
    bs, size = 8, 64
    netG = define_g(netG="resnet_6blocks", quantized=True)
    netD = define_d(netD="basic")
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((bs, size, size, 3))
    g_state = make_net_state(netG, qadam(2e-4, b1=0.5), rng, sample,
                             init_kwargs={"mode": QAT, "train": True})
    d_state = make_net_state(netD, adam(2e-4, b1=0.5), rng,
                             jnp.concatenate([sample, sample], -1),
                             init_kwargs={"train": True})
    g_state, d_state = replicate(g_state, mesh), replicate(d_state, mesh)

    rngnp = np.random.RandomState(0)
    batch = shard_batch(
        {"A": rngnp.randn(bs, size, size, 3).astype(np.float32),
         "B": rngnp.randn(bs, size, size, 3).astype(np.float32)}, mesh)
    assert batch["A"].sharding.num_devices == 8

    d_step, g_step = make_pix2pix_steps(netG, netD, QAT, "lsgan", 100.0)
    d_state, md = d_step(g_state, d_state, batch)
    g_state, mg = g_step(g_state, d_state, batch)
    for v in (*md.values(), *mg.values()):
        assert np.isfinite(float(v))
    leaf = jax.tree.leaves(g_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_cyclegan_dp_steps_run_sharded():
    """dp CycleGAN: the JOINT optimizer over two generator param trees
    (cycle_gan_model.py:94-95) plus both D updates, sharded over the mesh.

    The joint opt state is a pytree over a TUPLE of param trees — the one
    optimizer topology no other trainer exercises; replicate() + pjit must
    keep its update psum'd and the resulting params replicated.
    """
    from frostnet_tpu.gan.models import make_cyclegan_steps, make_net_state
    from frostnet_tpu.gan.networks import define_d, define_g
    from frostnet_tpu.optim import adam, qadam

    mesh = make_mesh()
    bs, size = 8, 32
    tx_g = qadam(2e-4, b1=0.5)  # joint over both generators
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((bs, size, size, 3))
    nets_g = [define_g(ngf=8, netG="resnet_6blocks", quantized=True)
              for _ in range(2)]
    nets_d = [define_d(ndf=8, netD="basic") for _ in range(2)]
    gA, gB = (make_net_state(n, tx_g, rng, sample,
                             init_kwargs={"mode": QAT, "train": True})
              for n in nets_g)
    dA, dB = (make_net_state(n, adam(2e-4, b1=0.5), rng, sample,
                             init_kwargs={"train": True}) for n in nets_d)
    joint_opt_state = tx_g.init((gA.params, gB.params))

    gA, gB, dA, dB, joint_opt_state = (
        replicate(s, mesh) for s in (gA, gB, dA, dB, joint_opt_state))
    rngnp = np.random.RandomState(0)
    batch = shard_batch(
        {"A": rngnp.randn(bs, size, size, 3).astype(np.float32),
         "B": rngnp.randn(bs, size, size, 3).astype(np.float32)}, mesh)
    assert batch["A"].sharding.num_devices == 8

    g_step, d_step = make_cyclegan_steps(*nets_g, *nets_d, QAT, "lsgan")
    with mesh:
        gA, gB, joint_opt_state, fake_a, fake_b, mg = g_step(
            gA, gB, dA, dB, batch, joint_opt_state)
        # pool-provided fakes stay device-sharded; Ds train against them
        dA, loss_da = d_step(dA, batch["B"], fake_b)
        dB, loss_db = d_step(dB, batch["A"], fake_a)
    for v in (loss_da, loss_db, *mg.values()):
        assert np.isfinite(float(v))
    # the joint update left BOTH generators' params fully replicated
    for st in (gA, gB):
        leaf = jax.tree.leaves(st.params)[0]
        assert leaf.sharding.is_fully_replicated
    leaf = jax.tree.leaves(joint_opt_state)[0]
    assert leaf.sharding.is_fully_replicated

"""End-to-end smoke: StatAssist warm-up -> QAT -> eval on the 8-device CPU
mesh (the reference's train_one_iter smoke pattern, helper_functions.py:166-230,
plus multi-device coverage the reference never had)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from frostnet_tpu.data import SyntheticClassification, prefetch_to_device
from frostnet_tpu.models import create_model
from frostnet_tpu.nn import FP32, QAT, QAT_FROZEN
from frostnet_tpu.optim import get_optimizer, grouped_weight_decay, GradBoostState
from frostnet_tpu.parallel import make_mesh, replicate, shard_batch
from frostnet_tpu.train import create_train_state, make_train_step, make_eval_step

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow


def test_statassist_qat_train_steps_on_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh()  # 8-way dp
    model = create_model("frostnet_quant_small_0_35", num_classes=10)
    tx = get_optimizer("QSGD", 0.01, weight_decay=grouped_weight_decay(4e-5))

    ds = SyntheticClassification(num_classes=10, image_size=32, length=64,
                                 batch_size=16, seed=0)
    sample = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        quant=replicate(state.quant, mesh),
        opt_state=replicate(state.opt_state, mesh))

    # FP warm-up: one step
    fp_step = make_train_step(model, FP32, num_classes=10)
    batches = list(prefetch_to_device(iter(ds), mesh))
    state, metrics = fp_step(state, batches[0])
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    # warm-up tracked gradient stats
    gb = [s for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda s: isinstance(s, GradBoostState))
        if isinstance(s, GradBoostState)][0]
    assert bool(gb.is_warmup)
    assert any(float(jnp.max(m)) > 0 for m in jax.tree.leaves(gb.exp_max))

    # hand-off + QAT step
    state = state.start_qat()
    qat_step = make_train_step(model, QAT, num_classes=10)
    state, metrics = qat_step(state, batches[1])
    assert np.isfinite(float(metrics["loss"]))

    gb2 = [s for s in jax.tree.leaves(
        state.opt_state, is_leaf=lambda s: isinstance(s, GradBoostState))
        if isinstance(s, GradBoostState)][0]
    assert not bool(gb2.is_warmup)
    assert int(gb2.restart_step) == 1

    # eval in QAT-sim mode
    eval_step = make_eval_step(model, QAT_FROZEN, num_classes=10)
    m = eval_step(state, batches[2])
    assert np.isfinite(float(m["loss"]))

    # recalibration runs unchanged over the sharded state/batches
    from frostnet_tpu.train import recalibrate
    state_rc = recalibrate(model, state, batches[:2])
    assert int(state_rc.step) == int(state.step)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state_rc.batch_stats))


def test_batch_sharding_over_dp():
    mesh = make_mesh()
    batch = {"image": np.zeros((16, 8, 8, 3), np.float32),
             "label": np.zeros((16,), np.int32)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["image"].sharding.device_set) == 8


def test_ema_state_does_not_alias_params():
    """Regression: EMA must copy params — aliased buffers get double-donated
    by the jitted step and the TPU backend rejects with InvalidArgument."""
    model = create_model("frostnet_quant_small_0_35", num_classes=4)
    tx = get_optimizer("SGD", 0.1)
    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               ema_decay=0.99)
    p_leaves = jax.tree.leaves(state.params)
    e_leaves = jax.tree.leaves(state.ema)
    for p, e in zip(p_leaves, e_leaves):
        assert p.unsafe_buffer_pointer() != e.unsafe_buffer_pointer()

    # EMA updates move toward params after a step
    step = make_train_step(model, FP32, num_classes=4, ema_decay=0.99, donate=False)
    batch = {"image": jnp.ones((2, 32, 32, 3)), "label": jnp.zeros((2,), jnp.int32)}
    state2, _ = step(state, batch)
    diffs = [float(jnp.abs(e2 - e1).max()) for e1, e2 in
             zip(jax.tree.leaves(state.ema), jax.tree.leaves(state2.ema))]
    assert any(d > 0 for d in diffs)


def test_recalibrate_converges_stats_without_touching_params():
    from frostnet_tpu.models.frostnet import FrostNet
    from frostnet_tpu.train import recalibrate

    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=3)
    tx = get_optimizer("QSGD", 0.1)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32)),
             "label": jnp.zeros((8,), jnp.int32)}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch["image"],
                               init_kwargs={"mode": QAT, "train": True})

    # 40 passes of one fixed batch: the momentum-0.1 EMA converges to that
    # batch's activation statistics (0.9^40 ~ 1.5% residual)
    state1 = recalibrate(model, state, [batch] * 40)
    # params and optimizer state are untouched (forward-only)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert state1.step == state.step
    # running stats moved
    d0 = max(float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(state1.batch_stats)))
    assert d0 > 1e-3, d0
    # ... and have converged: another 10 passes barely move them
    state2 = recalibrate(model, state1, [batch] * 10)
    d1 = max(float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
             for a, b in zip(jax.tree.leaves(state1.batch_stats),
                             jax.tree.leaves(state2.batch_stats)))
    assert d1 < 0.35 * max(d0, 1.0), (d0, d1)

"""GradBoost optimizer tests.

Oracle strategy: the warm-up phase (StatAssist) is deterministic, so we run
the reference torch optimizers (loaded from /root/reference, with .cuda()
no-op'd) and require exact state/update agreement. The noise phase is
stochastic; we verify its defining properties (sign alignment, clip bound,
decay, coin-toss masking) instead.
"""
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import optax

from frostnet_tpu import optim as fopt


@pytest.fixture(scope="module")
def ref_optim():
    if "ref_optimizer" not in sys.modules:
        torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only oracle
        spec = importlib.util.spec_from_file_location(
            "ref_optimizer", "/root/reference/optimizer.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["ref_optimizer"] = mod
    return sys.modules["ref_optimizer"]


def _run_torch(opt_cls, ref_optim, grads_seq, x0, is_warmup=True, **kw):
    p = torch.nn.Parameter(torch.from_numpy(x0.copy()))
    opt = opt_cls([p], **kw)
    opt.is_warmup = is_warmup
    for g in grads_seq:
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    state = opt.state[p]
    return p.detach().numpy(), state


def test_qsgd_warmup_matches_reference(ref_optim):
    rng = np.random.RandomState(0)
    x0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(5)]

    p_t, st = _run_torch(ref_optim.QSGD, ref_optim, grads, x0,
                         lr=0.1, momentum=0.9, weight_decay=1e-4)

    tx = fopt.qsgd(0.1, momentum=0.9, weight_decay=1e-4)
    params = jnp.asarray(x0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    gb = state[0]  # GradBoostState is first in the chain
    np.testing.assert_allclose(np.asarray(gb.exp_min), st["exp_min"].numpy(), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gb.exp_max), st["exp_max"].numpy(), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(params), p_t, rtol=2e-4, atol=1e-6)


def test_qadam_warmup_matches_reference(ref_optim):
    rng = np.random.RandomState(1)
    x0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) for _ in range(4)]

    p_t, st = _run_torch(ref_optim.QAdam, ref_optim, grads, x0,
                         lr=1e-3, weight_decay=1e-2)

    tx = fopt.qadam(1e-3, weight_decay=1e-2)
    params = jnp.asarray(x0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), p_t, rtol=2e-4, atol=1e-6)


def test_qadamw_warmup_matches_reference(ref_optim):
    rng = np.random.RandomState(2)
    x0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) for _ in range(4)]

    p_t, _ = _run_torch(ref_optim.QAdamW, ref_optim, grads, x0,
                        lr=1e-3, weight_decay=1e-2)

    tx = fopt.qadamw(1e-3, weight_decay=1e-2)
    params = jnp.asarray(x0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), p_t, rtol=2e-4, atol=1e-6)


def test_qrmsprop_warmup_matches_reference(ref_optim):
    rng = np.random.RandomState(3)
    x0 = rng.randn(5).astype(np.float32)
    grads = [rng.randn(5).astype(np.float32) for _ in range(4)]
    p_t, _ = _run_torch(ref_optim.QRMSprop, ref_optim, grads, x0,
                        lr=1e-2, alpha=0.9, momentum=0.9, weight_decay=1e-4)
    tx = fopt.qrmsprop(1e-2, alpha=0.9, momentum=0.9, weight_decay=1e-4)
    params = jnp.asarray(x0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), p_t, rtol=2e-4, atol=1e-6)


def test_noise_phase_properties():
    """After set_warmup(False): noise is bounded by clip_by, sign-aligned,
    zero where the coin lands 0, and restart_step counts up."""
    clip_by = 1e-3
    gb = fopt.gradboost(clip_by=clip_by, toss_coin=True, seed=42)
    g = jnp.ones((1000,)) * 0.5
    state = gb.init(g)
    # one warm-up step to populate EMAs
    _, state = gb.update(g, state)
    state = fopt.set_warmup(state, False)
    boosted, state = gb.update(g, state)
    assert int(state.restart_step) == 1
    noise = np.asarray(boosted - g)
    assert (noise >= -1e-9).all()          # sign-aligned with positive grads
    assert (noise <= clip_by + 1e-9).all() # clip bound
    frac_zero = (np.abs(noise) < 1e-12).mean()
    assert 0.3 < frac_zero < 0.7           # coin-toss masks ~half

    # negative grads -> negative noise
    g2 = -g
    boosted2, _ = gb.update(g2, state)
    assert (np.asarray(boosted2 - g2) <= 1e-9).all()


def test_noise_decays_with_restart_step():
    """Noise amplitude scales by (1-noise_decay)^restart_step. Build states
    that differ only in restart_step (same PRNG key -> identical Laplace
    draws) and check the exact 0.5 ratio."""
    gb = fopt.gradboost(clip_by=1e6, toss_coin=False, noise_decay=0.5, seed=0)
    g = jnp.ones((4096,))
    base = gb.init(g)

    def noise_at(restart_step):
        state = base._replace(
            step=jnp.asarray(1000, jnp.int32),  # bc1 ~ 1
            restart_step=jnp.asarray(restart_step, jnp.int32),
            is_warmup=jnp.asarray(False),
            exp_min=jnp.zeros_like(g),
            exp_max=jnp.ones_like(g),
        )
        boosted, st = gb.update(g, state)
        assert int(st.restart_step) == restart_step + 1
        return np.abs(np.asarray(boosted - g)).mean()

    m0, m1, m2 = noise_at(0), noise_at(1), noise_at(2)
    assert m0 > 0
    np.testing.assert_allclose(m1 / m0, 0.5, rtol=1e-5)
    np.testing.assert_allclose(m2 / m0, 0.25, rtol=1e-5)


def test_set_warmup_traverses_chain():
    tx = fopt.qadam(1e-3)
    state = tx.init(jnp.ones(3))
    st2 = fopt.set_warmup(state, False)
    found = [s for s in jax.tree.leaves(
        st2, is_leaf=lambda s: isinstance(s, fopt.GradBoostState))
        if isinstance(s, fopt.GradBoostState)]
    assert len(found) == 1 and not bool(found[0].is_warmup)


def test_get_optimizer_dispatch():
    for name in ["SGD", "RMS", "Adam", "AdamW", "QSGD", "QRMS", "QAdam", "QAdamW", "QAdamN"]:
        tx = fopt.get_optimizer(name, 1e-3)
        state = tx.init(jnp.ones(2))
        u, _ = tx.update(jnp.ones(2), state, jnp.ones(2))
        assert jnp.isfinite(u).all()
    with pytest.raises(ValueError):
        fopt.get_optimizer("nope", 1e-3)


def test_schedules_match_reference_formulas():
    sched = fopt.get_lr_scheduler("poly", base_lr=0.007, total_steps=100, power=0.9)
    assert abs(float(sched(0)) - 0.007) < 1e-7
    assert abs(float(sched(50)) - 0.007 * 0.5 ** 0.9) < 1e-7

    sched = fopt.get_lr_scheduler("cosine", base_lr=0.1, total_steps=100)
    assert abs(float(sched(0)) - 0.1) < 1e-7
    assert abs(float(sched(50)) - 0.05) < 1e-7
    assert float(sched(100)) < 1e-7

    sched = fopt.get_lr_scheduler("multistep", base_lr=1e-3, milestones=[80000, 100000], gamma=0.1)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(80000)) - 1e-4) < 1e-9
    assert abs(float(sched(100001)) - 1e-5) < 1e-10

    sched = fopt.get_lr_scheduler("cos_lr", base_lr=0.1, total_steps=1000,
                                  warmup_steps=100, warmup_lr=1e-4)
    assert abs(float(sched(0)) - 1e-4) < 1e-6
    assert abs(float(sched(100)) - 0.1) < 1e-6   # end of warm-up
    assert abs(float(sched(550)) - 0.05) < 1e-3  # cosine midpoint

    # step_lr takes steps_per_epoch (NOT total_steps) — the published
    # ImageNet recipe's --sched step --decay-epochs 2.4 --decay-rate .97
    # (training_commands.txt:1-19); fractional decay_epochs must work
    sched = fopt.get_lr_scheduler("step_lr", base_lr=0.048, steps_per_epoch=10,
                                  decay_epochs=2.4, gamma=0.97)
    assert abs(float(sched(0)) - 0.048) < 1e-9            # epoch 0
    assert abs(float(sched(29)) - 0.048) < 1e-9           # epoch 2 < 2.4
    assert abs(float(sched(30)) - 0.048 * 0.97) < 1e-8    # epoch 3 >= 2.4
    assert abs(float(sched(100)) - 0.048 * 0.97 ** 4) < 1e-8  # epoch 10

    sched = fopt.get_lr_scheduler("gan_linear", base_lr=2e-4, n_epochs=100, n_epochs_decay=100)
    assert abs(float(sched(50)) - 2e-4) < 1e-9   # flat phase
    assert float(sched(200)) < 2e-6              # decayed to ~0

    sched = fopt.get_lr_scheduler("warmpoly", base_lr=0.1, total_steps=100,
                                  warmup_ratio=0.05, power=0.9)
    # matches WarmupPoly.get_lr at a few points
    assert abs(float(sched(2)) - 0.1 * ((3) / 5) ** 0.9) < 1e-6
    assert abs(float(sched(50)) - 0.1 * (1 - 45 / 95) ** 0.9) < 1e-6


def test_epoch_schedules_match_reference_classes():
    """cyclic/hybrid/fixed epoch schedulers vs the reference implementations
    (Semantic_Segmentation/utilities/lr_scheduler.py, imported as oracle)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_lrsched", "/root/reference/Semantic_Segmentation/utilities/lr_scheduler.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ref = mod.FixedMultiStepLR(base_lr=0.1, steps=[30, 60, 90], gamma=0.1)
    ours = fopt.get_lr_scheduler("multistep", base_lr=0.1,
                                 milestones=[30, 60, 90], gamma=0.1)
    for e in [0, 29, 30, 59, 60, 95]:
        # bisect.bisect counts e>=milestone boundaries like ours
        assert abs(float(ours(e)) - ref.step(e)) < 1e-6, e

    refp = mod.PolyLR(base_lr=0.007, max_epochs=100, power=0.9)
    oursp = fopt.get_lr_scheduler("poly", base_lr=0.007, total_steps=100, power=0.9)
    for e in [0, 10, 50, 99]:
        assert abs(float(oursp(e)) - refp.step(e)) < 2e-6, e

    refc = mod.CyclicLR(min_lr=0.01, cycle_len=5, steps=[51, 161, 201], gamma=0.1)
    oursc = fopt.get_lr_scheduler("clr", min_lr=0.01, cycle_len=5,
                                  milestones=[51, 161, 201], gamma=0.1)
    ref_vals = [refc.step(e) for e in range(120)]
    our_vals = [float(oursc(e)) for e in range(120)]
    # the reference rounds to 5 decimals and mutates min_lr at (modular!)
    # milestones; compare the first cycle region exactly
    np.testing.assert_allclose(our_vals[:51], ref_vals[:51], atol=1e-5)

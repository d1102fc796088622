"""Oracle tests for the published FrostNet ImageNet recipe's optimizer and
EMA (training_commands.txt:1-19: RMSPropTF + --model-ema-decay 0.9999).

timm is not installed in this environment, so the oracle is a direct numpy
transcription of the update rules these flags select:

* timm.optim.RMSpropTF.step (TF1 rmsprop semantics): per step with lr
  constant,
      square_avg <- alpha*square_avg + (1-alpha)*g^2      (init ONE, not 0)
      avg        <- sqrt(square_avg + eps)                (eps INSIDE sqrt)
      mom_buf    <- momentum*mom_buf + lr * g/avg
      p          <- p - mom_buf
  with weight decay added into g first (not decoupled). Our optax chain
  keeps the momentum buffer in lr-free units (buf <- g/avg + momentum*buf;
  p -= lr*buf), identical for a constant lr.
* timm.utils.ModelEmaV2.update: ema <- decay*ema + (1-decay)*p.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.optim import get_optimizer
from frostnet_tpu.optim.gradboost import param_ema, rmsprop_tf


def _numpy_rmsprop_tf(params, grads_seq, lr, alpha, momentum, eps, wd):
    p = params.astype(np.float64).copy()
    square_avg = np.ones_like(p)   # TF init: slot initialized to ones
    mom_buf = np.zeros_like(p)
    for g in grads_seq:
        g = g.astype(np.float64) + wd * p
        square_avg = alpha * square_avg + (1 - alpha) * g * g
        avg = np.sqrt(square_avg + eps)   # eps inside the sqrt
        mom_buf = momentum * mom_buf + lr * g / avg
        p = p - mom_buf
    return p


@pytest.mark.parametrize("momentum,wd", [(0.9, 0.0), (0.9, 1e-2), (0.0, 0.0)])
def test_rmsprop_tf_matches_tf1_semantics(momentum, wd):
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 7).astype(np.float32)
    grads = [rng.randn(4, 7).astype(np.float32) * 0.5 for _ in range(12)]
    lr, alpha, eps = 0.02, 0.9, 1e-3

    tx = rmsprop_tf(lr, alpha=alpha, momentum=momentum, eps=eps, weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)

    want = _numpy_rmsprop_tf(p0, grads, lr, alpha, momentum, eps, wd)
    np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=2e-5, atol=2e-6)


def test_rmsprop_tf_square_avg_initialized_at_one():
    """The torch-RMSprop-vs-TF distinction that bites hardest: TF starts the
    rms slot at 1, so the very first update is ~lr*g, not ~lr*sign(g)."""
    tx = rmsprop_tf(0.1, alpha=0.9, momentum=0.0, eps=1e-3)
    params = {"w": jnp.zeros((3,))}
    g = jnp.asarray([1e-3, -1e-3, 1e-3])
    upd, _ = tx.update({"w": g}, tx.init(params), params)
    # square_avg after one step = 0.9*1 + 0.1*g^2 ~= 0.9 (slot started at 1);
    # a zero-initialized slot would give denom ~= |g| and update ~= -lr*sign(g)
    denom = np.sqrt(0.9 * 1.0 + 0.1 * np.asarray(g) ** 2 + 1e-3)
    np.testing.assert_allclose(np.asarray(upd["w"]),
                               -0.1 * np.asarray(g) / denom, rtol=1e-5)


def test_rmsprop_tf_registry_name():
    tx = get_optimizer("RMSTF", 0.01)
    params = {"w": jnp.ones((2,))}
    upd, _ = tx.update({"w": jnp.ones((2,))}, tx.init(params), params)
    assert np.all(np.isfinite(np.asarray(upd["w"])))


def test_param_ema_matches_model_ema_v2():
    decay = 0.9
    init, update = param_ema(decay)
    rng = np.random.RandomState(1)
    p = rng.randn(5).astype(np.float32)
    state = init({"w": jnp.asarray(p)})
    ema_np = p.astype(np.float64).copy()
    for _ in range(6):
        p = p + rng.randn(5).astype(np.float32) * 0.1
        state = update(state, {"w": jnp.asarray(p)})
        ema_np = decay * ema_np + (1 - decay) * p
    np.testing.assert_allclose(np.asarray(state.ema["w"]), ema_np, rtol=1e-5)


def test_param_ema_init_is_a_copy_of_params():
    init, _ = param_ema(0.9999)
    p = {"w": jnp.asarray([1.0, 2.0])}
    state = init(p)
    np.testing.assert_array_equal(np.asarray(state.ema["w"]), [1.0, 2.0])

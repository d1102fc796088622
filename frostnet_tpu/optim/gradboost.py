"""StatAssist + GradBoost as optax gradient transformations.

TPU-native re-design of the reference's "Q"-optimizers (QSGD/QRMSprop/QAdam/
QAdamW at optimizer.py:50-667, QAdamN at Style_Transfer/util/optimizer.py):
instead of per-parameter Python loops mutating torch state, GradBoost is one
pure, chainable :func:`gradboost` transform whose state (exp_min/exp_max EMAs
of |grad|, step counters, PRNG key) lives in the optimizer pytree and whose
update runs fully fused inside the jitted train step.

Semantics match the reference exactly:

  * warm-up (StatAssist phase, ``is_warmup=True``): only track per-parameter
    EMAs of the running min/max of |grad|, with the reference's compound
    bias-correction ``m <- (beta*m + (1-beta)*min(m,|g|)) / (1-beta^t)``
    (optimizer.py:164-168);
  * QAT phase: additionally inject decaying, sign-aligned, coin-toss-masked
    |Laplace(0,1)| noise scaled by the observed gradient sensitivity
    ``(exp_max-exp_min) * (1-noise_decay)^restart_step``, clipped to
    ±clip_by, added to the gradient (optimizer.py:170-189);
  * the warm-up flag is flipped by :func:`set_warmup` (the
    ``optimizer.is_warmup = False`` lines, e.g. Classification/train.py:162).

Laplace noise comes from the JAX PRNG carried in the state — replacing the
reference's host-side ``np.random.laplace(...).cuda()`` round trip
(optimizer.py:178-180) with on-device sampling.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class GradBoostState(NamedTuple):
    step: jnp.ndarray          # int32
    restart_step: jnp.ndarray  # int32, counts post-warm-up steps
    is_warmup: jnp.ndarray     # bool
    exp_min: optax.Updates
    exp_max: optax.Updates
    rng_key: jax.Array


def gradboost(
    beta: float = 0.9,
    clip_by: float = 1e-3,
    toss_coin: bool = True,
    noise_decay: float = 1e-2,
    seed: int = 0,
) -> optax.GradientTransformation:
    """The GradBoost gradient transform. Chain in front of any base optimizer."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return GradBoostState(
            step=jnp.zeros([], jnp.int32),
            restart_step=jnp.zeros([], jnp.int32),
            is_warmup=jnp.ones([], jnp.bool_),
            exp_min=zeros,
            exp_max=jax.tree.map(jnp.zeros_like, params),
            rng_key=jax.random.PRNGKey(seed),
        )

    def update_fn(updates, state, params=None):
        del params
        step = state.step + 1
        bc1 = 1.0 - beta ** step.astype(jnp.float32)

        def ema_min(m, g):
            return (beta * m + (1.0 - beta) * jnp.minimum(m, jnp.abs(g))) / bc1

        def ema_max(m, g):
            return (beta * m + (1.0 - beta) * jnp.maximum(m, jnp.abs(g))) / bc1

        exp_min = jax.tree.map(ema_min, state.exp_min, updates)
        exp_max = jax.tree.map(ema_max, state.exp_max, updates)

        restart_step = jnp.where(state.is_warmup, state.restart_step, state.restart_step + 1)
        noise_scale = (1.0 - noise_decay) ** restart_step.astype(jnp.float32)
        # noise amplitude is 0 during warm-up -> one fused branch-free kernel
        amp = jnp.where(state.is_warmup, 0.0, noise_scale)

        leaves, treedef = jax.tree.flatten(updates)
        min_leaves = jax.tree.leaves(exp_min)
        max_leaves = jax.tree.leaves(exp_max)
        keys = jax.random.split(state.rng_key, len(leaves) + 1)
        new_key, leaf_keys = keys[0], keys[1:]

        boosted = []
        for g, mn, mx, k in zip(leaves, min_leaves, max_leaves, leaf_keys):
            k1, k2 = jax.random.split(k)
            lap = jnp.abs(jax.random.laplace(k1, g.shape, jnp.float32))
            noise = lap * ((mx - mn) * amp)
            if toss_coin:
                noise = noise * jax.random.bernoulli(k2, 0.5, g.shape)
            noise = noise * jnp.sign(g)
            if clip_by > 0.0:
                noise = jnp.clip(noise, -clip_by, clip_by)
            boosted.append(g + noise.astype(g.dtype))
        updates = jax.tree.unflatten(treedef, boosted)

        return updates, GradBoostState(
            step=step,
            restart_step=restart_step,
            is_warmup=state.is_warmup,
            exp_min=exp_min,
            exp_max=exp_max,
            rng_key=new_key,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def set_warmup(opt_state, is_warmup: bool):
    """Flip the StatAssist warm-up flag anywhere in a (possibly nested)
    optax state — the ``optimizer.is_warmup = False`` switch."""

    def _flip(s):
        if isinstance(s, GradBoostState):
            return s._replace(is_warmup=jnp.asarray(is_warmup))
        return s

    return jax.tree.map(_flip, opt_state, is_leaf=lambda s: isinstance(s, GradBoostState))


# ---------------------------------------------------------------------------
# The named optimizers (reference get_optimizer, optimizer.py:6-48).
# LR is injected via optax schedules or a plain float.
# ---------------------------------------------------------------------------


def grouped_weight_decay(weight_decay: float, bn_scale: float = 0.01) -> optax.GradientTransformation:
    """The reference's per-shape weight-decay groups (Classification/
    train.py:129-137, Semantic_Segmentation/train.py:134-144): depthwise conv
    kernels (HWIO with I==1) get wd 0, other conv kernels full wd, everything
    else (BN scale/bias, 1x1 biases) wd*bn_scale."""

    def leaf_wd(p):
        if p.ndim == 4:
            return 0.0 if p.shape[2] == 1 else weight_decay
        return weight_decay * bn_scale

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("grouped_weight_decay requires params")
        updates = jax.tree.map(lambda g, p: g + leaf_wd(p) * p, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _wd(weight_decay) -> optax.GradientTransformation:
    """Accept a float (plain L2) or a ready transform (e.g. grouped decay)."""
    if isinstance(weight_decay, optax.GradientTransformation):
        return weight_decay
    return optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity()


def sgd(learning_rate, momentum=0.9, weight_decay=0.0, nesterov=False):
    """torch.optim.SGD semantics: wd as L2 term added to the gradient, then
    heavy-ball momentum buffer, update = lr * buf."""
    return optax.chain(
        _wd(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


def qsgd(learning_rate, momentum=0.9, weight_decay=0.0, nesterov=False,
         clip_by=1e-3, toss_coin=True, noise_decay=1e-2, seed=0):
    """QSGD (optimizer.py:50-206): noise added to raw grad, then wd, then momentum."""
    return optax.chain(
        gradboost(0.9, clip_by, toss_coin, noise_decay, seed),
        _wd(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


def rmsprop(learning_rate, alpha=0.9, momentum=0.9, eps=1e-8, weight_decay=0.0):
    return optax.chain(
        _wd(weight_decay),
        optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False),
        optax.trace(decay=momentum) if momentum else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


def qrmsprop(learning_rate, alpha=0.9, momentum=0.9, eps=1e-8, weight_decay=0.0,
             clip_by=1e-3, toss_coin=True, noise_decay=1e-2, seed=0):
    """QRMSprop (optimizer.py:208-359): noise -> wd -> rms -> momentum."""
    return optax.chain(
        gradboost(0.9, clip_by, toss_coin, noise_decay, seed),
        _wd(weight_decay),
        optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False),
        optax.trace(decay=momentum) if momentum else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


class AmsgradState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam(amsgrad=True) semantics — also the reference
    QAdam/QAdamW amsgrad branch (optimizer.py:500-504, 655-659): the running
    max is over the RAW second moment, bias correction divides the max
    afterward. optax.scale_by_amsgrad maxes the bias-CORRECTED nu_hat
    instead, which pins an early spike permanently and tracks a materially
    different trajectory."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return AmsgradState(jnp.zeros([], jnp.int32), z,
                            jax.tree.map(jnp.zeros_like, params),
                            jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm / bc2) + eps), mu, nu_max)
        return out, AmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_adam(b1, b2, eps, amsgrad):
    return (scale_by_amsgrad_torch(b1=b1, b2=b2, eps=eps) if amsgrad
            else optax.scale_by_adam(b1=b1, b2=b2, eps=eps))


def _decoupled_wd(weight_decay) -> optax.GradientTransformation:
    """AdamW-style decay term: a float becomes add_decayed_weights; a ready
    transform (grouped_weight_decay) is used as-is — it adds wd(p)*p to the
    updates, which IS decoupled decay when placed after the moment scaling."""
    if isinstance(weight_decay, optax.GradientTransformation):
        return weight_decay
    return optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity()


def adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
         amsgrad=False):
    return optax.chain(
        _wd(weight_decay),
        _scale_adam(b1, b2, eps, amsgrad),
        optax.scale_by_learning_rate(learning_rate),
    )


def qadam(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
          amsgrad=False, clip_by=1e-3, toss_coin=True, noise_decay=1e-2, seed=0):
    """QAdam (optimizer.py:361-512): wd (L2-style) -> noise -> adam moments."""
    return optax.chain(
        _wd(weight_decay),
        gradboost(0.9, clip_by, toss_coin, noise_decay, seed),
        _scale_adam(b1, b2, eps, amsgrad),
        optax.scale_by_learning_rate(learning_rate),
    )


def adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2, amsgrad=False):
    """AdamW: decoupled decay; accepts a float or a grouped-decay transform
    (a GradientTransformation crashed optax.adamw — round-3 review fix)."""
    return optax.chain(
        _scale_adam(b1, b2, eps, amsgrad),
        _decoupled_wd(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def qadamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
           amsgrad=False, clip_by=1e-3, toss_coin=True, noise_decay=1e-2, seed=0):
    """QAdamW (optimizer.py:514-667): decoupled wd on params, noise on grads,
    adam moments."""
    return optax.chain(
        gradboost(0.9, clip_by, toss_coin, noise_decay, seed),
        _scale_adam(b1, b2, eps, amsgrad),
        _decoupled_wd(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def qadamn(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
           clip_by=1e-3, toss_coin=True, noise_decay=1e-2, seed=0):
    """QAdamN — Adam with Nesterov lookahead + GradBoost (the extra optimizer
    in Style_Transfer/util/optimizer.py:514-688). Nesterov-Adam == NAdam-style
    momentum on the first moment."""
    return optax.chain(
        _wd(weight_decay),
        gradboost(0.9, clip_by, toss_coin, noise_decay, seed),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps, nesterov=True),
        optax.scale_by_learning_rate(learning_rate),
    )


_OPTIMIZERS = {
    "SGD": sgd,
    "RMS": rmsprop,
    "Adam": adam,
    "AdamW": adamw,
    "QSGD": qsgd,
    "QRMS": qrmsprop,
    "QAdam": qadam,
    "QAdamW": qadamw,
    "QAdamN": qadamn,
}


def get_optimizer(name: str, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Dispatch by the reference's optimizer names (optimizer.py:6-48)."""
    try:
        fn = _OPTIMIZERS[name]
    except KeyError:
        raise ValueError(f"unknown optimizer {name!r}; options: {list(_OPTIMIZERS)}")
    return fn(learning_rate, **kwargs)


def rmsprop_tf(learning_rate, alpha=0.9, momentum=0.9, eps=1e-3, weight_decay=0.0):
    """timm's RMSpropTF — the optimizer of the published FrostNet ImageNet
    recipe (training_commands.txt:1-19). Differences from torch RMSprop:
    eps inside the sqrt and square_avg initialized at 1 (via bias-free TF
    semantics). optax.scale_by_rms(eps_in_sqrt=True, initial_scale=1.0)
    reproduces exactly that."""
    return optax.chain(
        _wd(weight_decay),
        optax.scale_by_rms(decay=alpha, eps=eps, initial_scale=1.0, eps_in_sqrt=True),
        optax.trace(decay=momentum) if momentum else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )


class EmaState(NamedTuple):
    ema: optax.Params


def param_ema(decay: float = 0.9999):
    """Model-weight EMA tracker (timm --model-ema 0.9999 in the FrostNet
    recipe). Not a gradient transform: call ``update_ema`` after
    apply_updates and evaluate with ``state.ema`` params."""

    def init(params):
        return EmaState(ema=jax.tree.map(jnp.asarray, params))

    def update(state: EmaState, new_params):
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           state.ema, new_params)
        return EmaState(ema=ema)

    return init, update

_OPTIMIZERS["RMSTF"] = rmsprop_tf

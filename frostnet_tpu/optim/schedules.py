"""Learning-rate schedules — the union of every scheduler in the reference,
as pure jittable ``step -> lr`` functions (optax-compatible).

Sources (reference):
  * per-iteration cosine/linear/step with linear warm-up —
    Classification/utils/helper_functions.py:231-305
  * epoch schedulers fixed/clr/poly/linear/cosine/hybrid —
    Semantic_Segmentation/utilities/lr_scheduler.py:4-227
  * WarmupPoly / WarmupPolyCycle — Classification/utils/utils.py:135-207
  * GAN linear decay + step/plateau/cosine — Style_Transfer/models/networks.py:130-157
  * detection step decay at lr_steps — Object_Detection/qtrainval.py:336-344

All are expressed in *steps* (iterations); epoch-level reference schedulers
take ``steps_per_epoch=1`` and an epoch index. ``plateau`` is inherently
metric-driven so it's a tiny host-side class.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _warmup(step, warmup_steps, warmup_lr, base_lr):
    return warmup_lr + (base_lr - warmup_lr) * step / warmup_steps


def warmup_cosine(base_lr, total_steps, warmup_steps=0, warmup_lr=0.0,
                  restart_period=None):
    """Per-iter cosine with linear warm-up (helper_functions.py:231-261).
    ``restart_period`` implements the ``anneal`` restart variant."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if restart_period is not None:
            step = jnp.mod(step, restart_period)
            total = restart_period - warmup_steps
        else:
            total = total_steps - warmup_steps
        cur = step - warmup_steps
        cos_lr = base_lr / 2 * (jnp.cos(jnp.pi * cur / total) + 1)
        if warmup_steps > 0:
            return jnp.where(step < warmup_steps,
                             _warmup(step, warmup_steps, warmup_lr, base_lr), cos_lr)
        return cos_lr

    return schedule


def warmup_linear(base_lr, total_steps, warmup_steps=0, warmup_lr=0.0,
                  restart_period=None):
    """Per-iter linear decay with warm-up (helper_functions.py:264-291)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if restart_period is not None:
            step = jnp.mod(step, restart_period)
            total = restart_period - warmup_steps
        else:
            total = total_steps - warmup_steps
        cur = step - warmup_steps
        lin_lr = base_lr * (1 - cur / total)
        if warmup_steps > 0:
            return jnp.where(step < warmup_steps,
                             _warmup(step, warmup_steps, warmup_lr, base_lr), lin_lr)
        return lin_lr

    return schedule


def warmup_step(base_lr, steps_per_epoch, warmup_steps=0, warmup_lr=0.0,
                decay_epochs=30, gamma=0.1):
    """Step decay by gamma every decay_epochs (helper_functions.py:294-305)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        lr = base_lr * gamma ** jnp.floor(epoch / decay_epochs)
        if warmup_steps > 0:
            return jnp.where(step < warmup_steps,
                             _warmup(step, warmup_steps, warmup_lr, base_lr), lr)
        return lr

    return schedule


def multistep(base_lr, milestones: Sequence[int], gamma=0.1):
    """Decay by gamma at each milestone step (detection lr_steps,
    Object_Detection/data/config.py:17-49 + qtrainval.py:336-344; also
    torch MultiStepLR for GAN 'step' policy)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n = jnp.sum(step >= ms)
        return base_lr * gamma ** n.astype(jnp.float32)

    return schedule


def poly(base_lr, total_steps, power=0.9):
    """PolyLR (lr_scheduler.py:110-121)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * (1.0 - step / total_steps) ** power

    return schedule


def linear(base_lr, total_steps):
    """LinearLR epoch decay (lr_scheduler.py:130-137)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * (1.0 - step / total_steps)

    return schedule


def cosine(base_lr, total_steps):
    """CosineLR (lr_scheduler.py:192-205)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * (1 + jnp.cos(jnp.pi * step / total_steps)) / 2

    return schedule


def cyclic(min_lr, cycle_len=5, milestones: Sequence[int] = (51,), gamma=0.5):
    """Cyclic LR with warm restarts (lr_scheduler.py:26-91): within each
    cycle, lr ramps from min_lr*cycle_len down linearly to min_lr; min_lr
    decays by gamma at each milestone. The first epoch runs at min_lr
    (the reference's warm-up-interval-1 guard)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n = jnp.sum((step >= ms) & (ms > 1))
        base = min_lr * gamma ** n.astype(jnp.float32)
        phase = jnp.mod(step - 1, cycle_len)  # epoch 0 = warm-up at min_lr
        cyc = base * cycle_len - phase * base
        return jnp.where(step < 1, base, cyc)

    return schedule


def hybrid(base_lr, total_steps, clr_max, cycle_len=5):
    """HybirdLR (lr_scheduler.py:208-227): cyclic until clr_max, then linear."""
    cyc = cyclic(base_lr, cycle_len, milestones=(clr_max,), gamma=1.0)
    linear_steps = total_steps - clr_max + 1

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lin = base_lr * (1.0 - (step - clr_max + 1) / linear_steps)
        return jnp.where(step < clr_max, cyc(step), lin)

    return schedule


def warmup_poly(base_lr, total_steps, warmup_ratio=0.05, power=0.9):
    """WarmupPoly (Classification/utils/utils.py:155-176): poly ramp-up then
    poly decay."""
    warmup_steps = int(warmup_ratio * total_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = base_lr * ((step + 1) / max(warmup_steps, 1)) ** power
        down = base_lr * (1 - (step - warmup_steps) / (total_steps - warmup_steps)) ** power
        return jnp.where(step < warmup_steps, up, down)

    return schedule


def warmup_poly_cycle(base_lr, total_steps, warmup_ratio=0.05, power=0.9,
                      restart_ratio=0.5):
    """WarmupPolyCycle (Classification/utils/utils.py:177-207): WarmupPoly
    restarted every restart_ratio*total_steps."""
    cycle = max(int(total_steps * restart_ratio), 1)
    warmup_steps = int(warmup_ratio * cycle)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pos = jnp.mod(step, cycle)
        up = base_lr * ((pos + 1) / max(warmup_steps, 1)) ** power
        down = base_lr * (1 - (pos - warmup_steps) / (cycle - warmup_steps)) ** power
        return jnp.where(pos < warmup_steps, up, down)

    return schedule


def gan_linear(base_lr, n_epochs, n_epochs_decay, epoch_count=1):
    """Style_Transfer 'linear' policy (networks.py:144-147): flat for
    n_epochs, then linear decay to zero over n_epochs_decay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = 1.0 - jnp.maximum(0.0, step + epoch_count - n_epochs) / (n_epochs_decay + 1)
        return base_lr * frac

    return schedule


class ReduceLROnPlateau:
    """Metric-driven decay (Style_Transfer 'plateau' policy,
    networks.py:152-153). Host-side state by nature; call .step(metric)."""

    def __init__(self, base_lr, mode="min", factor=0.2, threshold=0.01, patience=5):
        self.lr = base_lr
        self.mode = mode
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.best = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        better = (
            self.best is None
            or (self.mode == "min" and metric < self.best * (1 - self.threshold))
            or (self.mode == "max" and metric > self.best * (1 + self.threshold))
        )
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


_SCHEDULES = {
    "cos_lr": warmup_cosine,
    "linear_lr": warmup_linear,
    "step_lr": warmup_step,
    "multistep": multistep,
    "poly": poly,
    "linear": linear,
    "cosine": cosine,
    "clr": cyclic,
    "hybrid": hybrid,
    "warmpoly": warmup_poly,
    "warmpolycycle": warmup_poly_cycle,
    "gan_linear": gan_linear,
}


def get_lr_scheduler(name: str, **kwargs):
    """Dispatch mirroring the reference's get_lr_scheduler/get_scheduler."""
    try:
        return _SCHEDULES[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown schedule {name!r}; options: {list(_SCHEDULES)}")

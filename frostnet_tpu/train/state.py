"""QAT training state and step factories.

The reference's phase machinery (FP warm-up loop -> is_warmup=False ->
fuse/prepare_qat -> QAT loop; Classification/train.py:149-240) becomes:

  * one :class:`QATTrainState` pytree holding params, BN stats, observer
    state, optimizer state, step counter and PRNG key — all device-resident,
    sharded/replicated over the mesh;
  * :func:`make_train_step` builds a jitted (state, batch) -> (state, metrics)
    step for a given :class:`QuantMode`; the FP32 and QAT phases are two
    compilations of the same function, not two module graphs;
  * the StatAssist hand-off is ``state.replace(opt_state=set_warmup(...))``.

Data parallelism: batches arrive sharded over the mesh's 'dp' axis; XLA
inserts the gradient psum (replacing DataParallel scatter/gather and
DataParallelCriteria's loss-parallel trick, SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..nn.mode import QuantMode, FP32, QAT
from ..optim import set_warmup
from ..utils.losses import cross_entropy
from ..utils.metrics import topk_accuracy

# device-side normalization constants for uint8 input batches (see
# _prep_image); match data.IMAGENET_MEAN/STD and the native loader defaults.
# Plain tuples, NOT jnp arrays: a module-level jnp constant would initialize
# the XLA backend at import time and break jax.distributed.initialize().
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _prep_image(image, mean=None, std=None):
    """uint8 batches are normalized ON DEVICE (fused into the step by XLA):
    the host pipeline ships raw RGB bytes — 4x less host->device traffic than
    pre-normalized f32 (the native loader's output='uint8' mode)."""
    if image.dtype != jnp.uint8:
        return image
    mean = jnp.asarray(mean if mean is not None else _IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(std if std is not None else _IMAGENET_STD, jnp.float32)
    return (image.astype(jnp.float32) / 255.0 - mean) / std


@flax.struct.dataclass
class QATTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    quant: Any
    opt_state: Any
    rng: jax.Array
    ema: Any = None  # optional param EMA (timm --model-ema in the recipe)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)

    @property
    def model_variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.quant:
            v["quant"] = self.quant
        return v

    def start_qat(self) -> "QATTrainState":
        """StatAssist hand-off: end the FP warm-up phase."""
        return self.replace(opt_state=set_warmup(self.opt_state, False))


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    init_kwargs: Optional[dict] = None,
    ema_decay: float = 0.0,
) -> QATTrainState:
    # jit the whole init: flax's eager init dispatches hundreds of tiny
    # primitive compiles (slow fixed overhead per compile on CPU; wasteful on
    # TPU too) — one compiled program is ~8x faster and persistently cached.
    variables = jax.jit(
        lambda r, x: model.init(r, x, **(init_kwargs or {}))
    )(rng, sample_input)
    params = variables["params"]
    return QATTrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        quant=variables.get("quant", {}),
        opt_state=tx.init(params),
        rng=rng,
        # ema must be a COPY: jnp.asarray aliases the param buffers, and a
        # donated train step would then donate the same buffer twice (TPU
        # rejects with InvalidArgument).
        ema=jax.tree.map(lambda p: jnp.array(p, copy=True), params) if ema_decay > 0 else None,
        tx=tx,
    )


def make_train_step(
    model,
    mode: QuantMode,
    loss_fn: Optional[Callable] = None,
    num_classes: Optional[int] = None,
    label_smoothing: float = 0.0,
    ema_decay: float = 0.0,
    donate: bool = True,
    input_mean=None,
    input_std=None,
    remat: bool = False,
):
    """Jitted classification train step for one phase.

    ``loss_fn(outputs, batch) -> scalar`` overrides the default CE-on-labels.
    Metrics: loss, top1, top5 (reference train loop, helper_functions.py:99-163).

    ``remat`` wraps the forward in ``jax.checkpoint`` so the backward
    replays (parts of) it instead of storing residuals. Unlike flax
    ``nn.remat`` (whose lifted transform re-runs the mutable-collection
    updates in the replay, double-advancing observers/BN — measured round 2,
    CLAUDE.md), checkpoint over the *pure* apply keeps the mutation outputs
    primal-only. Values: False | True/'full' (save nothing) | 'conv_outs'
    (save conv outputs — QConvBNAct names them — and recompute only the
    elementwise BN/act/fake-quant chains).

    Measured on v5e (bs256/224 QAT bench): plain 3,020 img/s, 'full' 2,374,
    'conv_outs' 2,592 (replay bandwidth exceeds residual savings in this
    HBM-bound step; XLA's default residual choice is already good) — remat
    is a memory lever here, not a throughput one.
    """

    if loss_fn is None:
        def loss_fn(outputs, batch):
            return cross_entropy(outputs, batch["label"], label_smoothing=label_smoothing)

    mutable = ["batch_stats"] + (["quant"] if (mode.observe) else [])

    def step(state: QATTrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        image = _prep_image(batch["image"], input_mean, input_std)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats,
                         "quant": state.quant}
            outputs, updates = model.apply(
                variables, image, mode=mode, train=True,
                mutable=mutable, rngs={"dropout": dropout_rng})
            loss = loss_fn(outputs, batch)
            return loss, (outputs, updates)

        if remat == "conv_outs":
            compute_loss = jax.checkpoint(
                compute_loss,
                policy=jax.checkpoint_policies.save_only_these_names("conv_out"))
        elif remat:
            compute_loss = jax.checkpoint(compute_loss)

        (loss, (outputs, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        opt_updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, opt_updates)

        ema = state.ema
        if ema is not None and ema_decay > 0:
            ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                               ema, params)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            quant=updates.get("quant", state.quant),
            opt_state=opt_state,
            rng=rng,
            ema=ema,
        )
        metrics = {"loss": loss}
        if outputs.ndim == 2 and num_classes:
            top1, top5 = topk_accuracy(outputs, batch["label"], (1, min(5, num_classes)))
            metrics.update(top1=top1, top5=top5)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mode: QuantMode, num_classes: Optional[int] = None,
                   use_ema: bool = False, input_mean=None, input_std=None):
    """Jitted eval step -> metrics dict (reference val(),
    helper_functions.py:306-350). ``use_ema`` evaluates the EMA weights
    (the recipe validates EMA params). ``input_mean``/``input_std`` must match
    the stats the train step normalized uint8 batches with."""

    def step(state: QATTrainState, batch):
        variables = state.model_variables
        if use_ema and state.ema is not None:
            variables = {**variables, "params": state.ema}
        outputs = model.apply(
            variables, _prep_image(batch["image"], input_mean, input_std), mode=mode)
        loss = cross_entropy(outputs, batch["label"])
        metrics = {"loss": loss}
        if outputs.ndim == 2:
            top1, top5 = topk_accuracy(
                outputs, batch["label"], (1, min(5, num_classes or outputs.shape[-1])))
            metrics.update(top1=top1, top5=top5)
        return metrics

    return jax.jit(step)


def recalibrate(model, state: QATTrainState, batches, mode: QuantMode = QAT,
                rng: Optional[jax.Array] = None,
                input_mean=None, input_std=None) -> QATTrainState:
    """Re-estimate BN running stats + quant observers before eval/freeze.

    Runs forward passes in QAT-train mode without optimizer updates — the
    standard pre-convert calibration pass (the reference's 1-batch
    ``train_one_iter`` calibration, helper_functions.py:166-230, generalized
    to N batches). Stabilizes the folded-BN eval path when training was short
    or the LR was still high at the end.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    @jax.jit
    def calib(variables, image):
        _, upd = model.apply(variables, _prep_image(image, input_mean, input_std),
                             mode=mode,
                             train=True, mutable=["batch_stats", "quant"],
                             rngs={"dropout": rng})
        return upd

    batch_stats, quant = state.batch_stats, state.quant
    for batch in batches:
        upd = calib({"params": state.params, "batch_stats": batch_stats,
                     "quant": quant}, batch["image"])
        batch_stats = upd.get("batch_stats", batch_stats)
        quant = upd.get("quant", quant)
    return state.replace(batch_stats=batch_stats, quant=quant)

"""Checkpoint save/restore (reference per-task torch.save flows, SURVEY.md
§5.4) via orbax — atomic, async-capable, multi-host-aware.

Unlike the reference, QAT checkpoints need no prepare_qat-before-load dance
(Classification/evaluate.py:124-127): observer state is ordinary pytree state
saved with everything else.
"""
from __future__ import annotations

import os
from typing import Any

import flax.serialization
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any) -> None:
    """Save any train state / pytree at ``path`` (a directory).

    Static fields (e.g. the optax transform held by the state dataclass) are
    excluded via flax's state-dict view, so arbitrary flax.struct states
    (QATTrainState, GAN NetState, DetState, ...) all serialize uniformly.
    """
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, flax.serialization.to_state_dict(state), force=True)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template state).

    The whole state must match (optimizer chain included) — the RESUME path.
    Evaluators must use :func:`restore_model_variables` instead: they build
    their own (cheap, constant-lr) optimizer whose opt_state tree differs
    from the trainer's schedule chain, and a full-tree restore rejects that.
    """
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path, item=flax.serialization.to_state_dict(target))
    return flax.serialization.from_state_dict(target, tree)


_MODEL_KEYS = ("params", "batch_stats", "quant", "ema", "step")


def restore_model_variables(path: str, state: Any) -> Any:
    """Restore only the model variables (params/batch_stats/quant, plus
    ema/step when present) from a checkpoint into ``state``, ignoring
    optimizer and PRNG state.

    This is the evaluator/scorer load path: any trainer checkpoint of a
    compatible model loads regardless of which optimizer/schedule produced
    it (the reference's analogous flow is load_state_dict on the bare
    module, e.g. Classification/evaluate.py:127).
    """
    path = os.path.abspath(path)
    sd = flax.serialization.to_state_dict(state)
    want = {k: sd[k] for k in _MODEL_KEYS if sd.get(k) is not None}
    if not want:
        raise ValueError("state template has no model-variable branches")
    raw = ocp.PyTreeCheckpointer().restore(
        path, args=ocp.args.PyTreeRestore(
            item=want,
            restore_args=ocp.checkpoint_utils.construct_restore_args(want),
            partial_restore=True))
    sd.update(raw)
    return flax.serialization.from_state_dict(state, sd)

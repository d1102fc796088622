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
    """Restore into the structure of ``target`` (a template state)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path, item=flax.serialization.to_state_dict(target))
    return flax.serialization.from_state_dict(target, tree)

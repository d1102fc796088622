"""Serialized serving programs — the deployment artifact as a *program*.

The reference's deployment endpoint is a converted qnnpack module saved
with ``torch.save`` and reloaded for inference (Classification/
evaluate.py:140-143; Style_Transfer/test.py:69-71) — the artifact is a
state dict that still needs the model code to run. The TPU-native analog
goes one step further: serialize the frozen INT8 serving **program itself**
(StableHLO via ``jax.export``), weights baked in as literals, so a serving
process can run the model with *no frostnet_tpu code at all* — only a jax
runtime — on any of the platforms the artifact was exported for
(``cpu``/``tpu`` by default).

  * :func:`export_serving` traces ``freeze(model, variables)`` at a
    **symbolic batch size** (one artifact serves any batch; each concrete
    batch size backend-compiles once at call time) and writes the
    serialized program. Pass ``batch=N`` for a static-batch artifact.
  * :func:`load_serving` deserializes into a jitted ``fn(images)->logits``.

Size note: the program carries the weights as the f32 constants that feed
the (compile-time constant-folded) weight-quantization subgraph, so it is
~4x larger on disk than the int8 npz of :func:`~frostnet_tpu.quant.export.
export_int8` — ship the npz when size matters, the program when freedom
from model code matters.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .freeze import freeze


def export_serving(model, variables: Dict[str, Any], path: str, *,
                   image_size: int = 224, channels: int = 3,
                   batch: Optional[int] = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   **apply_kwargs) -> int:
    """Serialize the frozen INT8 program of ``model`` to ``path``.

    ``variables`` is a trained/calibrated tree (observers populated), as
    for :func:`~frostnet_tpu.quant.freeze.freeze`. Returns bytes written.
    """
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, channels),
                                jnp.float32)
    exported = jax_export.export(
        freeze(model, variables, **apply_kwargs),
        platforms=tuple(platforms))(spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return os.path.getsize(path)


def load_serving(path: str) -> Callable:
    """Deserialize an :func:`export_serving` artifact into a jitted fn.

    Needs only jax — no model registry, no variables tree. The returned
    callable maps ``(B, S, S, C) float32`` images to logits.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)

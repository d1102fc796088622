"""freeze — the torch.quantization.convert equivalent.

``freeze(model, variables)`` returns a jitted INT8 inference function whose
weight quantization (BN fold -> per-channel/tensor int8) is **constant-folded
by XLA** at compile time: the variables are closure constants, so the
integer weights, valid-tap sums and requant scales all become literals in
the executable — no per-call quantization work, exactly like a converted
qnnpack module graph (reference convert sites: Classification/evaluate.py:131,
Object_Detection/qeval_convert.py:445, Semantic_Segmentation/evaluate.py:237,
Style_Transfer/test.py:69-71).
"""
from __future__ import annotations

from typing import Callable

import jax


def freeze(model, variables, **apply_kwargs) -> Callable:
    """Return ``fn(x) -> logits`` running the frozen INT8 graph."""
    from ..nn.mode import INT8

    def fn(x):
        return model.apply(variables, x, mode=INT8, **apply_kwargs)

    return jax.jit(fn)

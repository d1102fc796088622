"""FLOPs / parameter counting.

Replaces the reference's forward-hook counters (Classification/utils/
flops_counter.py, flops_compute.py, Semantic_Segmentation/utilities/
utils.py:45-62) with XLA's own cost analysis — exact for the compiled
program, no per-layer hook bookkeeping.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def compute_flops(fn, *args, **kwargs) -> float:
    """FLOPs of jit(fn)(*args) from XLA cost analysis (multiply-adds count
    as 2 flops, matching the convention of the reference's counters)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns per-device list
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


def model_flops_params(model, input_shape=(1, 224, 224, 3), **apply_kwargs) -> Tuple[float, int]:
    """(flops, params) for one forward pass (reference
    `compute_flops`/`model_parameters`)."""
    x = jnp.zeros(input_shape, jnp.float32)
    variables = jax.eval_shape(lambda k, v: model.init(k, v), jax.random.PRNGKey(0), x)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    flops = compute_flops(lambda v, i: model.apply(v, i, **apply_kwargs), variables, x)
    return flops, count_params(variables["params"])

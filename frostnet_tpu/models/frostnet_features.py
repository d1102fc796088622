"""FrostNet multi-scale feature backbone + torch checkpoint interop.

Re-implements the API of reference frostnet_features.py: a detection/
segmentation backbone returning the [x1, x2, x3, x5] stage features
(:342-352), stage freezing (:354-359), and EMA-aware checkpoint loading with
'module.' prefix stripping (:10-35) — here extended to load the *reference's
own torch checkpoints* directly into the TPU model (OIHW->HWIO transposition
and BN buffer mapping), so users switching frameworks keep their weights.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import QuantMode
from ..quant import QConfig, QNNPACK
from .frostnet import FrostNet


class FrostNetFeatures(fnn.Module):
    """Backbone wrapper: returns [x1, x2, x3, x5] feature maps at strides
    4/8/16/32 (or dilated). ``frozen_stages`` stops gradients through the
    first N stages (reference _freeze_stages, frostnet_features.py:354-359).
    """

    mode: str = "large"
    width_mult: float = 1.0
    quantized: bool = False
    frozen_stages: int = -1
    output_stride: int = 32
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        feats = FrostNet(
            mode=self.mode, width_mult=self.width_mult, quantized=self.quantized,
            output_stride=self.output_stride, qconfig=self.qconfig,
            dtype=self.dtype, name="trunk",
        )(x, mode, train, features_only=True)
        if self.frozen_stages > 0:
            feats = [
                jax.lax.stop_gradient(f) if i < self.frozen_stages else f
                for i, f in enumerate(feats)
            ]
        return feats


# ---------------------------------------------------------------------------
# Torch checkpoint interop
# ---------------------------------------------------------------------------

_CONV_BLOCKS = ("squeeze_conv", "conv1", "conv2", "reduce_conv")


def _set(tree: Dict, path: List[str], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    # jnp.array (not asarray): on CPU jax can zero-copy a numpy view of torch
    # storage, and torch mutates BN running stats in place — the loaded
    # variables must own their buffers.
    node[path[-1]] = jnp.array(value)


def load_torch_frostnet_checkpoint(path_or_state, variables) -> Dict:
    """Load a reference FrostNet torch checkpoint into our variables dict.

    Accepts a file path (torch.load'able) or a state-dict. Handles the
    reference's loading conventions (frostnet_features.py:10-35): prefers the
    'state_dict_ema' entry when present, strips 'module.' prefixes, and maps
      <block>.conv.0.weight        -> params/<block>/kernel  (OIHW->HWIO)
      <block>.conv.1.{weight,bias} -> params/<block>/{scale,bias_bn}
      <block>.conv.1.running_*     -> batch_stats/<block>/{mean,var}
      classifier.2.{weight,bias}   -> params/classifier/{kernel,bias}
    Returns a new variables dict (params + batch_stats updated).
    """
    if isinstance(path_or_state, (str,)):
        import torch

        ckpt = torch.load(path_or_state, map_location="cpu")
    else:
        ckpt = path_or_state
    if isinstance(ckpt, dict) and "state_dict_ema" in ckpt:
        state = ckpt["state_dict_ema"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        state = ckpt["state_dict"]
    else:
        state = ckpt
    state = {re.sub(r"^module\.", "", k): np.asarray(getattr(v, "numpy", lambda: v)())
             for k, v in state.items()}

    params = jax.tree.map(lambda x: x, variables["params"])
    params = flax_to_mutable(params)
    batch_stats = flax_to_mutable(jax.tree.map(lambda x: x, variables.get("batch_stats", {})))

    def module_name(tkey: str) -> Optional[List[str]]:
        # layer3.2.conv2.conv.0.weight -> ["layer3_2", "conv2"]
        m = re.match(r"layer(\d)\.(\d+)\.(\w+)\.conv\.(\d)\.(.*)", tkey)
        if m:
            return [f"layer{m.group(1)}_{m.group(2)}", m.group(3)], int(m.group(4)), m.group(5)
        m = re.match(r"(conv1|last_layer)\.conv\.(\d)\.(.*)", tkey)
        if m:
            return [m.group(1)], int(m.group(2)), m.group(3)
        return None

    loaded = 0
    for tkey, val in state.items():
        if tkey.startswith("classifier."):
            if tkey.endswith("2.weight"):
                _set(params, ["classifier", "kernel"], val.transpose(2, 3, 1, 0))
                loaded += 1
            elif tkey.endswith("2.bias"):
                _set(params, ["classifier", "bias"], val)
                loaded += 1
            continue
        parsed = module_name(tkey)
        if parsed is None:
            continue
        blockpath, seq_idx, leaf = parsed
        if seq_idx == 0 and leaf == "weight":      # conv kernel
            _set(params, blockpath + ["kernel"], val.transpose(2, 3, 1, 0))
        elif seq_idx == 1 and leaf == "weight":    # BN gamma
            _set(params, blockpath + ["scale"], val)
        elif seq_idx == 1 and leaf == "bias":
            _set(params, blockpath + ["bias_bn"], val)
        elif leaf == "running_mean":
            _set(batch_stats, blockpath + ["mean"], val)
        elif leaf == "running_var":
            _set(batch_stats, blockpath + ["var"], val)
        else:
            continue
        loaded += 1

    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = batch_stats
    if loaded == 0:
        raise ValueError("no weights matched — is this a FrostNet checkpoint?")
    return out


def flax_to_mutable(tree):
    if isinstance(tree, dict):
        return {k: flax_to_mutable(v) for k, v in tree.items()}
    try:
        return {k: flax_to_mutable(v) for k, v in dict(tree).items()}
    except (TypeError, ValueError):
        return tree

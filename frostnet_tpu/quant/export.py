"""INT8 deployment artifact — save/load the converted model on disk.

The reference demonstrates its ~4x size win by ``torch.save``-ing the
converted qnnpack module's state dict and printing the file size
(Classification/evaluate.py:117-120,140-143). Here the same artifact is an
npz holding the variables tree with every observed conv/dense kernel stored
as **int8** (BN pre-folded), plus the observer state needed to requantize:

  * :func:`export_int8` folds BN into each observed kernel, quantizes it on
    the weight observer's grid, neutralizes the BN parameters (gamma=1,
    beta=folded bias, mean=0, var=1-eps) and writes one flat npz.
  * :func:`load_int8` restores a regular variables tree (dequantizing the
    int8 kernels back to their exact grid values), so ``freeze(model, vars)``
    / ``mode=INT8`` / ``mode=QAT_FROZEN`` all run unchanged and reproduce the
    exporting model's integer graph bit-for-bit — XLA re-quantizes the
    kernels at compile time to the same int8 literals.

The heavy arrays (conv kernels) are 1 byte/element on disk; everything else
(per-channel vectors, observer scalars) stays f32 — the ~4x artifact.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .folding import fold_bn
from .observer import ObserverState, calculate_qparams
from .fake_quant import quantize, dequantize
from .qtypes import QConfig, QNNPACK, FBGEMM

_QCONFIGS = {"qnnpack": QNNPACK, "fbgemm": FBGEMM}


def _channel_axis(w: np.ndarray, obs: ObserverState) -> Optional[int]:
    """Axis of ``w`` carrying the per-channel qparams, or None (per-tensor)."""
    if np.ndim(obs.min_val) == 0:
        return None
    n = obs.min_val.shape[0]
    for ax in range(w.ndim - 1, -1, -1):  # prefer trailing axes (HWIO / (I,F))
        if w.shape[ax] == n:
            return ax
    raise ValueError(f"no axis of {w.shape} matches per-channel size {n}")


def export_int8(variables: Dict[str, Any], path: str,
                qconfig: QConfig = QNNPACK, bn_eps: float = 1e-5) -> int:
    """Write the INT8 artifact at ``path`` (.npz). Returns bytes written.

    ``variables`` is a trained model's ``{'params', 'batch_stats', 'quant'}``
    (observers must be populated — run QAT or :func:`~frostnet_tpu.train.
    recalibrate` first).
    """
    def norm_obs(node):
        """Accept state-dict form ({'min_val','max_val'} dicts) observers."""
        if isinstance(node, dict):
            if set(node) == {"min_val", "max_val"}:
                return ObserverState(jnp.asarray(node["min_val"]),
                                     jnp.asarray(node["max_val"]))
            return {k: norm_obs(v) for k, v in node.items()}
        return node

    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    quant = norm_obs(variables.get("quant", {}))
    wspec = qconfig.weight
    out: Dict[str, np.ndarray] = {}

    def put(col: str, prefix: str, name: str, arr):
        out[f"{col}/{prefix}{name}"] = np.asarray(arr)

    def walk(p: Dict, bs: Dict, q: Dict, prefix: str):
        handled = set()
        if "kernel" in p and isinstance(q.get("w_obs"), ObserverState):
            w = np.asarray(p["kernel"], np.float32)
            obs = q["w_obs"]
            has_bn = ("scale" in p and "bias_bn" in p
                      and "mean" in bs and "var" in bs)
            if has_bn:
                wf, bf = fold_bn(jnp.asarray(w), p.get("bias"),
                                 p["scale"], p["bias_bn"],
                                 bs["mean"], bs["var"], bn_eps)
                wf = np.asarray(wf, np.float32)
            else:
                wf, bf = w, None
            ch = _channel_axis(wf, obs)
            scale, zp = calculate_qparams(obs, wspec)
            qw = np.asarray(quantize(jnp.asarray(wf), scale, zp, wspec, ch), np.int8)
            put("params", prefix, "kernel", qw)
            handled.add("kernel")
            if has_bn:
                f = p["bias_bn"].shape
                put("params", prefix, "scale", np.ones(f, np.float32))
                put("params", prefix, "bias_bn", np.asarray(bf, np.float32))
                put("batch_stats", prefix, "mean", np.zeros(f, np.float32))
                put("batch_stats", prefix, "var", np.full(f, 1.0 - bn_eps, np.float32))
                handled.update(("scale", "bias_bn"))
                if "bias" in p:  # folded into bias_bn
                    put("params", prefix, "bias", np.zeros_like(np.asarray(p["bias"])))
                    handled.add("bias")
        for k, v in p.items():
            if k in handled:
                continue
            if isinstance(v, dict):
                walk(v, bs.get(k, {}), q.get(k, {}), f"{prefix}{k}/")
            else:
                put("params", prefix, k, v)
        for k, v in bs.items():
            if isinstance(v, dict):
                continue  # handled by the recursion over params' structure
            if f"batch_stats/{prefix}{k}" not in out:
                put("batch_stats", prefix, k, v)

    def walk_quant(q: Dict, prefix: str):
        for k, v in q.items():
            if isinstance(v, ObserverState):
                put("quant", prefix, f"{k}.min_val", v.min_val)
                put("quant", prefix, f"{k}.max_val", v.max_val)
            elif isinstance(v, dict):
                walk_quant(v, f"{prefix}{k}/")
            else:
                put("quant", prefix, k, v)

    walk(params, batch_stats, quant, "")
    walk_quant(quant, "")
    out["__meta__"] = np.frombuffer(
        json.dumps({"qconfig": "fbgemm" if qconfig is FBGEMM else "qnnpack",
                    "bn_eps": bn_eps}).encode(), dtype=np.uint8)
    if not path.endswith(".npz"):
        path += ".npz"
    with open(path, "wb") as f:
        np.savez(f, **out)
    import os
    return os.path.getsize(path)


def load_int8(path: str, qconfig: Optional[QConfig] = None) -> Dict[str, Any]:
    """Load an :func:`export_int8` artifact back into a variables tree."""
    if not path.endswith(".npz"):
        path += ".npz"
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    qconfig = qconfig or _QCONFIGS.get(meta.get("qconfig", "qnnpack"), QNNPACK)
    wspec = qconfig.weight

    tree: Dict[str, Any] = {}
    for key in data.files:
        if key == "__meta__":
            continue
        col, rest = key.split("/", 1)
        node = tree.setdefault(col, {})
        parts = rest.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]

    # reassemble observers ('name.min_val'/'name.max_val' leaf pairs)
    def fix_quant(node: Dict) -> Dict:
        out = {}
        names = {k.split(".")[0] for k in node if isinstance(node[k], np.ndarray)
                 and "." in k}
        for n in sorted(names):
            out[n] = ObserverState(jnp.asarray(node[f"{n}.min_val"]),
                                   jnp.asarray(node[f"{n}.max_val"]))
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = fix_quant(v)
            elif "." not in k:
                out[k] = jnp.asarray(v)
        return out

    quant = fix_quant(tree.get("quant", {}))

    # dequantize int8 kernels on their observer grid
    def fix_params(p: Dict, q: Dict) -> Dict:
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = fix_params(v, q.get(k, {}))
            elif k == "kernel" and v.dtype == np.int8:
                obs = q["w_obs"]
                ch = _channel_axis(v, obs)
                scale, zp = calculate_qparams(obs, wspec)
                out[k] = dequantize(jnp.asarray(v, jnp.int32), scale, zp, ch)
            else:
                out[k] = jnp.asarray(v)
        return out

    params = fix_params(tree.get("params", {}), quant)
    bs = tree.get("batch_stats", {})

    def to_jnp(node):
        return {k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
                for k, v in node.items()}

    return {"params": params, "batch_stats": to_jnp(bs), "quant": quant}

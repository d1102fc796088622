"""Mesh + sharding helpers.

TPU-native replacement for the reference's single-host NCCL DataParallel
(Classification/train.py:89-92, Object_Detection/qtrainval.py:124-126) and
the criterion-parallel wrapper (Semantic_Segmentation/utilities/
parallel_wrapper.py:12-101):

  * one 2-D ``('dp', 'mp')`` mesh over all devices;
  * batches sharded over ``dp`` — the loss is shard-local by construction
    (exactly what DataParallelCriteria hand-rolled), and pjit inserts the
    gradient ``psum`` over ICI;
  * wide channel dims (the 1280-ch head) optionally sharded over ``mp``
    (tensor parallelism the reference never had but a pod wants).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same program spans hosts, allreduce riding ICI within a slice and DCN
across slices.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    mp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp','mp') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp}*{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def make_dp_mesh(batch_size: int, devices: Optional[Sequence] = None) -> Mesh:
    """A pure-dp mesh whose size evenly divides ``batch_size``.

    ``shard_batch`` needs the leading dim divisible by the dp axis; torch's
    DataParallel (which the reference GAN/detection trainers rely on)
    silently scatters over fewer GPUs when the batch is small. Same effect
    here: use the LARGEST divisor of the batch that fits the device count
    (gcd would be wrong — batch 6 on 8 devices must use 6, not gcd=2;
    batch_size=1 degrades to the single-device fast path instead of raising
    on the first batch).
    """
    devices = list(devices if devices is not None else jax.devices())
    b = max(int(batch_size), 1)
    dp = next(d for d in range(min(b, len(devices)), 0, -1) if b % d == 0)
    return make_mesh(dp=dp, devices=devices[:dp])


def _single_device(mesh: Mesh) -> bool:
    # On a 1-device mesh, NamedSharding buys nothing — and on the axon
    # platform, sharding-annotated single-chip programs execute ~1000x
    # slower (measured r1) — so fall back to plain placement.
    return mesh.size == 1


def shard_batch(batch, mesh: Mesh):
    """Place a host batch sharded along 'dp' on its leading axis."""
    if _single_device(mesh):
        return jax.tree.map(jax.device_put, batch)
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/optimizer state default)."""
    if _single_device(mesh):
        return jax.tree.map(jax.device_put, tree)
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# Tensor-parallel sharding rules: param-path regex -> PartitionSpec.
# Two Megatron-style pairs (shard the producer's out-channels, the
# consumer's in-channels; pjit inserts the psum after the consumer):
#   * head pair: 1280-ch last_layer -> classifier;
#   * block pattern: conv1 (1x1 expand, out-ch) -> conv2 (depthwise,
#     channel dim) -> reduce_conv (1x1 project, in-ch) — the widest tensors
#     in every CascadePreEx bottleneck (up to ~1.6k channels at width 1.25).
# GSPMD keeps the math layout-independent (per-channel BN stats stay
# shard-local; per-tensor observer min/max reduce globally); rules apply
# only where the dim divides the mp extent (guard below).
DEFAULT_MP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*last_layer.*kernel", P(None, None, None, "mp")),       # HWIO out-ch
    (r".*classifier.*kernel", P(None, None, "mp", None)),       # HWIO in-ch
    (r".*layer\d+_\d+/conv1/kernel", P(None, None, None, "mp")),
    (r".*layer\d+_\d+/conv2/kernel", P(None, None, None, "mp")),
    (r".*layer\d+_\d+/reduce_conv/kernel", P(None, None, "mp", None)),
)


def shard_params_for_mp(params, mesh: Mesh, rules=DEFAULT_MP_RULES):
    """Apply TP rules to a param pytree; everything else replicated."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    out = []
    for path, leaf in flat:
        pathstr = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = P()
        if mesh.shape.get("mp", 1) > 1:
            for pat, s in rules:
                if re.fullmatch(pat, pathstr):
                    # only shard when the dim divides evenly
                    dims = [d for d in s if d is not None]
                    axis = list(s).index("mp") if "mp" in s else None
                    if axis is not None and leaf.ndim > axis and leaf.shape[axis] % mesh.shape["mp"] == 0:
                        spec = s
                    del dims
                    break
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree.unflatten(treedef, out)


def cross_replica_mean(tree, axis_name: str = "dp"):
    """psum-mean for use inside shard_map'd code (BN stat sync etc.)."""
    n = jax.lax.psum(1, axis_name)
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name) / n, tree)

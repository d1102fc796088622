"""Scaling analysis: measured per-step collective traffic of the sharded step.

The reference scales by single-host DataParallel and never quantifies its
all-reduce cost (SURVEY.md §2.7). Here the dp/mp program is a single pjit
computation, so the communication the compiler actually inserted is visible
in the SPMD-partitioned HLO. This tool compiles the QAT train step on a
virtual N-device CPU mesh (identical partitioning decisions to TPU — GSPMD
runs before backend lowering), sums the bytes moved by every collective,
and applies a first-order v5e ICI model:

    ring all-reduce of V bytes over an axis of n chips:
        T = 2*V*(n-1)/n / W_ici
    with W_ici = 9e10 B/s per v5e link pair (45 GB/s/direction, both
    directions of the 1D ring used; jax-ml.github.io/scaling-book).

Gradient all-reduce traffic is independent of image size, so the default
probe uses small spatial dims to keep CPU compile time down; activation
collectives (mp > 1) do scale with spatial size — pass --image to probe.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_analysis.py --dp 8
    ... --dp 4 --mp 2     # tensor-parallel variant
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# result shapes of a collective instruction: "f32[32,1280]{1,0}" tokens in
# the type to the left of " = <opcode>(" (tuple results list several).
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(tok_dtype: str, tok_dims: str) -> int:
    if tok_dtype not in _DTYPE_BYTES:
        return 0  # token/opaque types
    n = 1
    for d in filter(None, tok_dims.split(",")):
        n *= int(d)
    return n * _DTYPE_BYTES[tok_dtype]


def collective_bytes(hlo_text: str) -> dict:
    """Sum result bytes per collective opcode over an HLO module text."""
    out = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in hlo_text.splitlines():
        for op in _COLLECTIVES:
            # match the opcode position " = <ty> <op>(" — not fusion names
            # like %fused_all_reduce or metadata op_name strings.
            m = re.search(r"= (.*?) " + re.escape(op) + r"(?:-start)?\(", line)
            if not m:
                continue
            nbytes = sum(_shape_bytes(d, s)
                         for d, s in _SHAPE_RE.findall(m.group(1)))
            out[op]["count"] += 1
            out[op]["bytes"] += nbytes
            break
    return out


def build_step(model_name: str, dp: int, mp: int, batch: int, image: int,
               num_classes: int):
    from frostnet_tpu.models import create_model
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
    from frostnet_tpu.parallel import (make_mesh, replicate, shard_batch,
                                       shard_params_for_mp)
    from frostnet_tpu.train import create_train_state, make_train_step

    mesh = make_mesh(dp=dp, mp=mp, devices=jax.devices()[:dp * mp])
    model = create_model(model_name, num_classes=num_classes)
    tx = get_optimizer("QSGD", 0.04, weight_decay=grouped_weight_decay(4e-5))
    sample = jnp.zeros((batch, image, image, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    state = state.replace(
        params=shard_params_for_mp(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        quant=replicate(state.quant, mesh),
        opt_state=replicate(state.opt_state, mesh),
    ).start_qat()
    batch_ = shard_batch(
        {"image": jnp.ones((batch, image, image, 3), jnp.float32),
         "label": jnp.zeros((batch,), jnp.int32)}, mesh)
    with mesh:
        step = make_train_step(model, QAT, num_classes=num_classes,
                               donate=False)
        compiled = step.lower(state, batch_).compile()
    return compiled, n_params


def build_seg_step(dp: int, batch: int, image: int):
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer
    from frostnet_tpu.parallel import make_mesh, replicate, shard_batch
    from frostnet_tpu.segmentation.models import get_seg_model
    from frostnet_tpu.segmentation.train import make_seg_train_step
    from frostnet_tpu.train.state import create_train_state

    mesh = make_mesh(dp=dp, devices=jax.devices()[:dp])
    model = get_seg_model("mobilenetv3_large", num_classes=19)
    state = create_train_state(
        model, get_optimizer("QSGD", 0.05), jax.random.PRNGKey(0),
        jnp.zeros((batch, image, image, 3), jnp.float32),
        init_kwargs={"mode": QAT, "train": True})
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    state = replicate(state, mesh).start_qat()
    batch_ = shard_batch(
        {"image": jnp.ones((batch, image, image, 3), jnp.float32),
         "label": jnp.zeros((batch, image, image), jnp.int32)}, mesh)
    with mesh:
        step = make_seg_train_step(model, QAT, None, 255, 19)
        compiled = step.lower(state, batch_).compile()
    return compiled, n_params


def build_det_step(dp: int, batch: int, image: int):
    from frostnet_tpu.detection.anchors import CONFIGS, make_priors
    from frostnet_tpu.detection.data import SyntheticDetection
    from frostnet_tpu.detection.models import build_ssd
    from frostnet_tpu.detection.train import DetState, make_det_train_step
    from frostnet_tpu.nn import QAT, QAT_FROZEN
    from frostnet_tpu.optim import get_optimizer
    from frostnet_tpu.parallel import make_mesh, replicate, shard_batch

    del image  # SSD300's priors fix the input size
    mesh = make_mesh(dp=dp, devices=jax.devices()[:dp])
    priors = jnp.asarray(make_priors(CONFIGS["voc"]))
    feat, head = build_ssd(num_classes=21)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, 300, 300, 3), jnp.float32)
    fv = jax.jit(lambda r, x: feat.init(r, x, mode=QAT, train=True))(rng, sample)
    sources = jax.eval_shape(lambda v, x: feat.apply(v, x, mode=QAT_FROZEN),
                             fv, sample)
    hv = jax.jit(lambda r, s: head.init(r, s, train=True))(
        rng, [jnp.zeros(s.shape, s.dtype) for s in sources])
    tx = get_optimizer("QSGD", 1e-3)
    state = DetState(
        step=jnp.zeros([], jnp.int32),
        feat_params=fv["params"], feat_batch_stats=fv.get("batch_stats", {}),
        feat_quant=fv.get("quant", {}),
        head_params=hv["params"], head_batch_stats=hv.get("batch_stats", {}),
        opt_state=tx.init((fv["params"], hv["params"])), rng=rng, tx=tx)
    n_params = sum(x.size for x in jax.tree.leaves(
        (fv["params"], hv["params"])))
    state = replicate(state, mesh)
    batch_ = shard_batch(next(iter(SyntheticDetection(20, 300, batch, batch, 0))),
                         mesh)
    with mesh:
        step = make_det_train_step(feat, head, QAT, priors, 21)
        compiled = step.lower(state, batch_).compile()
    return compiled, n_params


def build_gan_step(dp: int, batch: int, image: int):
    """The pix2pix G step (the quantized net the recipe GradBoosts)."""
    import numpy as np
    from frostnet_tpu.gan.models import make_net_state, make_pix2pix_steps
    from frostnet_tpu.gan.networks import define_d, define_g
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import adam, qadam
    from frostnet_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh(dp=dp, devices=jax.devices()[:dp])
    netG = define_g(netG="resnet_6blocks", quantized=True)
    netD = define_d(netD="basic")
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, image, image, 3), jnp.float32)
    g_state = make_net_state(netG, qadam(2e-4, b1=0.5), rng, sample,
                             init_kwargs={"mode": QAT, "train": True})
    d_state = make_net_state(netD, adam(2e-4, b1=0.5), rng,
                             jnp.concatenate([sample, sample], -1),
                             init_kwargs={"train": True})
    n_params = sum(x.size for x in jax.tree.leaves(g_state.params))
    g_state, d_state = replicate(g_state, mesh), replicate(d_state, mesh)
    rngnp = np.random.RandomState(0)
    batch_ = shard_batch(
        {"A": rngnp.randn(batch, image, image, 3).astype(np.float32),
         "B": rngnp.randn(batch, image, image, 3).astype(np.float32)}, mesh)
    with mesh:
        _, g_step = make_pix2pix_steps(netG, netD, QAT, "lsgan", 100.0)
        compiled = g_step.lower(g_state, d_state, batch_).compile()
    return compiled, n_params


# v5e constants (scaling book): 45 GB/s/direction per ICI link; a 1D ring
# all-reduce uses both directions -> 9e10 B/s algorithmic bandwidth.
W_ICI = 9.0e10


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workload", default="classification",
                   choices=["classification", "seg", "det", "gan"])
    p.add_argument("--model", default="frostnet_quant_large_1_0")
    p.add_argument("--dp", type=int, default=8)
    p.add_argument("--mp", type=int, default=1,
                   help="tensor parallel (classification only)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image", type=int, default=64)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--step_ms", type=float, default=None,
                   help="measured per-step compute ms (e.g. 85 for bs256 on "
                        "v5e) to turn traffic into a scaling-efficiency "
                        "estimate")
    args = p.parse_args(argv)

    n = args.dp * args.mp
    if len(jax.devices()) < n:
        sys.exit(f"need {n} virtual devices, have {len(jax.devices())} — set "
                 "XLA_FLAGS=--xla_force_host_platform_device_count=N")

    if args.workload == "classification":
        compiled, n_params = build_step(args.model, args.dp, args.mp,
                                        args.batch, args.image,
                                        args.num_classes)
    else:
        if args.mp != 1:
            sys.exit("--mp is classification-only")
        builder = {"seg": build_seg_step, "det": build_det_step,
                   "gan": build_gan_step}[args.workload]
        compiled, n_params = builder(args.dp, args.batch, args.image)
    stats = collective_bytes(compiled.as_text())
    total = sum(v["bytes"] for v in stats.values())
    grad_bytes = 4 * n_params

    # first-order ring model along the dp axis (mp collectives ride the
    # second torus axis concurrently; report them separately).
    ar = stats["all-reduce"]["bytes"]
    t_ar_ms = 2 * ar * (args.dp - 1) / max(args.dp, 1) / W_ICI * 1e3

    rec = {
        "workload": args.workload,
        "model": args.model if args.workload == "classification" else None,
        "dp": args.dp, "mp": args.mp,
        "batch": args.batch, "image": args.image, "n_params": n_params,
        "grad_bytes": grad_bytes,
        "collectives": {k: v for k, v in stats.items() if v["count"]},
        "total_collective_bytes": total,
        "allreduce_over_grad_ratio": round(ar / grad_bytes, 3) if grad_bytes else None,
        "v5e_ring_allreduce_ms": round(t_ar_ms, 3),
    }
    if args.step_ms:
        rec["dp_scaling_efficiency_est"] = round(
            args.step_ms / (args.step_ms + t_ar_ms), 4)
    print(json.dumps(rec, indent=2))
    return rec


if __name__ == "__main__":
    main()

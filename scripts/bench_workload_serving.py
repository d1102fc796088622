#!/usr/bin/env python
"""INT8-vs-FP32 serving throughput for the seg / GAN / detection workloads.

Extends scripts/bench_int8_serving.py (classification) to the other three
reference workloads, so the INT8-faster serving contract is checked on every
model family the reference quantizes, not just the classifier zoo:

  * seg — MobileNetV3-large+LR-ASPP at cityscapes half-res (512x1024)
  * gan — quantized ResnetGenerator (pix2pix netG) at 256x256
  * det — SSDLite-MBv2 feat+head at 300x300

Same methodology as the classification bench: chained device execution with
one host readback (`chain_time`, CLAUDE.md — block_until_ready does not wait
on this transport), bf16 compute for the float modes, best-of-3.

Run serially (one TPU process at a time):
    python scripts/bench_workload_serving.py --workloads seg,gan,det
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# this jax build ignores the env var (the axon plugin still wins) — mirror
# it into the config flag so JAX_PLATFORMS=cpu smoke runs work (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from frostnet_tpu.utils.profiling import chain_time  # noqa: E402


def build_seg(batch, dtype, image=None):
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.segmentation.models import get_seg_model

    model = get_seg_model("mobilenetv3_large", num_classes=19, dtype=dtype)
    h = image or 512
    x = jnp.zeros((batch, h, 2 * h, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)

    def fn_for(mode):
        return lambda inp: model.apply(variables, inp, mode=mode)
    return fn_for, x


def build_gan(batch, dtype, image=None):
    # netG serving is what gan/test.py ships; D never serves. dtype is set
    # model-wide via the generator's conv dtype default (float32 everywhere
    # in gan/networks.py), so the float modes run f32 here — matching how
    # the GAN trainer/tester actually run.
    del dtype
    from frostnet_tpu.gan.networks import define_g
    from frostnet_tpu.nn import QAT

    model = define_g(ngf=64, netG="resnet_9blocks", quantized=True)
    s = image or 256
    x = jnp.zeros((batch, s, s, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)

    def fn_for(mode):
        return lambda inp: model.apply(variables, inp, mode=mode)
    return fn_for, x


def build_det(batch, dtype, image=None):
    from frostnet_tpu.detection.models import build_ssd
    from frostnet_tpu.nn import QAT, QAT_FROZEN

    feat, head = build_ssd(num_classes=21, quantized=True, dtype=dtype)
    s = image or 300
    x = jnp.zeros((batch, s, s, 3), jnp.float32)
    k = jax.random.PRNGKey(0)
    feat_vars = jax.jit(lambda kk, i: feat.init(kk, i, mode=QAT, train=True))(k, x)
    sources = jax.eval_shape(
        lambda v, i: feat.apply(v, i, mode=QAT_FROZEN), feat_vars, x)
    head_vars = jax.jit(head.init)(k, jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), sources))

    def fn_for(mode):
        def fn(inp):
            srcs = feat.apply(feat_vars, inp, mode=mode)
            loc, conf = head.apply(head_vars, srcs)
            # reduce to one scalar so chain_time's mean feedback forces every
            # output element (loc AND conf) to be computed
            return (loc.astype(jnp.float32).sum()
                    + conf.astype(jnp.float32).sum())
        return fn
    return fn_for, x


BUILDERS = {"seg": (build_seg, 4), "gan": (build_gan, 16), "det": (build_det, 32)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workloads", default="seg,gan,det")
    p.add_argument("--modes", default="fp32,qat,int8")
    p.add_argument("--batch", type=int, default=None,
                   help="override the per-workload default batch")
    p.add_argument("--image", type=int, default=None,
                   help="override the per-workload input size (seg height; "
                        "width stays 2x)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cost", action="store_true")
    p.add_argument("--im2col", default="auto", choices=["auto", "on", "off"],
                   help="dense-k>1 INT8 im2col route (nn/conv.py): auto = "
                        "modeled-win gate, on/off force for A/Bs")
    p.add_argument("--im2col-margin", type=float, default=None,
                   help="auto-gate margin override (2.0 default; 1.0 also "
                        "engages 7x7x3 stems)")
    args = p.parse_args()

    if args.im2col != "auto":
        from frostnet_tpu.nn.conv import set_int8_dense_im2col
        set_int8_dense_im2col(args.im2col == "on")
    if args.im2col_margin is not None:
        from frostnet_tpu.nn.conv import set_im2col_gate_margin
        set_im2col_gate_margin(args.im2col_margin)

    from frostnet_tpu.nn import FP32, QAT_FROZEN, INT8
    mode_map = {"fp32": FP32, "qat": QAT_FROZEN, "int8": INT8}

    for wl in args.workloads.split(","):
        builder, default_batch = BUILDERS[wl]
        batch = args.batch or default_batch
        fn_for, x = builder(batch, jnp.bfloat16, args.image)
        print(f"== {wl} (batch {batch}, {tuple(x.shape[1:3])}) ==", flush=True)
        for name in args.modes.split(","):
            fn = fn_for(mode_map[name])
            if args.cost:
                cost = jax.jit(fn).lower(x).compile().cost_analysis()
                print(f"  {name}: flops/img="
                      f"{cost.get('flops', 0.0)/batch/1e6:.1f}M "
                      f"bytes/img="
                      f"{cost.get('bytes accessed', 0.0)/batch/1e6:.2f}MB",
                      flush=True)
            dt = chain_time(fn, x, steps=args.steps)
            print(f"  {name}: {batch/dt:,.1f} img/s  ({dt*1e3:.2f} ms/batch, "
                  f"best-of-3 chained)", flush=True)


if __name__ == "__main__":
    main()

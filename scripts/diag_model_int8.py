#!/usr/bin/env python
"""Per-model INT8-vs-FP32 compiled-HLO diagnostic (any zoo model, or the GAN G).

Round-4 follow-ups after the fuse-friendly int8 formulations:
  * the bs32 per-model latency sweep shows INT8 LOSING on mobilenet_v2
    (+193%) and shufflenet while resnet18/frostnet win — find what
    materializes per model;
  * GAN INT8 is only 1.31x FP32 (dense 3x3 convs keep the lax.conv s32
    path whose accumulator round-trips HBM at ~8 B/elem).

Prints XLA cost analysis + ENTRY-computation bytes written by opcode and
the largest single writes (same parser as diag_seg_int8.analyze).

    python scripts/diag_model_int8.py --model qmobilenet_v2_ReLU --batch 32 \
        --backend fbgemm --modes int8,fp32
    python scripts/diag_model_int8.py --model gan_generator --batch 16 --image 256
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
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from diag_seg_int8 import analyze  # noqa: E402  (ENTRY-write parser)


def build(args):
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.quant import get_qconfig

    qconfig = get_qconfig(args.backend)
    if args.model == "gan_generator":
        from frostnet_tpu.gan.networks import ResnetGenerator

        model = ResnetGenerator(ngf=args.ngf, n_blocks=6, qconfig=qconfig,
                                dtype=jnp.bfloat16)
        x = jnp.zeros((args.batch, args.image, args.image, 3), jnp.float32)
        apply_kw = {"train": False}
    else:
        from frostnet_tpu.models import create_model

        model = create_model(args.model, num_classes=1000, qconfig=qconfig,
                             dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
        x = jnp.zeros((args.batch, args.image, args.image, 3), jnp.float32)
        apply_kw = {}
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)
    return model, variables, x, apply_kw


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qmobilenet_v2_ReLU")
    p.add_argument("--modes", default="int8,fp32")
    p.add_argument("--backend", default="fbgemm",
                   help="qnnpack (per-tensor) | fbgemm (per-channel)")
    p.add_argument("--image", type=int, default=224)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--ngf", type=int, default=64, help="gan_generator width")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute dtype for the float modes")
    p.add_argument("--dump", default=None, help="write optimized HLO here")
    args = p.parse_args()

    from frostnet_tpu.nn import FP32, QAT_FROZEN, INT8

    mode_map = {"fp32": FP32, "qat": QAT_FROZEN, "int8": INT8}
    model, variables, x, apply_kw = build(args)

    for name in args.modes.split(","):
        mode = mode_map[name]
        fn = lambda inp: model.apply(variables, inp, mode=mode, **apply_kw)  # noqa: E731
        compiled = jax.jit(fn).lower(x).compile()
        cost = compiled.cost_analysis()
        print(f"== {args.model} {name} ({args.image}^2, batch {args.batch}, "
              f"{args.backend}) ==")
        print(f"  flops/img={cost.get('flops', 0)/args.batch/1e6:.1f}M  "
              f"bytes/img={cost.get('bytes accessed', 0)/args.batch/1e6:.2f}MB")
        txt = compiled.as_text()
        if args.dump:
            os.makedirs(args.dump, exist_ok=True)
            path = os.path.join(args.dump,
                                f"{args.model}_{name}_{args.image}.hlo.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"  optimized HLO -> {path} ({len(txt)/1e6:.1f} MB)")
        analyze(txt, args.batch)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""INT8-vs-FP32 serving throughput on the real chip (honest chained timing).

Measures the PARITY.md inference table (frostnet_large_1_0, bs128, 224px):
FP32(bf16) / QAT-sim / INT8 images-per-second with a device-side chain and
ONE host readback (block_until_ready does not wait on this transport — see
CLAUDE.md). Also dumps XLA cost analysis (flops/bytes) per mode so wins and
losses are attributable.

Run serially (one TPU process at a time):  python scripts/bench_int8_serving.py
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/bench_cache/jax")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


from frostnet_tpu.utils.profiling import chain_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="frostnet_quant_large_1_0")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image", type=int, default=224)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--modes", default="fp32,qat,int8",
                   help="comma list of fp32,qat,int8,fused (fused = "
                        "fuse_int8 Pallas block kernels in INT8 mode)")
    p.add_argument("--cost", action="store_true", help="print XLA cost analysis")
    p.add_argument("--check", action="store_true",
                   help="assert fused INT8 logits == unfused on the chip")
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

    from frostnet_tpu.models import create_model
    from frostnet_tpu.nn import FP32, QAT, QAT_FROZEN, INT8

    model = create_model(args.model, num_classes=1000, dtype=jnp.bfloat16)
    x = jnp.zeros((args.batch, args.image, args.image, 3), jnp.float32)
    # init with mode=QAT, train=True so every collection materializes
    # (the CLAUDE.md init invariant; QAT_FROZEN init happens to work today
    # but only because blocks declare observers unconditionally)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)

    fused_model = None
    if "fused" in args.modes or args.check:
        fused_model = create_model(args.model, num_classes=1000,
                                   dtype=jnp.bfloat16, fuse_int8=True)

    if args.check:
        import numpy as np
        xr = jax.random.normal(jax.random.PRNGKey(1),
                               (8, args.image, args.image, 3))
        want = np.asarray(jax.jit(
            lambda v, i: model.apply(v, i, mode=INT8))(variables, xr))
        got = np.asarray(jax.jit(
            lambda v, i: fused_model.apply(v, i, mode=INT8))(variables, xr))
        exact = bool((want == got).all())
        print(f"check: fused==unfused bit-exact: {exact} "
              f"(max |d|={np.abs(want - got).max():.3g})", flush=True)
        assert exact

    mode_map = {"fp32": FP32, "qat": QAT_FROZEN, "int8": INT8, "fused": INT8}
    for name in args.modes.split(","):
        mode = mode_map[name]
        m = fused_model if name == "fused" else model
        fn = lambda inp: m.apply(variables, inp, mode=mode)  # noqa: E731
        if args.cost:
            lowered = jax.jit(fn).lower(x)
            cost = lowered.compile().cost_analysis()
            flops = cost.get("flops", 0.0)
            bytes_ = cost.get("bytes accessed", 0.0)
            print(f"{name}: flops/img={flops/args.batch/1e6:.1f}M "
                  f"bytes/img={bytes_/args.batch/1e6:.2f}MB", flush=True)
        dt = chain_time(fn, x, steps=args.steps)
        print(f"{name}: {args.batch/dt:,.0f} img/s  ({dt*1e3:.2f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()

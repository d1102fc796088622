"""Input-pipeline stall measurement: does the QAT train step wait on data?

Builds a synthetic JPEG ImageFolder, then times the jitted QAT train step at
the bench batch size three ways on the real TPU:

  device-only   : one device-resident batch reused every step (upper bound)
  native loader : C++ JPEG pool (frostnet_tpu/native) -> prefetch_to_device
  python loader : PIL-thread FolderClassification -> prefetch_to_device

and reports images/sec plus the per-step input stall vs device-only.
This drives the DataLoader-worker-pool parity row (SURVEY.md §2.6; reference
Classification/train.py:108-114) end-to-end through the real trainer path.

Run: python scripts/bench_input_pipeline.py [--batch 256] [--steps 30]
"""
import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import numpy as np


def make_jpeg_folder(root: str, n_per_class: int = 400, classes: int = 2,
                     size: int = 256) -> str:
    from PIL import Image

    if os.path.exists(os.path.join(root, ".done")):
        return root
    rng = np.random.RandomState(0)
    for c in range(classes):
        cdir = os.path.join(root, f"class{c}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(n_per_class):
            arr = rng.randint(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(cdir, f"{i:05d}.jpg"),
                                      quality=85)
    open(os.path.join(root, ".done"), "w").close()
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--root", default="/tmp/frostnet_jpeg_bench")
    ap.add_argument("--model", default="frostnet_quant_large_1_0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from frostnet_tpu.data import FolderClassification, prefetch_to_device
    from frostnet_tpu.models import create_model
    from frostnet_tpu.native import NativeClassificationLoader
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
    from frostnet_tpu.train import create_train_state, make_train_step

    root = make_jpeg_folder(args.root)
    model = create_model(args.model, num_classes=1000, dtype=jnp.bfloat16)
    tx = get_optimizer("QSGD", 0.04, weight_decay=grouped_weight_decay(4e-5))
    sample = jnp.zeros((args.batch, args.image_size, args.image_size, 3),
                       jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    state = state.start_qat()
    step = make_train_step(model, QAT, num_classes=1000)

    dev_batch = {"image": jnp.ones_like(sample),
                 "label": jnp.zeros((args.batch,), jnp.int32)}
    state, _ = step(state, dev_batch)  # compile
    jax.block_until_ready(state.params)

    def run(batches, n):
        nonlocal state
        it = iter(batches)
        state, m = step(state, next(it))  # per-leg warm-up: compile for this
        float(m["loss"])                  # input signature (uint8 != f32)
        t0 = time.perf_counter()
        done = 0
        for batch in it:
            state, m = step(state, batch)
            done += 1
            if done >= n:
                break
        # honest timing: host readback of a value depending on the last step
        # (block_until_ready returns early on this host's transport)
        float(m["loss"])
        return args.batch * done / (time.perf_counter() - t0), done

    import itertools
    results = {}
    results["device_only"], _ = run(itertools.repeat(dev_batch), args.steps)

    def forever(make_iter):
        while True:
            yield from make_iter()

    native = NativeClassificationLoader.from_folder(
        root, batch_size=args.batch, image_size=args.image_size, train=True)
    results["native_loader"], _ = run(
        prefetch_to_device(forever(lambda: iter(native))), args.steps)

    # uint8 output: raw bytes over the host->device link (4x less traffic),
    # normalization fused into the jitted step
    native_u8 = NativeClassificationLoader.from_folder(
        root, batch_size=args.batch, image_size=args.image_size, train=True,
        output="uint8")
    results["native_loader_uint8"], _ = run(
        prefetch_to_device(forever(lambda: iter(native_u8))), args.steps)

    python_ds = FolderClassification(root, args.image_size, args.batch,
                                     train=True)
    results["python_loader"], _ = run(
        prefetch_to_device(forever(lambda: iter(python_ds))), args.steps)

    ms = {k: args.batch / v * 1000 for k, v in results.items()}
    report = {
        "batch": args.batch,
        "steps": args.steps,
        "images_per_sec": {k: round(v, 1) for k, v in results.items()},
        "step_ms": {k: round(v, 2) for k, v in ms.items()},
        "input_stall_ms_per_step": {
            "native": round(ms["native_loader"] - ms["device_only"], 2),
            "native_uint8": round(
                ms["native_loader_uint8"] - ms["device_only"], 2),
            "python": round(ms["python_loader"] - ms["device_only"], 2),
        },
        "native_vs_python_speedup": round(
            results["native_loader"] / results["python_loader"], 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

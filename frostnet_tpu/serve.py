"""Batched INT8 classification serving.

The deployment half the reference leaves implicit (it stops at saving the
converted state dict, Classification/evaluate.py:140-143): load an INT8
artifact written by ``--export_int8`` (or any trainer checkpoint), build the
jitted frozen-INT8 apply, and serve batched predictions with honest latency
reporting.

Timing notes (this matters on TPU):
  * per-request latency is measured WITH a host readback per batch — that is
    what a serving process observes (device->host sync included);
  * pipeline throughput is measured with device-chained batches and a single
    final readback — what a saturated server achieves with double buffering.

Run: python -m frostnet_tpu.serve --model frostnet_quant_large_1_0 \
       --artifact model_int8.npz --source synthetic --iters 20
     python -m frostnet_tpu.serve --model ... --checkpoint runs/cls/best \
       --source folder --data_dir ./val_images --output preds.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .nn import QAT
from .quant import freeze, load_int8


class Int8Predictor:
    """Jitted frozen-INT8 classifier over an artifact/checkpoint/program.

    ``program=`` serves a serialized StableHLO program written by
    :func:`~frostnet_tpu.quant.serialize.export_serving` — no model code
    or variables tree is loaded at all in that case.
    """

    _dp_devices = None  # class default so hand-built instances stay single-chip

    def __init__(self, model_name: str, num_classes: int = 1000,
                 artifact: Optional[str] = None,
                 checkpoint: Optional[str] = None,
                 program: Optional[str] = None,
                 image_size: int = 224, dtype=jnp.bfloat16, dp: int = 1):
        if sum(x is not None for x in (artifact, checkpoint, program)) != 1:
            raise ValueError(
                "pass exactly one of artifact= / checkpoint= / program=")
        self.image_size = image_size
        self.variables = None
        # dp>1: shard each request batch over the first `dp` chips — the
        # int8 closure constants replicate, XLA runs the frozen graph
        # shard-local with zero collectives (serving-at-scale path, tested
        # in test_int8_export.py::test_frozen_int8_serving_data_parallel).
        # The mesh is picked per request batch size (make_dp_mesh) so a
        # batch not divisible by dp shards over fewer chips instead of
        # crashing — the DataParallel small-batch behavior.
        if dp > 1:
            self._dp_devices = jax.devices()[:dp]
            self._dp_meshes = {}
        if program is not None:
            from .quant import load_serving

            self.model = None
            self._apply = load_serving(program)
            return
        from .models import create_model

        self.model = create_model(model_name, num_classes=num_classes,
                                  dtype=dtype)
        if artifact is not None:
            variables = load_int8(artifact)
        else:
            from .optim import get_optimizer
            from .train import create_train_state
            from .utils.checkpoint import restore_model_variables

            state = create_train_state(
                self.model, get_optimizer("SGD", 0.0), jax.random.PRNGKey(0),
                jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                init_kwargs={"mode": QAT, "train": True})
            variables = restore_model_variables(checkpoint, state).model_variables
        # freeze(): jit closure over the variables — weight quantization
        # constant-folds at compile time (torch.quantization.convert)
        self.variables = variables
        self._apply = freeze(self.model, variables)

    def export_program(self, path: str, batch: Optional[int] = None) -> int:
        """Write the serialized StableHLO serving program to ``path``."""
        from .quant import export_serving

        if self.variables is None:
            raise ValueError("predictor was built from a program artifact; "
                             "nothing to re-export")
        return export_serving(self.model, self.variables, path,
                              image_size=self.image_size, batch=batch)

    def __call__(self, images: np.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) float images -> (B, C) logits (device array)."""
        x = jnp.asarray(images)
        if self._dp_devices is not None:
            from .parallel import make_dp_mesh, shard_batch

            mesh = self._dp_meshes.get(len(x))
            if mesh is None:
                mesh = self._dp_meshes.setdefault(
                    len(x), make_dp_mesh(len(x), devices=self._dp_devices))
            x = shard_batch({"image": x}, mesh)["image"]
        return self._apply(x)

    def predict_topk(self, images: np.ndarray, k: int = 5):
        logits = np.asarray(self(images))
        idx = np.argsort(-logits, axis=-1)[:, :k]
        return idx, np.take_along_axis(logits, idx, axis=-1)


def _batches(args) -> Iterator[np.ndarray]:
    if args.source == "synthetic":
        rng = np.random.RandomState(0)
        while True:
            yield rng.randn(args.batch_size, args.image_size,
                            args.image_size, 3).astype(np.float32), None
    else:
        from .data import FolderClassification

        ds = FolderClassification(args.data_dir, args.image_size,
                                  args.batch_size, train=False)
        for batch in ds:
            yield batch["image"], batch["label"]


def main(args):
    pred = Int8Predictor(args.model, num_classes=args.num_classes,
                         artifact=args.artifact, checkpoint=args.checkpoint,
                         program=args.program, image_size=args.image_size,
                         dp=args.dp)
    if args.export_program:
        size = pred.export_program(args.export_program)
        print(f"[serve] serving program -> {args.export_program} "
              f"({size / 1e6:.2f} MB)")
    gen = _batches(args)
    first, _ = next(gen)
    np.asarray(pred(first))  # compile

    # per-request latency: readback every batch (the server-visible number)
    lat = []
    for i in range(args.iters):
        x, _ = next(gen)
        t0 = time.perf_counter()
        np.asarray(pred(x))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1000

    # pipeline throughput: chain on device, one readback
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(args.iters):
        x, _ = next(gen)
        acc = pred(x + acc * 0).astype(jnp.float32).sum() * 1e-30
    float(acc)
    pipeline_ips = args.batch_size * args.iters / (time.perf_counter() - t0)

    report = {
        "model": f"program:{args.program}" if args.program else args.model,
        "batch_size": args.batch_size,
        "iters": args.iters,
        "latency_ms": {"p50": round(float(np.percentile(lat_ms, 50)), 2),
                       "p95": round(float(np.percentile(lat_ms, 95)), 2),
                       "max": round(float(lat_ms[-1]), 2)},
        "request_images_per_sec": round(
            args.batch_size / float(np.mean(lat_ms)) * 1000, 1),
        "pipeline_images_per_sec": round(pipeline_ips, 1),
    }
    print(json.dumps(report, indent=2))

    if args.output:
        with open(args.output, "w") as f:
            for i in range(args.predict_batches):
                x, labels = next(gen)
                idx, scores = pred.predict_topk(x, k=args.topk)
                for b in range(len(idx)):
                    rec = {"topk": idx[b].tolist(),
                           "scores": [round(float(s), 4) for s in scores[b]]}
                    if labels is not None:
                        rec["label"] = int(labels[b])
                    f.write(json.dumps(rec) + "\n")
        print(f"[serve] predictions -> {args.output}")
    return report


def cli():
    from .utils.platform import pin_platform_from_env

    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="frostnet_quant_large_1_0")
    p.add_argument("--artifact", default=None, help="export_int8 .npz")
    p.add_argument("--checkpoint", default=None, help="trainer checkpoint dir")
    p.add_argument("--program", default=None,
                   help="serialized StableHLO serving program "
                        "(quant.export_serving); runs without model code")
    p.add_argument("--export_program", default=None,
                   help="also write the serialized serving program here")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each request batch over this many chips")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--source", choices=("synthetic", "folder"),
                   default="synthetic")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--output", default=None, help="write top-k jsonl here")
    p.add_argument("--predict_batches", type=int, default=4)
    p.add_argument("--topk", type=int, default=5)
    main(p.parse_args())


if __name__ == "__main__":
    cli()

"""Batched INT8 serving for every quantized workload.

The deployment half the reference leaves implicit (it stops at saving the
converted state dict per workload: Classification/evaluate.py:140-143,
Object_Detection/qeval_convert.py:406-473, Style_Transfer/test.py:66-84):
load an INT8 artifact written by ``--export_int8`` (or a trainer
checkpoint / serialized program for classification), build the jitted
frozen-INT8 apply, and serve batched predictions with honest latency
reporting.

``--workload`` selects the model family:
  * ``cls`` (default) — classifier logits; top-k jsonl output.
  * ``seg`` — per-pixel class maps; cityscapes-palette PNG output.
  * ``det`` — SSD feat+head (artifact base path + ``_feat``/``_head``);
    decode+NMS detections jsonl output.
  * ``gan`` — pix2pix/cyclegan netG; generated-image PNG output.

Timing notes (this matters on TPU):
  * per-request latency is measured WITH a host readback per batch — that is
    what a serving process observes (device->host sync included);
  * pipeline throughput is measured with device-chained batches and a single
    final readback — what a saturated server achieves with double buffering.

Run: python -m frostnet_tpu.serve --model frostnet_quant_large_1_0 \
       --artifact model_int8.npz --source synthetic --iters 20
     python -m frostnet_tpu.serve --workload seg --model mobilenetv3_large \
       --artifact seg_int8.npz --num_classes 19 --image_size 512
     python -m frostnet_tpu.serve --workload det --model qssd --artifact det_int8
     python -m frostnet_tpu.serve --workload gan --artifact netg_int8.npz \
       --output fakes/
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

_CLS_DEFAULT = "frostnet_quant_large_1_0"


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
            x = _shard_dp(x, self._dp_devices, self._dp_meshes)
        return self._apply(x)

    def predict_topk(self, images: np.ndarray, k: int = 5):
        logits = np.asarray(self(images))
        idx = np.argsort(-logits, axis=-1)[:, :k]
        return idx, np.take_along_axis(logits, idx, axis=-1)


def _shard_dp(x: jnp.ndarray, devices, meshes: dict) -> jnp.ndarray:
    """Shard one request batch over `devices`, caching meshes by batch size
    (non-divisible batches degrade to the largest divisor — the
    DataParallel small-batch scatter behavior)."""
    from .parallel import make_dp_mesh, shard_batch

    mesh = meshes.get(len(x))
    if mesh is None:
        mesh = meshes.setdefault(len(x), make_dp_mesh(len(x), devices=devices))
    return shard_batch({"image": x}, mesh)["image"]


class FrozenPredictor:
    """Frozen-INT8 serving wrapper for the non-classifier workloads.

    Shares the dp-sharding behavior of :class:`Int8Predictor` (request
    batches shard over chips, non-divisible batches degrade to the largest
    divisor) but takes any prebuilt apply function, so one class covers the
    seg map head, the det feat+head pair, and the GAN generator.
    """

    def __init__(self, apply_fn, dp: int = 1):
        self._apply = apply_fn
        self._dp_devices = jax.devices()[:dp] if dp > 1 else None
        self._dp_meshes = {}

    def __call__(self, images: np.ndarray):
        x = jnp.asarray(images)
        if self._dp_devices is not None:
            x = _shard_dp(x, self._dp_devices, self._dp_meshes)
        return self._apply(x)


def _variables_from(args):
    """Load the exported INT8 variables tree for a non-cls workload."""
    if not args.artifact:
        raise SystemExit(
            f"--workload {args.workload} serves --export_int8 artifacts; "
            "pass --artifact (see the workload evaluator CLIs)")
    return load_int8(args.artifact)


def _build_seg(args):
    """MBv3/MBv2/ESPNet seg serving: frozen INT8 class maps + palette PNGs
    (the flow Semantic_Segmentation/latency_check.py:222 times and
    evaluate.py renders)."""
    from .segmentation.models import get_seg_model

    name = args.model if args.model != _CLS_DEFAULT else "mobilenetv3_large"
    model = get_seg_model(name, num_classes=args.num_classes,
                          dtype=jnp.bfloat16)
    apply_fn = freeze(model, _variables_from(args))
    width = args.image_width or 2 * args.image_size  # cityscapes 2:1 default
    shape = (args.batch_size, args.image_size, width, 3)

    def postprocess(outdir, x, out, start):
        from PIL import Image

        from .segmentation.evaluate import colorize

        os.makedirs(outdir, exist_ok=True)
        pred = np.asarray(jnp.argmax(out, axis=-1)).astype(np.uint8)
        for i in range(len(pred)):
            Image.fromarray(colorize(pred[i])).save(
                os.path.join(outdir, f"pred_{start + i:05d}.png"))
    return apply_fn, shape, postprocess


def _build_det(args):
    """SSD/TDSOD serving: frozen INT8 feat -> float head -> decode+NMS
    (qeval_convert.py:406-473's converted test path, as one server)."""
    from .detection.anchors import make_priors
    from .detection.models import build_ssd
    from .detection.nms import detect
    from .detection.tdsod import build_tdsod
    from .detection.train import select_config
    from .nn import INT8

    if args.model == _CLS_DEFAULT:
        net_type = "qssd"
    elif args.model in ("qssd", "qtdsod"):
        net_type = args.model
    else:
        raise SystemExit(f"--workload det serves qssd|qtdsod, got "
                         f"--model {args.model!r}")
    det_cfg = select_config(net_type, args.dataset)
    priors = jnp.asarray(make_priors(det_cfg))
    num_classes = (args.num_classes if args.num_classes != 1000
                   else det_cfg["num_classes"])
    build = build_tdsod if net_type == "qtdsod" else build_ssd
    feat, head = build(num_classes=num_classes)
    if not args.artifact:
        raise SystemExit("--workload det needs --artifact BASE "
                         "(loads BASE_feat.npz + BASE_head.npz, as written "
                         "by qeval --export_int8)")
    base = args.artifact[:-4] if args.artifact.endswith(".npz") else args.artifact
    feat_vars = load_int8(base + "_feat.npz")
    head_vars = load_int8(base + "_head.npz")

    @jax.jit
    def apply_fn(x):
        srcs = feat.apply(feat_vars, x, mode=INT8)
        return head.apply(head_vars, srcs)
    # the SSD priors/heads are built for the config's input size (300) —
    # an --image_size override would desync prior and box counts
    size = args.image_size or det_cfg["min_dim"]
    if size != det_cfg["min_dim"]:
        raise SystemExit(f"--workload det runs at the net config's input "
                         f"size {det_cfg['min_dim']}, got --image_size {size}")
    args.image_size = size  # folder-source loaders read it back
    shape = (args.batch_size, size, size, 3)

    def postprocess(outpath, x, out, start):
        loc, conf = out
        dets = np.asarray(detect(loc, jax.nn.softmax(conf, axis=-1), priors,
                                 conf_thresh=0.25, top_k=50))
        # truncate on the first batch so re-runs don't accumulate records
        with open(outpath, "w" if start == 0 else "a") as f:
            for b in range(len(dets)):
                hits = []
                for c in range(1, dets.shape[1]):
                    for s, x1, y1, x2, y2 in dets[b, c]:
                        if s > 0:
                            hits.append({"class": int(c), "score": round(float(s), 4),
                                         "box": [round(float(v), 4)
                                                 for v in (x1, y1, x2, y2)]})
                f.write(json.dumps({"image": start + b, "detections": hits}) + "\n")
    return apply_fn, shape, postprocess


def _build_gan(args):
    """netG serving: frozen INT8 generator + PNG gallery writes (the
    Style_Transfer/test.py:66-84 converted-inference flow)."""
    from .gan.networks import define_g

    # substitute the default only when --model was left at the cls default;
    # anything else goes to define_g verbatim so typos fail loudly there
    net_g = "resnet_9blocks" if args.model == _CLS_DEFAULT else args.model
    model = define_g(ngf=args.ngf, netG=net_g, quantized=True)
    apply_fn = freeze(model, _variables_from(args))
    size = args.image_size or 256
    shape = (args.batch_size, size, size, 3)

    def postprocess(outdir, x, out, start):
        from PIL import Image

        from .gan.visualizer import tensor2im

        os.makedirs(outdir, exist_ok=True)
        fake = np.asarray(out)
        for i in range(len(fake)):
            Image.fromarray(tensor2im(fake[i])).save(
                os.path.join(outdir, f"fake_{start + i:05d}.png"))
    return apply_fn, shape, postprocess


_WORKLOAD_BUILDERS = {"seg": _build_seg, "det": _build_det, "gan": _build_gan}


def _tree_scalar(out) -> jnp.ndarray:
    """Collapse any output pytree to one f32 scalar (forces full compute
    when chaining batches on device)."""
    leaves = jax.tree.leaves(out)
    return sum(x.astype(jnp.float32).sum() for x in leaves)


def _list_folder_images(root: str) -> list:
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    paths = []
    for dirpath, _, files in os.walk(root):
        paths.extend(os.path.join(dirpath, f) for f in files
                     if f.lower().endswith(exts))
    if not paths:
        raise SystemExit(f"no images under {root}")
    return sorted(paths)


def _folder_batches(args, shape) -> Iterator[np.ndarray]:
    """--source folder for the non-cls workloads, with each workload's OWN
    eval preprocessing (feeding classifier-normalized tensors would silently
    serve garbage): seg /255 then imagenet mean/std (segmentation/data.py:57),
    det RGB->BGR minus the SSD BGR means (detection/data.py:165,
    BaseTransform), gan bicubic resize then [-1,1] (gan/data.py:43-46, the
    test-time protocol). Cycles the folder so --iters never underruns."""
    from PIL import Image

    from .data.datasets import IMAGENET_MEAN, IMAGENET_STD
    from .detection.data import MEANS

    _, h, w, _ = shape
    paths = _list_folder_images(args.data_dir)
    resample = Image.BICUBIC if args.workload == "gan" else Image.BILINEAR
    i = 0
    while True:
        imgs = []
        for _ in range(args.batch_size):
            img = Image.open(paths[i % len(paths)]).convert("RGB")
            i += 1
            arr = np.asarray(img.resize((w, h), resample), np.float32)
            if args.workload == "seg":
                arr = ((arr / 255.0 - np.asarray(IMAGENET_MEAN, np.float32))
                       / np.asarray(IMAGENET_STD, np.float32))
            elif args.workload == "det":
                arr = arr[..., ::-1] - np.asarray(MEANS, np.float32)
            else:  # gan
                arr = arr / 255.0 * 2.0 - 1.0
            imgs.append(arr)
        yield np.stack(imgs), None


def _batches(args) -> Iterator[np.ndarray]:
    if args.source == "synthetic":
        rng = np.random.RandomState(0)
        shape = getattr(args, "_input_shape",
                        (args.batch_size, args.image_size, args.image_size, 3))
        while True:
            yield rng.randn(*shape).astype(np.float32), None
    elif args.workload != "cls":
        yield from _folder_batches(args, args._input_shape)
    else:
        from .data import FolderClassification

        ds = FolderClassification(args.data_dir, args.image_size,
                                  args.batch_size, train=False)
        for batch in ds:
            yield batch["image"], batch["label"]


def main(args):
    if args.image_size is None and args.workload != "det":
        args.image_size = {"cls": 224, "seg": 512, "gan": 256}[args.workload]
    postprocess = None
    if args.workload == "cls":
        pred = Int8Predictor(args.model, num_classes=args.num_classes,
                             artifact=args.artifact, checkpoint=args.checkpoint,
                             program=args.program, image_size=args.image_size,
                             dp=args.dp)
        if args.export_program:
            size = pred.export_program(args.export_program)
            print(f"[serve] serving program -> {args.export_program} "
                  f"({size / 1e6:.2f} MB)")
    else:
        if args.program or args.export_program or args.checkpoint:
            raise SystemExit("--program/--export_program/--checkpoint are "
                             "classification-only; other workloads serve "
                             "--export_int8 artifacts")
        apply_fn, shape, postprocess = _WORKLOAD_BUILDERS[args.workload](args)
        args._input_shape = shape
        pred = FrozenPredictor(apply_fn, dp=args.dp)
    gen = _batches(args)
    first, _ = next(gen)
    jax.device_get(pred(first))  # compile

    # per-request latency: readback every batch (the server-visible number)
    lat = []
    for i in range(args.iters):
        x, _ = next(gen)
        t0 = time.perf_counter()
        jax.device_get(pred(x))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.sort(np.asarray(lat)) * 1000

    # pipeline throughput: chain on device, one readback
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(args.iters):
        x, _ = next(gen)
        acc = _tree_scalar(pred(x + acc * 0)) * 1e-30
    float(acc)
    pipeline_ips = args.batch_size * args.iters / (time.perf_counter() - t0)

    report = {
        "workload": args.workload,
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

    if args.output and args.workload == "cls":
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
    elif args.output:
        # double-buffered batch prediction: JAX dispatch is async, so kicking
        # off batch i+1 BEFORE postprocessing batch i overlaps the host-side
        # PNG/jsonl encoding with the device forward of the next batch
        pending = None
        for i in range(args.predict_batches):
            x, _ = next(gen)
            out = pred(x)
            if pending is not None:
                postprocess(args.output, *pending)
            pending = (x, out, i * args.batch_size)
        if pending is not None:
            postprocess(args.output, *pending)
        print(f"[serve] predictions -> {args.output}")
    return report


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workload", choices=("cls", "seg", "det", "gan"),
                   default="cls")
    p.add_argument("--model", default=_CLS_DEFAULT,
                   help="cls: classifier registry name; seg: seg model name; "
                        "det: qssd|qtdsod; gan: resnet_9blocks|resnet_6blocks")
    p.add_argument("--artifact", default=None, help="export_int8 .npz")
    p.add_argument("--checkpoint", default=None, help="trainer checkpoint dir")
    p.add_argument("--program", default=None,
                   help="serialized StableHLO serving program "
                        "(quant.export_serving); runs without model code")
    p.add_argument("--export_program", default=None,
                   help="also write the serialized serving program here")
    p.add_argument("--num_classes", type=int, default=1000,
                   help="seg: 19 cityscapes; det: defaults from the net config")
    p.add_argument("--dataset", choices=("voc", "coco"), default="voc",
                   help="det only: anchor/class config the artifact was "
                        "trained against")
    p.add_argument("--image_size", type=int, default=None,
                   help="input size; defaults per workload (cls 224, "
                        "seg 512 [the image HEIGHT, width defaults to 2x], "
                        "gan 256, det fixed by the net config)")
    p.add_argument("--image_width", type=int, default=None,
                   help="seg only: override the 2:1 cityscapes aspect")
    p.add_argument("--ngf", type=int, default=64, help="gan generator width")
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
    return p


def cli():
    from .utils.platform import pin_platform_from_env

    pin_platform_from_env()
    main(build_parser().parse_args())


if __name__ == "__main__":
    cli()

"""Score pix2pix/cyclegan cityscapes outputs with a segmentation network.

TPU-native equivalent of the reference's eval_cityscapes flow
(Style_Transfer/scripts/eval_cityscapes/evaluate.py + util.py): run a
segmentation scorer over the generated ``*_leftImg8bit.png`` images, build a
confusion histogram against the ground-truth labels, and report mean pixel
accuracy / mean class accuracy / mean class IoU (the "FCN-score" protocol).

The reference scores with a FIXED pretrained Caffe FCN-8s
(fcn-8s-cityscapes.caffemodel, downloaded by download_fcn8s.sh); this host
has no network egress and no Caffe, so the scorer here is any trained model
from our segmentation zoo (``--scorer_model`` + ``--scorer_checkpoint``,
e.g. an espnetv2/mobilenetv3 seg checkpoint trained with
frostnet_tpu.segmentation.train). The histogram/score formulas match
util.py:23-45 exactly (oracle-tested against that file).

Run: python -m frostnet_tpu.gan.eval_cityscapes --result_dir results/ \
       --label_dir cityscapes/gtFine/val --scorer_model espnetv2_seg \
       --scorer_checkpoint runs/segmentation/best --output_dir eval/
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Confusion histogram (reference util.py:23-29): rows = GT, cols = pred;
    GT entries outside [0, n) are ignored."""
    k = np.where((a >= 0) & (a < n))[0]
    if np.any(b[k] >= n) or np.any(b[k] < 0):
        # A scorer emitting labels outside [0, n) means --num_classes does
        # not match the scorer checkpoint; silently dropping frames would
        # print near-zero FCN scores with no hint why.
        raise ValueError(
            f"prediction labels outside [0, {n}): scorer emits up to "
            f"{int(b[k].max())} — pass --num_classes matching the scorer "
            "checkpoint")
    bc = np.bincount(n * a[k].astype(int) + b[k], minlength=n ** 2)
    return bc.reshape(n, n)


def get_scores(hist: np.ndarray):
    """(mean_pixel_acc, mean_class_acc, mean_class_iou, per_class_acc,
    per_class_iou) — reference util.py:32-45."""
    acc = np.diag(hist).sum() / (hist.sum() + 1e-12)
    cl_acc = np.diag(hist) / (hist.sum(1) + 1e-12)
    iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist) + 1e-12)
    return acc, np.nanmean(cl_acc), np.nanmean(iu), cl_acc, iu


def score_pairs(
    predict_fn,
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
) -> Dict:
    """Accumulate the per-frame confusion histogram over (image, label)
    pairs and return the score dict. ``predict_fn(image_f01) -> (H, W) int``
    must segment an image given in [0, 1] RGB at the label's resolution."""
    hist = np.zeros((num_classes, num_classes), np.int64)
    n = 0
    for image, label in pairs:
        pred = np.asarray(predict_fn(image))
        hist += fast_hist(label.flatten(), pred.flatten(), num_classes)
        n += 1
    acc, macc, miou, cl_acc, cl_iou = get_scores(hist)
    return {
        "frames": n,
        "mean_pixel_acc": float(acc),
        "mean_class_acc": float(macc),
        "mean_class_iou": float(miou),
        "per_class_acc": cl_acc,
        "per_class_iou": cl_iou,
        "hist": hist,
    }


def make_seg_predict_fn(model, variables, mode, mean, std):
    """Jitted scorer forward: [0,1] RGB -> argmax class map."""

    @jax.jit
    def forward(img):
        x = (img - jnp.asarray(mean)) / jnp.asarray(std)
        logits = model.apply(variables, x[None], mode=mode)
        return jnp.argmax(logits[0], axis=-1).astype(jnp.int32)

    return forward


def _iter_result_pairs(result_dir: str, label_dir: str, num_classes: int):
    """Yield (generated image [0,1] f32 at label size, label int map)."""
    from PIL import Image

    names = sorted(f for f in os.listdir(result_dir)
                   if f.endswith("_leftImg8bit.png"))
    if not names:
        raise FileNotFoundError(
            f"no *_leftImg8bit.png under {result_dir} (pix2pix test output)")
    for fname in names:
        base = fname[: -len("_leftImg8bit.png")]
        lpath = os.path.join(label_dir, base + "_gtFine_labelTrainIds.png")
        if not os.path.exists(lpath):
            continue
        label = np.asarray(Image.open(lpath), np.int64)
        img = Image.open(os.path.join(result_dir, fname)).convert("RGB")
        img = img.resize((label.shape[1], label.shape[0]), Image.BILINEAR)
        yield np.asarray(img, np.float32) / 255.0, label


def main(args):
    from ..nn import QAT, QAT_FROZEN
    from ..optim import get_optimizer
    from ..segmentation import get_seg_model
    from ..train import create_train_state
    from ..utils.checkpoint import restore_model_variables

    model = get_seg_model(args.scorer_model, num_classes=args.num_classes)
    sample = jnp.zeros((1, args.init_size, args.init_size, 3), jnp.float32)
    state = create_train_state(model, get_optimizer("QSGD", 1e-3),
                               jax.random.PRNGKey(0), sample,
                               init_kwargs={"mode": QAT, "train": True})
    state = restore_model_variables(args.scorer_checkpoint, state)
    predict = make_seg_predict_fn(
        model, state.model_variables, QAT_FROZEN,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))

    scores = score_pairs(
        predict, _iter_result_pairs(args.result_dir, args.label_dir,
                                    args.num_classes), args.num_classes)

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "evaluation_results.txt")
    with open(out, "w") as f:
        f.write("Mean pixel accuracy: %f\n" % scores["mean_pixel_acc"])
        f.write("Mean class accuracy: %f\n" % scores["mean_class_acc"])
        f.write("Mean class IoU: %f\n" % scores["mean_class_iou"])
        for i, (a, u) in enumerate(zip(scores["per_class_acc"],
                                       scores["per_class_iou"])):
            f.write("class %d: acc = %f, iou = %f\n" % (i, a, u))
    print(f"[eval_cityscapes] {scores['frames']} frames -> {out}")
    print(f"  mean pixel acc {scores['mean_pixel_acc']:.4f}  "
          f"mean class acc {scores['mean_class_acc']:.4f}  "
          f"mean class IoU {scores['mean_class_iou']:.4f}")
    return scores


def cli():
    from ..utils.platform import pin_platform_from_env

    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--result_dir", required=True,
                   help="generated *_leftImg8bit.png images (pix2pix test)")
    p.add_argument("--label_dir", required=True,
                   help="matching *_gtFine_labelTrainIds.png ground truth")
    p.add_argument("--output_dir", default="./eval_cityscapes")
    p.add_argument("--scorer_model", default="espnetv2_seg")
    p.add_argument("--scorer_checkpoint", required=True)
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--init_size", type=int, default=256)
    main(p.parse_args())


if __name__ == "__main__":
    cli()

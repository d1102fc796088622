"""Segmentation evaluator: dual QAT-sim / INT8 mIoU + colorized PNG dumps.

Re-implements Semantic_Segmentation/evaluate.py: 1-batch calibration, load
weights, mIoU in fake-quant mode, mIoU in frozen INT8 mode, and colorized
prediction PNGs using the cityscapes palette (+relabel to the original
label ids, :19-46).

Run: python -m frostnet_tpu.segmentation.evaluate --model mobilenetv3_RE_small \
       --dataset synthetic --save_images /tmp/seg_vis
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import QAT, QAT_FROZEN, INT8
from ..optim import get_optimizer
from ..parallel import make_mesh
from ..train.state import create_train_state
from ..utils.checkpoint import restore_model_variables
from ..utils.logging import MetricLogger
from .data import CityscapesSegmentation, SyntheticSegmentation
from .models import get_seg_model
from .train import SegConfig, evaluate_seg, make_seg_train_step

# cityscapes train-id palette (utilities/color_map.py)
CITYSCAPES_PALETTE = np.array([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]], np.uint8)

# train-id -> original cityscapes label id (the `relabel` mapping,
# evaluate.py:19-46)
CITYSCAPES_TRAINID_TO_ID = np.array(
    [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33],
    np.uint8)


def colorize(pred: np.ndarray) -> np.ndarray:
    pred = np.clip(pred, 0, len(CITYSCAPES_PALETTE) - 1)
    return CITYSCAPES_PALETTE[pred]


def relabel(pred: np.ndarray) -> np.ndarray:
    """train ids -> submission label ids."""
    return CITYSCAPES_TRAINID_TO_ID[np.clip(pred, 0, 18)]


def main(args):
    logger = MetricLogger(None, name="seg-eval")
    from .train import resolve_dataset_defaults
    cfg = resolve_dataset_defaults(
        SegConfig(model=args.model, dataset=args.dataset,
                  crop_size=args.crop_size, batch_size=args.batch_size,
                  num_classes=args.num_classes))
    mesh = make_mesh()
    # same model construction as the trainer (train.py main): LR-ASPP pool
    # geometry per dataset (city (37,12) vs pascal/other (25,8)) and the
    # espnet width scale — a mismatch would silently eval a different
    # network than the one trained (or fail to restore the checkpoint)
    model_kw = dict(num_classes=cfg.num_classes,
                    dataset="pascal" if cfg.dataset in ("pascal", "custom")
                    else "city")
    if getattr(args, "width_scale", None) is not None:
        model_kw["s"] = args.width_scale
    model = get_seg_model(cfg.model, **model_kw)
    tx = get_optimizer("QSGD", 1e-3)
    if cfg.dataset == "synthetic":
        ds = SyntheticSegmentation(cfg.num_classes, (cfg.crop_size, cfg.crop_size),
                                   cfg.batch_size * 2, cfg.batch_size, 1)
    elif cfg.dataset == "pascal":
        from .data import VOCSegmentation
        ds = VOCSegmentation(args.data_dir, train=False,
                             batch_size=cfg.batch_size)
    elif cfg.dataset == "custom":
        from .data import CustomSegmentation
        ds = CustomSegmentation(args.data_dir, train=False,
                                crop_size=(cfg.crop_size, cfg.crop_size),
                                batch_size=cfg.batch_size)
    else:
        ds = CityscapesSegmentation(args.data_dir, train=False,
                                    batch_size=cfg.batch_size)

    sample = jnp.zeros((cfg.batch_size, cfg.crop_size, cfg.crop_size, 3))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               init_kwargs={"mode": QAT, "train": True})
    if args.checkpoint:
        state = restore_model_variables(args.checkpoint, state)
    else:
        # 1-iter calibration (train_seg_one_iter, train_eval_seg.py:57-104)
        step = make_seg_train_step(model, QAT, None, cfg.ignore_index, cfg.num_classes)
        batch = next(iter(ds))
        state, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    if args.export_int8:
        from ..quant import export_int8
        nbytes = export_int8(state.model_variables, args.export_int8)
        logger.info(f"INT8 artifact written: {args.export_int8} ({nbytes/1e6:.2f} MB)")

    qat = evaluate_seg(model, state, ds, mesh, QAT_FROZEN, cfg)
    int8 = evaluate_seg(model, state, ds, mesh, INT8, cfg)
    logger.info(f"mIoU(QAT sim)={qat['miou']:.4f}  mIoU(INT8 frozen)={int8['miou']:.4f}")

    if args.save_images:
        from PIL import Image

        os.makedirs(args.save_images, exist_ok=True)
        fwd = jax.jit(lambda v, x: jnp.argmax(
            model.apply(v, x, mode=INT8), axis=-1))
        batch = next(iter(ds))
        pred = np.asarray(fwd(state.model_variables, jnp.asarray(batch["image"])))
        for i in range(min(4, pred.shape[0])):
            Image.fromarray(colorize(pred[i])).save(
                os.path.join(args.save_images, f"pred_{i}_color.png"))
            Image.fromarray(relabel(pred[i])).save(
                os.path.join(args.save_images, f"pred_{i}_labelids.png"))
        logger.info(f"prediction PNGs -> {args.save_images}")
    return {"qat": qat["miou"], "int8": int8["miou"]}


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="mobilenetv3_RE_small")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="./data/cityscapes")
    p.add_argument("--num_classes", type=int, default=None,
                   help="default resolved per dataset (21 pascal / 19 city)")
    p.add_argument("--crop_size", type=int, default=None,
                   help="default resolved per dataset (512/768; 96 synthetic)")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--width_scale", type=float, default=None,
                   help="espnet/espnetv2 channel scale (must match the "
                        "trainer's --width_scale or the checkpoint shapes "
                        "won't restore)")
    p.add_argument("--save_images", default=None)
    p.add_argument("--export_int8", default=None, metavar="PATH",
                   help="write the converted INT8 deployment artifact (.npz)")
    main(p.parse_args())


if __name__ == "__main__":
    cli()

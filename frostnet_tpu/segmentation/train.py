"""Segmentation QAT trainer (Semantic_Segmentation/train.py:32-359 flow).

StatAssist FP warm-up -> QAT with GradBoost, weighted-CE SegmentationLoss,
on-device confusion-matrix mIoU (replacing the per-batch CPU torch.histc
host sync, SURVEY.md §3.4), best-mIoU checkpointing, dual QAT/INT8 eval.

Run: python -m frostnet_tpu.segmentation.train --model mobilenetv3_RE_small \
       --dataset synthetic --epochs 1 --fp_epochs 1
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import prefetch_to_device
from ..nn import FP32, QAT, QAT_FROZEN, INT8
from ..optim import get_optimizer, grouped_weight_decay, get_lr_scheduler
from ..parallel import make_mesh, replicate
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from ..utils.losses import binary_cross_entropy_with_logits, cross_entropy
from ..utils.metrics import confusion_matrix, miou_from_confusion
from ..train.state import QATTrainState, _prep_image, create_train_state
from .data import (
    CustomSegmentation,
    CITYSCAPES_CLASS_WEIGHTS,
    CITYSCAPES_IGNORE,
    CityscapesSegmentation,
    SyntheticSegmentation,
    VOCSegmentation,
)
from .models import get_seg_model


@dataclasses.dataclass
class SegConfig:
    model: str = "mobilenetv3_RE_small"
    dataset: str = "synthetic"      # 'city' | 'pascal' | 'custom' | 'synthetic'
    data_dir: str = "./data/cityscapes"  # pascal: the VOCdevkit root
    coco_list: Optional[str] = None  # pascal: extra COCO-as-VOC "img,mask"
                                     # pretraining list (reference --coco_path,
                                     # voc.py:13-108)
    num_classes: Optional[int] = None  # resolved per dataset when unset
    crop_size: Optional[int] = None    # (resolve_dataset_defaults)
    batch_size: int = 16
    epochs: int = 2
    fp_epochs: int = 1
    optim: str = "QSGD"
    learning_rate: float = 0.05
    weight_decay: float = 4e-5
    clip_by: float = 1e-3
    scheduler: str = "poly"
    power: float = 0.9
    steps_per_epoch: Optional[int] = None
    seed: int = 42
    save_dir: str = "./runs/segmentation"
    ignore_index: int = CITYSCAPES_IGNORE
    loss_type: str = "ce"           # 'ce' | 'bce' (SegmentationLoss,
                                    # segmentation_loss.py:15-18)
    width_scale: Optional[float] = None  # espnet/espnetv2 channel scale
                                    # (reference --s, train.py:340)
    loader: str = "python"          # "python" (PIL) | "native" (C++ pool:
                                    # PNG/JPEG decode + paired aug, uint8 out
                                    # normalized on device)
    resume: bool = False            # continue from save_dir/checkpoint
                                    # (reference --resume, train.py:228-236)


def resolve_dataset_defaults(cfg: SegConfig) -> SegConfig:
    """Fill unset num_classes/crop_size per dataset (the reference fixes
    them per dataset, train.py:39-66): pascal -> 21 classes / 512 crop;
    city -> 19 / 768; synthetic -> 19 / 96 (smoke-sized). Explicitly passed
    values are always respected — no sentinel-equality guessing."""
    fills = {"pascal": (VOCSegmentation.NUM_CLASSES, 512),
             "city": (19, 768),
             # the reference custom sample is 2-class person/background at
             # crop 513 (custom_dataset_loader.py:13,18) — 512 keeps the
             # power-of-two crop convention
             "custom": (2, 512)}.get(cfg.dataset, (19, 96))
    if cfg.num_classes is None:
        cfg.num_classes = fills[0]
    if cfg.crop_size is None:
        cfg.crop_size = fills[1]
    return cfg


def build_seg_dataset(cfg: SegConfig, train: bool):
    if cfg.dataset == "synthetic":
        return SyntheticSegmentation(
            num_classes=cfg.num_classes, crop=(cfg.crop_size, cfg.crop_size),
            length=cfg.batch_size * (cfg.steps_per_epoch or 4),
            batch_size=cfg.batch_size, seed=cfg.seed + (not train))
    if cfg.dataset == "pascal":
        ds = VOCSegmentation(
            cfg.data_dir, train=train, crop_size=(cfg.crop_size, cfg.crop_size),
            batch_size=cfg.batch_size, seed=cfg.seed,
            coco_list=cfg.coco_list if train else None)
    elif cfg.dataset == "city":
        ds = CityscapesSegmentation(
            cfg.data_dir, train=train, crop_size=(cfg.crop_size, cfg.crop_size),
            batch_size=cfg.batch_size, seed=cfg.seed)
    elif cfg.dataset == "custom":
        ds = CustomSegmentation(
            cfg.data_dir, train=train, crop_size=(cfg.crop_size, cfg.crop_size),
            batch_size=cfg.batch_size, seed=cfg.seed)
    else:
        raise ValueError(
            f"unknown dataset {cfg.dataset!r} (city|pascal|custom|synthetic)")
    if cfg.loader == "native":
        # hand the Python dataset's (img, mask) path list to the C++ pool;
        # city pairs are root-relative, VOC pairs absolute. Val protocol:
        # pascal resizes to crop (reference voc.py Resize); city evaluates
        # at the native 1024x2048 (whole-frame resize == identity there).
        try:
            from ..native import NativeSegmentationLoader
            root = cfg.data_dir if cfg.dataset in ("city", "custom") else ""
            imgs = [os.path.join(root, a) for a, _ in ds.pairs]
            masks = [os.path.join(root, b) for _, b in ds.pairs]
            if train:
                crop = (cfg.crop_size, cfg.crop_size)
            else:
                crop = (1024, 2048) if cfg.dataset == "city" else \
                    (cfg.crop_size, cfg.crop_size)
            return NativeSegmentationLoader(
                imgs, masks, crop_size=crop, batch_size=cfg.batch_size,
                train=train, seed=cfg.seed, ignore=cfg.ignore_index)
        except RuntimeError as e:  # toolchain/libjpeg/libpng missing
            import warnings
            warnings.warn(f"--loader native unavailable ({e}); "
                          "falling back to the Python loader")
    return ds


_dataset = build_seg_dataset  # back-compat alias


def make_seg_train_step(model, mode, class_weights, ignore_index, num_classes,
                        input_mean=None, input_std=None, loss_type="ce"):
    weights = None if class_weights is None else jnp.asarray(class_weights)
    mutable = ["batch_stats"] + (["quant"] if mode.observe else [])

    def seg_loss(logits, label):
        if loss_type == "bce":
            # SegmentationLoss bce branch (segmentation_loss.py:20-44):
            # one-hot targets with ignore pixels as all-zero rows (one_hot
            # of an out-of-range index is the zero vector), per-class
            # weight on the elementwise loss
            onehot = jax.nn.one_hot(label, num_classes, dtype=logits.dtype)
            return binary_cross_entropy_with_logits(logits, onehot,
                                                    weight=weights)
        return cross_entropy(logits, label, class_weights=weights,
                             ignore_index=ignore_index)

    def step(state: QATTrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        image = _prep_image(batch["image"], input_mean, input_std)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats,
                         "quant": state.quant}
            logits, updates = model.apply(
                variables, image, mode=mode, train=True,
                mutable=mutable, rngs={"dropout": dropout_rng})
            loss = seg_loss(logits, batch["label"])
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        opt_updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, opt_updates)
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(pred, batch["label"], num_classes, ignore_index)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            quant=updates.get("quant", state.quant),
            opt_state=opt_state, rng=rng)
        return new_state, {"loss": loss, "cm": cm}

    return jax.jit(step, donate_argnums=(0,))


def make_seg_eval_step(model, mode, num_classes, ignore_index,
                       input_mean=None, input_std=None):
    def step(state: QATTrainState, batch):
        logits = model.apply(
            state.model_variables,
            _prep_image(batch["image"], input_mean, input_std), mode=mode)
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, batch["label"], num_classes, ignore_index)

    return jax.jit(step)


def evaluate_seg(model, state, dataset, mesh, mode, cfg, max_steps=None):
    eval_step = make_seg_eval_step(model, mode, cfg.num_classes, cfg.ignore_index)
    cm_total = jnp.zeros((cfg.num_classes, cfg.num_classes), jnp.int32)
    for i, batch in enumerate(prefetch_to_device(iter(dataset), mesh)):
        if max_steps is not None and i >= max_steps:
            break
        cm_total = cm_total + eval_step(state, batch)
    iou, miou = miou_from_confusion(cm_total)
    return {"miou": float(miou), "iou": np.asarray(iou)}


def main(cfg: SegConfig):
    cfg = resolve_dataset_defaults(cfg)
    os.makedirs(cfg.save_dir, exist_ok=True)
    logger = MetricLogger(cfg.save_dir, name="seg")
    with open(os.path.join(cfg.save_dir, "arguments.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)  # train.py:196-201

    mesh = make_mesh()
    train_ds = build_seg_dataset(cfg, True)
    val_ds = build_seg_dataset(cfg, False)
    steps_per_epoch = cfg.steps_per_epoch or len(train_ds)
    total_steps = (cfg.fp_epochs + cfg.epochs) * steps_per_epoch

    # LR-ASPP pool geometry follows the dataset (LRASPP.py pool sizes:
    # city (37,12), pascal/other (25,8))
    model_kw = dict(num_classes=cfg.num_classes,
                    dataset="pascal" if cfg.dataset in ("pascal", "custom")
                    else "city")
    if cfg.width_scale is not None:  # espnet/espnetv2 --s channel scale
        model_kw["s"] = cfg.width_scale
    model = get_seg_model(cfg.model, **model_kw)
    schedule = get_lr_scheduler(cfg.scheduler, base_lr=cfg.learning_rate,
                                total_steps=total_steps, power=cfg.power) \
        if cfg.scheduler == "poly" else get_lr_scheduler(
            cfg.scheduler, base_lr=cfg.learning_rate, total_steps=total_steps)
    tx = get_optimizer(cfg.optim, schedule,
                       weight_decay=grouped_weight_decay(cfg.weight_decay),
                       **({"clip_by": cfg.clip_by} if cfg.optim.startswith("Q") else {}))

    class_weights = CITYSCAPES_CLASS_WEIGHTS if cfg.dataset == "city" else None
    sample = jnp.zeros((cfg.batch_size, cfg.crop_size, cfg.crop_size, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(cfg.seed), sample,
                               init_kwargs={"mode": QAT, "train": True})

    start_epoch, best, resumed = 0, -1.0, False
    ckpt_path = os.path.join(cfg.save_dir, "checkpoint")
    meta_path = os.path.join(cfg.save_dir, "checkpoint_meta.json")
    if cfg.resume and os.path.exists(meta_path):
        from ..utils.checkpoint import restore_checkpoint
        state = restore_checkpoint(ckpt_path, state)
        with open(meta_path) as f:
            meta = json.load(f)
        start_epoch, best = meta["qat_epoch"], meta["best_miou"]
        resumed = True

    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        quant=replicate(state.quant, mesh),
        opt_state=replicate(state.opt_state, mesh))

    def run_epoch(step_fn, tag, epoch):
        nonlocal state
        cm_total = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
        losses = []
        for i, batch in enumerate(prefetch_to_device(iter(train_ds), mesh)):
            if cfg.steps_per_epoch and i >= cfg.steps_per_epoch:
                break
            state, m = step_fn(state, batch)
            losses.append(float(m["loss"]))
            cm_total += np.asarray(m["cm"], np.int64)
        _, miou = miou_from_confusion(jnp.asarray(cm_total))
        logger.info(f"[{tag} {epoch}] loss={np.mean(losses):.4f} miou={float(miou):.4f}")

    if resumed:
        logger.info(f"resumed from {ckpt_path} at qat epoch {start_epoch} "
                    f"(step {int(state.step)}, best_miou {best:.4f})")
    else:
        fp_step = make_seg_train_step(model, FP32, class_weights, cfg.ignore_index,
                                      cfg.num_classes, loss_type=cfg.loss_type)
        for epoch in range(cfg.fp_epochs):
            run_epoch(fp_step, "fp_warmup", epoch)
    state = state.start_qat()  # idempotent on resume

    qat_step = make_seg_train_step(model, QAT, class_weights, cfg.ignore_index,
                                   cfg.num_classes, loss_type=cfg.loss_type)
    for epoch in range(start_epoch, cfg.epochs):
        run_epoch(qat_step, "qat", epoch)
        val = evaluate_seg(model, state, val_ds, mesh, QAT_FROZEN, cfg, cfg.steps_per_epoch)
        logger.info(f"[val {epoch}] miou={val['miou']:.4f}")
        save_checkpoint(ckpt_path, state)
        if val["miou"] > best:
            best = val["miou"]
            save_checkpoint(os.path.join(cfg.save_dir, "best"), state)
        with open(meta_path, "w") as f:
            json.dump({"qat_epoch": epoch + 1, "best_miou": float(best)}, f)

    qat = evaluate_seg(model, state, val_ds, mesh, QAT_FROZEN, cfg, cfg.steps_per_epoch)
    int8 = evaluate_seg(model, state, val_ds, mesh, INT8, cfg, cfg.steps_per_epoch)
    logger.info(f"mIoU(QAT sim)={qat['miou']:.4f}  mIoU(INT8 frozen)={int8['miou']:.4f}")
    return state, {"qat": qat, "int8": int8}


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(SegConfig):
        t = {int: int, float: float, str: str}.get(f.type if isinstance(f.type, type) else str, str)
        if f.name == "steps_per_epoch":
            p.add_argument("--steps_per_epoch", type=int, default=None)
        else:
            p.add_argument(f"--{f.name}", type={"int": int, "float": float, "str": str,
                                                "Optional[int]": int,
                                                "Optional[float]": float}.get(str(f.type), str),
                           default=None)
    args = p.parse_args()
    cfg = SegConfig()
    for f in dataclasses.fields(SegConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    main(cfg)


if __name__ == "__main__":
    cli()

"""Classification QAT trainer: StatAssist FP32 warm-up -> GradBoost QAT.

TPU-native equivalent of reference Classification/train.py (JSON-config
driven, :35-240): same phase structure, but phases are two compilations of
one jitted step over a device mesh instead of a module-graph rewrite.

Flow (mirrors the reference call stack, SURVEY.md §3.1):
  build model/registry -> param-grouped weight decay -> get_optimizer ->
  FP warm-up epochs (mode=FP32) -> state.start_qat() [is_warmup=False] ->
  QAT epochs (mode=QAT) with per-iter LR schedule -> val each epoch ->
  best-checkpoint save -> final INT8 eval (the evaluate.py dual-accuracy
  contract).

Run: python -m frostnet_tpu.train.classification --config cfg.json
     python -m frostnet_tpu.train.classification --dataset synthetic --epochs 1
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (SyntheticClassification, build_classification_dataset,
                    prefetch_to_device)
from ..models import create_model
from ..nn import FP32, QAT, QAT_FROZEN, INT8
from ..optim import get_optimizer, grouped_weight_decay, get_lr_scheduler
from ..parallel import make_mesh, replicate
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from ..utils.metrics import AverageMeter
from .state import create_train_state, make_train_step, make_eval_step


def flatten_reference_json(raw: dict, aliases: dict, ignored=frozenset()) -> dict:
    """Flatten the reference's setting/*.json layout (nested *_config
    sections) and normalize its key spellings/dataset names. Shared by the
    trainer's from_json and the evaluator's -c loader so the reference-layout
    parsing lives in exactly one place."""
    flat = {}
    for k, v in raw.items():
        if isinstance(v, dict) and k.endswith("_config"):
            flat.update(v)
        else:
            flat[k] = v
    out = {}
    for k, v in flat.items():
        k = aliases.get(k, k)
        if k in ignored:
            continue
        if k == "dataset":
            v = {"ILSVRC2015": "imagenet"}.get(v, v)
        out[k] = v
    return out


@dataclasses.dataclass
class ClassificationConfig:
    """Union of the knobs in reference setting/train.json + CLI args."""

    model: str = "frostnet_quant_small_1_0"
    dataset: str = "synthetic"
    data_dir: str = "./data"
    loader: str = "python"       # "python" (PIL threads) | "native" (C++ pool,
                                 # the torch DataLoader-worker equivalent —
                                 # reference Classification/train.py:108-114)
    num_classes: int = 1000
    image_size: int = 224
    batch_size: int = 64
    epochs: int = 2              # QAT epochs
    fp_epochs: int = 1           # StatAssist warm-up epochs (FP_epoch)
    optim: str = "QSGD"
    learning_rate: float = 0.04
    weight_decay: float = 4e-5
    clip_by: float = 1e-3
    toss_coin: bool = True
    noise_decay: float = 1e-2
    nesterov: bool = False
    lrsch: str = "cos_lr"
    annealing: bool = False      # cyclic cos/linear restarts (train.json
                                 # "annealing" + "restart_epoch",
                                 # helper_functions.py:231-249)
    restart_epoch: int = 100
    amsgrad: bool = False        # QAdam/QAdamW amsgrad variant (train.json)
    warmup_epochs: int = 0
    warmup_lr: float = 1e-4
    decay_epochs: float = 30.0   # step_lr: 2.4 in the published recipe
    decay_rate: float = 0.1      # step_lr gamma: .97 in the published recipe
    aa: str = ""                 # auto-augment spec for ImageFolder train,
                                 # e.g. "rand-m9-mstd0.5" (recipe --aa)
    label_smoothing: float = 0.0
    ema_decay: float = 0.0       # 0.9999 in the published recipe (training_commands.txt)
    steps_per_epoch: Optional[int] = None  # cap for smoke runs
    seed: int = 42
    save_dir: str = "./runs/classification"
    log_every: int = 10
    mp: int = 1                  # model-parallel axis size
    resume_path: Optional[str] = None  # explicit checkpoint dir to restore
                                 # (the reference's resume-by-path;
                                 # meta/best still live in save_dir)
    resume: bool = False         # continue from save_dir/checkpoint (the
                                 # reference's checkpoint.pth.tar resume flow,
                                 # helper_functions.py:400-407)

    # reference setting/train.json key -> our field (train.py:46-67 reads
    # these out of the nested train_config/data_config sections)
    _JSON_ALIASES = {
        "Model": "model", "FP_epoch": "fp_epochs",
        "warmup_epoch": "warmup_epochs", "dataset_name": "dataset",
    }
    _JSON_IGNORED = {"num_work", "w", "h", "ignore_idx"}  # loader knobs n/a

    @classmethod
    def from_json(cls, path):
        """Accepts both our flat JSON and the reference's
        setting/train.json layout (nested train_config/data_config sections,
        Model/FP_epoch/... key spellings, resume as a checkpoint path)."""
        with open(path) as f:
            raw = json.load(f)
        flat = flatten_reference_json(raw, cls._JSON_ALIASES, cls._JSON_IGNORED)
        known = {f.name for f in dataclasses.fields(cls)}
        out = {}
        for k, v in flat.items():
            if k == "resume" and isinstance(v, str):
                # the reference uses "" / an explicit checkpoint path
                if v:
                    out["resume_path"] = v
                v = bool(v)
            if k in known:
                out[k] = v
        return cls(**out)


def _build_dataset(cfg: ClassificationConfig, train: bool):
    if cfg.dataset == "synthetic":
        return SyntheticClassification(
            num_classes=cfg.num_classes, image_size=cfg.image_size,
            length=cfg.batch_size * (cfg.steps_per_epoch or 8),
            batch_size=cfg.batch_size, seed=cfg.seed + (0 if train else 1))
    if cfg.loader == "native":
        # the C++ pool serves ImageFolder-layout JPEG datasets
        root = os.path.join(cfg.data_dir, cfg.dataset, "train" if train else "val")
        try:
            from ..native import NativeClassificationLoader
            # uint8 output: 4x less host->device traffic; the jitted step
            # normalizes on device (train/state._prep_image)
            return NativeClassificationLoader.from_folder(
                root, batch_size=cfg.batch_size, image_size=cfg.image_size,
                train=train, seed=cfg.seed + (0 if train else 1),
                output="uint8")
        except RuntimeError as e:  # toolchain/libjpeg missing — degrade
            import warnings
            warnings.warn(f"--loader native unavailable ({e}); "
                          "falling back to the Python loader")
    return build_classification_dataset(
        cfg.dataset, cfg.data_dir, train, image_size=cfg.image_size,
        batch_size=cfg.batch_size, seed=cfg.seed + (0 if train else 1),
        aa=cfg.aa)


def _optimizer(cfg: ClassificationConfig, schedule):
    kwargs = {}
    if cfg.optim.startswith("Q"):
        kwargs = dict(clip_by=cfg.clip_by, toss_coin=cfg.toss_coin,
                      noise_decay=cfg.noise_decay, seed=cfg.seed)
    if cfg.optim in ("SGD", "QSGD"):
        kwargs["nesterov"] = cfg.nesterov
    if cfg.optim in ("Adam", "QAdam", "AdamW", "QAdamW"):
        kwargs["amsgrad"] = cfg.amsgrad
    wd = grouped_weight_decay(cfg.weight_decay)
    return get_optimizer(cfg.optim, schedule, weight_decay=wd, **kwargs)


def _run_epoch(step_fn, state, dataset, mesh, epoch, tag, logger, log_every, max_steps=None):
    meters = {}
    t0 = time.time()
    n_images = 0
    for i, batch in enumerate(prefetch_to_device(iter(dataset), mesh)):
        if max_steps is not None and i >= max_steps:
            break
        state, metrics = step_fn(state, batch)
        n_images += batch["image"].shape[0]
        for k, v in metrics.items():
            meters.setdefault(k, AverageMeter()).update(float(v), batch["image"].shape[0])
        if (i + 1) % log_every == 0:
            logger.log_scalars(
                {f"{tag}/{k}": m.avg for k, m in meters.items()},
                step=int(state.step))
    dt = time.time() - t0
    summary = {k: m.avg for k, m in meters.items()}
    summary["images_per_sec"] = n_images / max(dt, 1e-9)
    return state, summary


def evaluate(model, state, dataset, mesh, mode, num_classes, max_steps=None,
             use_ema=False):
    eval_step = make_eval_step(model, mode, num_classes, use_ema=use_ema)
    meters = {}
    for i, batch in enumerate(prefetch_to_device(iter(dataset), mesh)):
        if max_steps is not None and i >= max_steps:
            break
        metrics = eval_step(state, batch)
        for k, v in metrics.items():
            meters.setdefault(k, AverageMeter()).update(float(v), batch["image"].shape[0])
    return {k: m.avg for k, m in meters.items()}


def main(cfg: ClassificationConfig):
    os.makedirs(cfg.save_dir, exist_ok=True)
    logger = MetricLogger(cfg.save_dir)
    logger.info(f"config: {dataclasses.asdict(cfg)}")

    mesh = make_mesh(mp=cfg.mp)
    train_ds = _build_dataset(cfg, train=True)
    val_ds = _build_dataset(cfg, train=False)
    steps_per_epoch = cfg.steps_per_epoch or len(train_ds)

    model = create_model(cfg.model, num_classes=cfg.num_classes)

    total_steps = (cfg.fp_epochs + cfg.epochs) * steps_per_epoch
    warmup = dict(warmup_steps=cfg.warmup_epochs * steps_per_epoch,
                  warmup_lr=cfg.warmup_lr)
    if cfg.lrsch in ("cos_lr", "linear_lr"):
        if cfg.annealing:  # cyclic restarts (helper_functions.py:231-249)
            warmup = dict(warmup,
                          restart_period=cfg.restart_epoch * steps_per_epoch)
        schedule = get_lr_scheduler(
            cfg.lrsch, base_lr=cfg.learning_rate, total_steps=total_steps,
            **warmup)
    elif cfg.lrsch == "step_lr":
        # the published recipe: --sched step --decay-epochs 2.4 --decay-rate
        # .97 (training_commands.txt:1-19)
        schedule = get_lr_scheduler(
            cfg.lrsch, base_lr=cfg.learning_rate,
            steps_per_epoch=steps_per_epoch, decay_epochs=cfg.decay_epochs,
            gamma=cfg.decay_rate, **warmup)
    else:
        schedule = get_lr_scheduler(
            cfg.lrsch, base_lr=cfg.learning_rate, total_steps=total_steps)
    tx = _optimizer(cfg, schedule)

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((cfg.batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32)
    state = create_train_state(model, tx, rng, sample, ema_decay=cfg.ema_decay)

    start_epoch, best_top1, resumed = 0, -1.0, False
    ckpt_path = os.path.join(cfg.save_dir, "checkpoint")
    meta_path = os.path.join(cfg.save_dir, "checkpoint_meta.json")
    restore_from = cfg.resume_path or ckpt_path
    restore_meta = (os.path.join(os.path.dirname(restore_from),
                                 "checkpoint_meta.json")
                    if cfg.resume_path else meta_path)
    if (cfg.resume or cfg.resume_path) and os.path.exists(restore_meta):
        from ..utils.checkpoint import restore_checkpoint
        state = restore_checkpoint(restore_from, state)
        with open(restore_meta) as f:
            meta = json.load(f)
        start_epoch, best_top1 = meta["qat_epoch"], meta["best_top1"]
        resumed = True  # checkpoints are written in the QAT phase only

    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        quant=replicate(state.quant, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.info(f"model {cfg.model}: {n_params/1e6:.2f}M params, "
                f"mesh {dict(mesh.shape)}")

    # ---------------- StatAssist FP32 warm-up (train.py:149-160) ----------
    if resumed:
        logger.info(f"resumed from {ckpt_path} at qat epoch {start_epoch} "
                    f"(step {int(state.step)}, best_top1 {best_top1:.4f})")
    else:
        fp_step = make_train_step(model, FP32, num_classes=cfg.num_classes,
                                  label_smoothing=cfg.label_smoothing,
                                  ema_decay=cfg.ema_decay)
        for epoch in range(cfg.fp_epochs):
            state, summary = _run_epoch(fp_step, state, train_ds, mesh, epoch,
                                        "fp_warmup", logger, cfg.log_every,
                                        cfg.steps_per_epoch)
            logger.info(f"[fp_warmup {epoch}] {summary}")

    # is_warmup=False (train.py:162-163); no graph rewrite needed for QAT.
    # (idempotent on resume — the restored opt_state is already out of warm-up)
    state = state.start_qat()
    if not resumed:
        logger.info("exp_sensitivity calibration fin. -> QAT phase")

    # ---------------- QAT epochs (train.py:178-236) ------------------------
    qat_step = make_train_step(model, QAT, num_classes=cfg.num_classes,
                               label_smoothing=cfg.label_smoothing,
                               ema_decay=cfg.ema_decay)
    for epoch in range(start_epoch, cfg.epochs):
        state, summary = _run_epoch(qat_step, state, train_ds, mesh, epoch,
                                    "qat", logger, cfg.log_every,
                                    cfg.steps_per_epoch)
        val_metrics = evaluate(model, state, val_ds, mesh, QAT_FROZEN,
                               cfg.num_classes, cfg.steps_per_epoch)
        logger.log_scalars({f"val/{k}": v for k, v in val_metrics.items()},
                           step=int(state.step))
        logger.info(f"[qat {epoch}] train {summary} val {val_metrics}")
        save_checkpoint(ckpt_path, state)
        if val_metrics.get("top1", 0.0) > best_top1:
            best_top1 = val_metrics.get("top1", 0.0)
            save_checkpoint(os.path.join(cfg.save_dir, "best"), state)
        with open(meta_path, "w") as f:
            json.dump({"qat_epoch": epoch + 1, "best_top1": float(best_top1)}, f)

    # ---------------- dual-accuracy eval (evaluate.py:129-138) ------------
    qat_metrics = evaluate(model, state, val_ds, mesh, QAT_FROZEN,
                           cfg.num_classes, cfg.steps_per_epoch)
    int8_metrics = evaluate(model, state, val_ds, mesh, INT8,
                            cfg.num_classes, cfg.steps_per_epoch)
    logger.info(f"Accuracy(QAT sim): {qat_metrics}")
    logger.info(f"Accuracy(INT8 frozen): {int8_metrics}")
    return state, {"qat": qat_metrics, "int8": int8_metrics}


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", "-c", type=str, default=None)
    for f in dataclasses.fields(ClassificationConfig):
        if f.type in ("int", "Optional[int]"):
            p.add_argument(f"--{f.name}", type=int, default=None)
        elif f.type == "float":
            p.add_argument(f"--{f.name}", type=float, default=None)
        elif f.type == "bool":
            p.add_argument(f"--{f.name}", type=lambda s: s.lower() in ("1", "true"),
                           default=None)
        else:
            p.add_argument(f"--{f.name}", type=str, default=None)
    args = p.parse_args()
    cfg = (ClassificationConfig.from_json(args.config)
           if args.config else ClassificationConfig())
    for f in dataclasses.fields(ClassificationConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    main(cfg)


if __name__ == "__main__":
    cli()

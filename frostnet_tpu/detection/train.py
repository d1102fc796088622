"""Detection QAT trainer (Object_Detection/qtrainval.py:99-327 flow).

Iteration-based: FP warm-up for 2 epochs' worth of iterations, then QAT to
cfg['max_iter'] with the multistep LR schedule. One optimizer spans feat+head
params (qtrainval.py:157); the multibox loss runs fully on-device (no CPU
prior-matching loop). Xavier init from scratch matches weights_init
(:351-359) via the conv initializers.

Run: python -m frostnet_tpu.detection.train --net_type qssd --dataset synthetic \
       --max_iter 4 --warmup_iters 2
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn import FP32, QAT
from ..optim import get_optimizer, set_warmup, schedules
from ..parallel import make_dp_mesh, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from .anchors import CONFIGS, make_priors
from .data import COCODetection, SyntheticDetection, VOCDetection
from .losses import multibox_loss
from .models import build_ssd
from .tdsod import build_tdsod


@dataclasses.dataclass
class DetConfig:
    net_type: str = "qssd"          # 'qssd' | 'qtdsod'
    dataset: str = "synthetic"      # 'voc' | 'coco' | 'synthetic'
    data_root: str = "./data/VOCdevkit"  # coco: the COCO root (annotations/ + splits)
    coco_split: str = "train2017"
    num_classes: Optional[int] = None    # default: dataset config (21 voc / 201 coco)
    batch_size: int = 32
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    gamma: float = 0.1
    optim: str = "QSGD"
    quant: bool = True              # --quant false trains plain FP32 SSD
                                    # end-to-end (qtrainval.py --quant)
    loader: str = "python"          # "python" (PIL) | "native" (C++ pool:
                                    # decode + SSD aug, uint8 to device)
    clip_by: float = 1e-3
    max_iter: Optional[int] = None      # default from cfg
    warmup_iters: Optional[int] = None  # default 2 epochs
    save_every: int = 10000
    resume_iter: Optional[int] = None   # continue from save_dir/ssd300_<iter>
                                        # (reference --resume weight pairs,
                                        # qtrainval.py:43-46,135-137)
    basenet: Optional[str] = None       # pretrained float MobileNetV2 (torch
                                        # .pth, torchvision key layout) for the
                                        # qssd trunk — the reference loads
                                        # weights/mobilenet_v2-float.pth before
                                        # training (ssd_qmv2.py:338-341)
    seed: int = 0
    save_dir: str = "./runs/detection"


def select_config(net_type: str, dataset: str) -> dict:
    """Anchor/schedule config for (net, dataset) — reference cfg dispatch
    (qtrainval.py:103-108 voc/TDSOD_voc; data/config.py:50-80 coco)."""
    key = "coco" if dataset == "coco" else "voc"
    return CONFIGS[f"tdsod_{key}" if net_type == "qtdsod" else key]


def build_detection_dataset(cfg: "DetConfig", train: bool = True):
    """'voc' | 'coco' | 'synthetic' -> batched detection dataset."""
    if cfg.dataset == "synthetic":
        return SyntheticDetection((cfg.num_classes or 21) - 1, 300,
                                  cfg.batch_size * 4, cfg.batch_size, cfg.seed)
    if cfg.dataset == "coco":
        ds = COCODetection(cfg.data_root, split=cfg.coco_split,
                           batch_size=cfg.batch_size, train=train,
                           seed=cfg.seed)
    elif cfg.dataset == "voc":
        ds = VOCDetection(cfg.data_root, batch_size=cfg.batch_size,
                          train=train, seed=cfg.seed)
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r} (voc|coco|synthetic)")
    if getattr(cfg, "loader", "python") == "native":
        # annotation parsing stays host-side; JPEG decode + the SSD
        # augmentation move to the C++ pool. Raw uint8 RGB ships to the
        # device where _prep_det_image applies the BGR/mean BaseTransform.
        try:
            from ..native import NativeDetectionLoader
            paths, boxes, labels = ds.annotations()
            return NativeDetectionLoader(
                paths, boxes, labels, batch_size=cfg.batch_size,
                train=train, seed=cfg.seed)
        except RuntimeError as e:  # toolchain/libjpeg/libpng missing
            import warnings
            warnings.warn(f"--loader native unavailable ({e}); "
                          "falling back to the Python loader")
    return ds


@flax.struct.dataclass
class DetState:
    step: jnp.ndarray
    feat_params: Any
    feat_batch_stats: Any
    feat_quant: Any
    head_params: Any
    head_batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def _prep_det_image(image):
    """uint8 batches (the native loader's raw RGB) get the SSD BaseTransform
    on device: RGB->BGR + mean subtraction, fused into the step by XLA
    (ssd_augment applies the same on host for f32 batches)."""
    if image.dtype != jnp.uint8:
        return image
    from .data import MEANS
    return image.astype(jnp.float32)[..., ::-1] - jnp.asarray(MEANS, jnp.float32)


def make_det_train_step(feat, head, mode, priors, num_classes):
    mutable_f = ["batch_stats"] + (["quant"] if mode.observe else [])

    def step(state: DetState, batch):
        image = _prep_det_image(batch["image"])

        def loss_fn(params):
            fp, hp = params
            fv = {"params": fp, "batch_stats": state.feat_batch_stats,
                  "quant": state.feat_quant}
            sources, f_upd = feat.apply(fv, image, mode=mode, train=True,
                                        mutable=mutable_f)
            hv = {"params": hp, "batch_stats": state.head_batch_stats}
            (loc, conf), h_upd = head.apply(hv, sources, train=True,
                                            mutable=["batch_stats"])
            loss_l, loss_c = multibox_loss(
                loc, conf, batch["boxes"], batch["labels"], batch["valid"], priors)
            return loss_l + loss_c, (f_upd, h_upd, loss_l, loss_c)

        (loss, (f_upd, h_upd, loss_l, loss_c)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)((state.feat_params, state.head_params))
        updates, opt_state = state.tx.update(
            grads, state.opt_state, (state.feat_params, state.head_params))
        fp, hp = optax.apply_updates((state.feat_params, state.head_params), updates)
        return state.replace(
            step=state.step + 1, feat_params=fp, head_params=hp,
            feat_batch_stats=f_upd.get("batch_stats", state.feat_batch_stats),
            feat_quant=f_upd.get("quant", state.feat_quant),
            head_batch_stats=h_upd.get("batch_stats", state.head_batch_stats),
            opt_state=opt_state,
        ), {"loss": loss, "loss_l": loss_l, "loss_c": loss_c}

    return jax.jit(step, donate_argnums=(0,))


def main(cfg: DetConfig):
    os.makedirs(cfg.save_dir, exist_ok=True)
    logger = MetricLogger(cfg.save_dir, name="det")
    logger.info(f"config: {dataclasses.asdict(cfg)}")

    det_cfg = select_config(cfg.net_type, cfg.dataset)
    priors = jnp.asarray(make_priors(det_cfg))
    max_iter = cfg.max_iter or det_cfg["max_iter"]
    # default head width follows the dataset config (21 voc / 201 coco — the
    # reference keeps ssd.pytorch's oversized 201-way COCO head, config.py:52);
    # --num_classes 81 gives the compact contiguous-label head instead.
    num_classes = cfg.num_classes or det_cfg["num_classes"]
    cfg.num_classes = num_classes

    ds = build_detection_dataset(cfg)
    epoch_size = max(len(ds), 1)
    warmup_iters = cfg.warmup_iters if cfg.warmup_iters is not None else 2 * epoch_size

    build = build_tdsod if cfg.net_type == "qtdsod" else build_ssd
    feat, head = build(num_classes=cfg.num_classes)

    schedule = schedules.multistep(cfg.lr, det_cfg["lr_steps"], cfg.gamma)
    tx = get_optimizer(cfg.optim, schedule, momentum=cfg.momentum,
                       weight_decay=cfg.weight_decay,
                       **({"clip_by": cfg.clip_by} if cfg.optim.startswith("Q") else {}))

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((cfg.batch_size, 300, 300, 3), jnp.float32)
    fv = jax.jit(lambda r, x: feat.init(r, x, mode=QAT, train=True))(rng, sample)
    if cfg.basenet:
        if cfg.net_type != "qssd":
            raise ValueError("--basenet is the qssd MobileNetV2 trunk import")
        from .models import load_torch_mobilenet_v2_checkpoint
        fv = load_torch_mobilenet_v2_checkpoint(cfg.basenet, fv)
        logger.info(f"loaded pretrained trunk from {cfg.basenet}")
    sources_shape = jax.eval_shape(
        lambda v, x: feat.apply(v, x, mode=FP32), fv, sample)
    sources = [jnp.zeros(s.shape, s.dtype) for s in sources_shape]
    hv = jax.jit(lambda r, s: head.init(r, s, train=True))(rng, sources)

    state = DetState(
        step=jnp.zeros([], jnp.int32),
        feat_params=fv["params"], feat_batch_stats=fv.get("batch_stats", {}),
        feat_quant=fv.get("quant", {}),
        head_params=hv["params"], head_batch_stats=hv.get("batch_stats", {}),
        opt_state=tx.init((fv["params"], hv["params"])),
        rng=rng, tx=tx)

    fp_step = make_det_train_step(feat, head, FP32, priors, cfg.num_classes)
    qat_step = make_det_train_step(feat, head, QAT if cfg.quant else FP32,
                                   priors, cfg.num_classes)

    it = 0
    if cfg.resume_iter:
        from ..utils.checkpoint import restore_checkpoint
        state = restore_checkpoint(
            os.path.join(cfg.save_dir, f"ssd300_{cfg.resume_iter}"), state)
        it = cfg.resume_iter
        logger.info(f"resumed from ssd300_{it} (step {int(state.step)})")

    # dp mesh: state replicated, batches sharded over 'dp' — replaces the
    # reference's DataParallel over BOTH the feat net and the head
    # (qtrainval.py:124-126); pjit inserts the gradient psum.
    mesh = make_dp_mesh(cfg.batch_size)
    state = replicate(state, mesh)
    logger.info(f"mesh {dict(mesh.shape)}")
    data_iter = iter(ds)

    def next_batch():
        nonlocal data_iter
        try:
            b = next(data_iter)
        except StopIteration:
            data_iter = iter(ds)
            b = next(data_iter)
        return shard_batch({k: np.asarray(v) for k, v in b.items()}, mesh)

    while it < warmup_iters:  # FP warm-up (qtrainval.py:187-237)
        state, m = fp_step(state, next_batch())
        it += 1
        if it == warmup_iters:
            logger.info(f"[warmup done @ {it}] loss={float(m['loss']):.4f}")
    # idempotent on resume (the restored opt_state is already out of warm-up)
    state = state.replace(opt_state=set_warmup(state.opt_state, False))

    while it < max_iter:      # QAT iterations (qtrainval.py:259-327)
        state, m = qat_step(state, next_batch())
        it += 1
        if it % cfg.save_every == 0 or it == max_iter:
            save_checkpoint(os.path.join(cfg.save_dir, f"ssd300_{it}"), state)
            logger.info(f"[iter {it}] loss={float(m['loss']):.4f} "
                        f"(l={float(m['loss_l']):.4f} c={float(m['loss_c']):.4f})")
    logger.info(f"final loss={float(m['loss']):.4f}")
    return state


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(DetConfig):
        typ = {"int": int, "float": float, "str": str,
               "bool": lambda v: v.lower() in ("1", "true", "yes"),
               "Optional[int]": int}.get(str(f.type), str)
        p.add_argument(f"--{f.name}", type=typ, default=None)
    args = p.parse_args()
    cfg = DetConfig()
    for f in dataclasses.fields(DetConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    main(cfg)


if __name__ == "__main__":
    cli()

"""Style-transfer QAT trainer (Style_Transfer/train.py:29-116 flow).

StatAssist FP warm-up epochs -> generator optimizer leaves warm-up
(optimizer_G.is_warmup=False, :62-64) -> QAT epochs where only generator
cores fake-quant (fuse+prepare_qat on netG.quantized, :66-74 — here: the
same jitted step with mode=QAT). Only G gets the GradBoost QAdam
(pix2pix_model.py:68-70); Ds use plain Adam.

Run: python -m frostnet_tpu.gan.train --model pix2pix --dataset synthetic \
       --epochs 1 --fp_epochs 1 --crop_size 64
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import FP32, QAT
from ..optim import adam, qadam, set_warmup
from ..parallel import make_dp_mesh, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger
from .data import AlignedDataset, UnalignedDataset, SyntheticPairs, apply_direction
from .image_pool import ImagePool
from .models import make_net_state, make_pix2pix_steps, make_cyclegan_steps
from .networks import define_d, define_g


@dataclasses.dataclass
class GANConfig:
    model: str = "pix2pix"       # 'pix2pix' | 'cycle_gan'
    dataset: str = "synthetic"
    data_root: str = "./datasets/facades"
    netG: str = "resnet_6blocks"
    netD: str = "basic"          # basic | n_layers | pixel (base_options.py)
    n_layers_d: int = 3          # --n_layers_D (used with netD=n_layers)
    ngf: int = 64
    ndf: int = 64
    gan_mode: str = "lsgan"      # pix2pix reference default is vanilla; lsgan for cyclegan
    norm: Optional[str] = None   # discriminator norm: 'batch' | 'none';
                                 # default batch for pix2pix
                                 # (pix2pix_model.py:32), none for cyclegan
                                 # (base_options.py:36 repo default)
    direction: str = "AtoB"      # AtoB | BtoA (base_options.py:42; BtoA
                                 # swaps the domains at set_input)
    crop_size: int = 256
    load_size: int = 286
    batch_size: int = 1
    epochs: int = 2
    fp_epochs: int = 1           # --fp_warmup (train_options.py:40)
    lr: float = 2e-4
    beta1: float = 0.5
    lambda_l1: float = 100.0
    lambda_a: float = 10.0
    lambda_b: float = 10.0
    lambda_idt: float = 0.5
    pool_size: int = 50
    save_epoch_freq: int = 5     # save latest_* every N QAT epochs
                                 # (train_options.py save_epoch_freq=5)
    n_epochs_decay: int = 0      # linear lr_policy: keep lr for `epochs`
                                 # QAT epochs then decay to ~0 over this many
                                 # more (networks.py:143-147 lambda_rule;
                                 # reference default 100+100)
    q_optim: bool = True         # GradBoost QAdam on G (default True)
    clip_by: float = 1e-3
    steps_per_epoch: Optional[int] = None
    seed: int = 0
    save_dir: str = "./runs/gan"
    continue_train: bool = False # load latest_G/latest_D and keep training
                                 # (reference --continue_train,
                                 # base_model.py:86-88)


def _dataset(cfg: GANConfig):
    if cfg.dataset == "synthetic":
        return SyntheticPairs(cfg.crop_size, cfg.batch_size * (cfg.steps_per_epoch or 4),
                              cfg.batch_size, cfg.seed)
    if cfg.dataset == "colorization":
        from .data import ColorizationDataset

        return ColorizationDataset(cfg.data_root, "train", cfg.batch_size,
                                   cfg.load_size, cfg.crop_size, cfg.seed)
    if cfg.model == "cycle_gan":
        return UnalignedDataset(cfg.data_root, "train", cfg.batch_size,
                                cfg.load_size, cfg.crop_size, cfg.seed)
    return AlignedDataset(cfg.data_root, "train", cfg.batch_size,
                          cfg.load_size, cfg.crop_size, cfg.seed)


def _gan_lr_schedule(cfg: GANConfig, steps_per_epoch: int):
    """The reference's 'linear' lr_policy (networks.py:143-147): constant lr
    for cfg.epochs QAT epochs, then linear decay toward zero over
    cfg.n_epochs_decay more; FP warm-up steps hold the base lr. Stepped per
    epoch like LambdaLR (update_learning_rate at each epoch end)."""
    if cfg.n_epochs_decay <= 0:
        return cfg.lr
    warm = cfg.fp_epochs * steps_per_epoch

    def sched(count):
        qat_epoch = jnp.maximum(count - warm, 0) // steps_per_epoch + 1
        mult = 1.0 - jnp.maximum(0.0, qat_epoch - cfg.epochs) / (cfg.n_epochs_decay + 1.0)
        return cfg.lr * jnp.clip(mult, 0.0, 1.0)

    return sched


def _g_optimizer(cfg: GANConfig, lr=None):
    lr = cfg.lr if lr is None else lr
    if cfg.q_optim:
        return qadam(lr, b1=cfg.beta1, clip_by=cfg.clip_by, seed=cfg.seed)
    return adam(lr, b1=cfg.beta1)


def train_pix2pix(cfg: GANConfig, logger):
    ds = _dataset(cfg)
    in_nc, out_nc = (1, 2) if cfg.dataset == "colorization" else (3, 3)
    netG = define_g(output_nc=out_nc, ngf=cfg.ngf, netG=cfg.netG, quantized=True)
    netD = define_d(ndf=cfg.ndf, netD=cfg.netD, n_layers=cfg.n_layers_d,
                    norm=cfg.norm or "batch")
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((cfg.batch_size, cfg.crop_size, cfg.crop_size, in_nc))
    sample_b = jnp.zeros((cfg.batch_size, cfg.crop_size, cfg.crop_size, out_nc))

    lr = _gan_lr_schedule(cfg, cfg.steps_per_epoch or len(ds))
    g_state = make_net_state(netG, _g_optimizer(cfg, lr), rng, sample,
                             init_kwargs={"mode": QAT, "train": True})
    d_state = make_net_state(netD, adam(lr, b1=cfg.beta1), rng,
                             jnp.concatenate([sample, sample_b], -1),
                             init_kwargs={"train": True})

    resumed, start_epoch = False, 0
    meta_path = os.path.join(cfg.save_dir, "gan_meta.json")
    if cfg.continue_train and os.path.exists(os.path.join(cfg.save_dir, "latest_D")):
        from ..utils.checkpoint import restore_checkpoint
        g_state = restore_checkpoint(os.path.join(cfg.save_dir, "latest_G"), g_state)
        d_state = restore_checkpoint(os.path.join(cfg.save_dir, "latest_D"), d_state)
        resumed = True
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                start_epoch = json.load(f).get("qat_epoch", 0)
        logger.info(f"continue_train: restored latest_G/latest_D from "
                    f"{cfg.save_dir} (qat epoch {start_epoch})")

    # dp mesh over both nets — the reference DataParallels every net through
    # init_net (networks.py:207-208); here the states replicate and the batch
    # shards over 'dp' (1-device fast path skips sharding).
    mesh = make_dp_mesh(cfg.batch_size)
    g_state, d_state = replicate(g_state, mesh), replicate(d_state, mesh)

    def run_phase(mode, epochs, tag, start=0):
        nonlocal g_state, d_state
        d_step, g_step = make_pix2pix_steps(netG, netD, mode, cfg.gan_mode, cfg.lambda_l1)
        for epoch in range(start, epochs):
            metrics = {}
            for i, batch in enumerate(ds):
                if cfg.steps_per_epoch and i >= cfg.steps_per_epoch:
                    break
                batch = apply_direction(batch, cfg.direction)
                batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
                d_state, md = d_step(g_state, d_state, batch)
                g_state, mg = g_step(g_state, d_state, batch)
                metrics = {**{k: float(v) for k, v in md.items()},
                           **{k: float(v) for k, v in mg.items()}}
            logger.info(f"[{tag} {epoch}] {metrics}")
            if tag == "qat" and cfg.save_epoch_freq > 0 and \
                    (epoch + 1) % cfg.save_epoch_freq == 0:
                # periodic latest_* cache (reference train.py:111-113) so
                # --continue_train works after interruption
                save_checkpoint(os.path.join(cfg.save_dir, "latest_G"), g_state)
                save_checkpoint(os.path.join(cfg.save_dir, "latest_D"), d_state)
                with open(meta_path, "w") as f:
                    json.dump({"qat_epoch": epoch + 1}, f)

    if not resumed:
        run_phase(FP32, cfg.fp_epochs, "fp_warmup")
    # idempotent on resume (the restored opt_state is already out of warm-up)
    g_state = g_state.replace(opt_state=set_warmup(g_state.opt_state, False))
    run_phase(QAT, cfg.epochs + cfg.n_epochs_decay, "qat", start=start_epoch)
    return g_state, d_state


def train_cyclegan(cfg: GANConfig, logger):
    ds = _dataset(cfg)
    netG_A = define_g(ngf=cfg.ngf, netG=cfg.netG, quantized=True)
    netG_B = define_g(ngf=cfg.ngf, netG=cfg.netG, quantized=True)
    netD_A = define_d(ndf=cfg.ndf, netD=cfg.netD, n_layers=cfg.n_layers_d,
                      norm=cfg.norm or "none")
    netD_B = define_d(ndf=cfg.ndf, netD=cfg.netD, n_layers=cfg.n_layers_d,
                      norm=cfg.norm or "none")
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((cfg.batch_size, cfg.crop_size, cfg.crop_size, 3))

    lr = _gan_lr_schedule(cfg, cfg.steps_per_epoch or len(ds))
    g_tx = _g_optimizer(cfg, lr)  # joint over both generators (cycle_gan_model.py:94-95)
    gA = make_net_state(netG_A, g_tx, rng, sample, init_kwargs={"mode": QAT, "train": True})
    gB = make_net_state(netG_B, g_tx, jax.random.fold_in(rng, 1), sample,
                        init_kwargs={"mode": QAT, "train": True})
    joint_opt_state = g_tx.init((gA.params, gB.params))
    dA = make_net_state(netD_A, adam(lr, b1=cfg.beta1), rng, sample,
                        init_kwargs={"train": True})
    dB = make_net_state(netD_B, adam(lr, b1=cfg.beta1),
                        jax.random.fold_in(rng, 2), sample,
                        init_kwargs={"train": True})
    pool_a, pool_b = ImagePool(cfg.pool_size, cfg.seed), ImagePool(cfg.pool_size, cfg.seed + 1)

    resumed, start_epoch = False, 0
    meta_path = os.path.join(cfg.save_dir, "gan_meta.json")
    if cfg.continue_train and os.path.exists(os.path.join(cfg.save_dir, "latest_D_B")):
        from ..utils.checkpoint import restore_checkpoint
        gA = restore_checkpoint(os.path.join(cfg.save_dir, "latest_G_A"), gA)
        gB = restore_checkpoint(os.path.join(cfg.save_dir, "latest_G_B"), gB)
        dA = restore_checkpoint(os.path.join(cfg.save_dir, "latest_D_A"), dA)
        dB = restore_checkpoint(os.path.join(cfg.save_dir, "latest_D_B"), dB)
        joint_opt_state = restore_checkpoint(
            os.path.join(cfg.save_dir, "latest_opt_G"), joint_opt_state)
        resumed = True
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                start_epoch = json.load(f).get("qat_epoch", 0)
        logger.info(f"continue_train: restored all four nets + joint G "
                    f"optimizer from {cfg.save_dir} (qat epoch {start_epoch})")

    # dp mesh over all four nets (reference init_net DataParallel,
    # networks.py:207-208); the ImagePool stays host-side and its samples
    # re-shard on the way back in.
    mesh = make_dp_mesh(cfg.batch_size)
    gA, gB, dA, dB = (replicate(s, mesh) for s in (gA, gB, dA, dB))
    joint_opt_state = replicate(joint_opt_state, mesh)

    def run_phase(mode, epochs, tag, start=0):
        nonlocal gA, gB, dA, dB, joint_opt_state
        g_step, d_step = make_cyclegan_steps(
            netG_A, netG_B, netD_A, netD_B, mode, cfg.gan_mode,
            cfg.lambda_a, cfg.lambda_b, cfg.lambda_idt)
        for epoch in range(start, epochs):
            metrics = {}
            for i, batch in enumerate(ds):
                if cfg.steps_per_epoch and i >= cfg.steps_per_epoch:
                    break
                batch = apply_direction(batch, cfg.direction)
                batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
                gA, gB, joint_opt_state, fake_a, fake_b, mg = g_step(
                    gA, gB, dA, dB, batch, joint_opt_state)
                fb = shard_batch(pool_b.query(np.asarray(fake_b)), mesh)
                fa = shard_batch(pool_a.query(np.asarray(fake_a)), mesh)
                dA, loss_da = d_step(dA, batch["B"], fb)
                dB, loss_db = d_step(dB, batch["A"], fa)
                metrics = {**{k: float(v) for k, v in mg.items()},
                           "loss_D_A": float(loss_da), "loss_D_B": float(loss_db)}
            logger.info(f"[{tag} {epoch}] {metrics}")
            if tag == "qat" and cfg.save_epoch_freq > 0 and \
                    (epoch + 1) % cfg.save_epoch_freq == 0:
                _save_cyclegan(cfg.save_dir, gA, gB, dA, dB, joint_opt_state)
                with open(meta_path, "w") as f:
                    json.dump({"qat_epoch": epoch + 1}, f)

    if not resumed:
        run_phase(FP32, cfg.fp_epochs, "fp_warmup")
    joint_opt_state = set_warmup(joint_opt_state, False)
    run_phase(QAT, cfg.epochs + cfg.n_epochs_decay, "qat", start=start_epoch)
    return (gA, gB), (dA, dB), joint_opt_state


def _save_cyclegan(save_dir, gA, gB, dA, dB, joint_opt_state):
    """All four nets + the joint G optimizer (base_model save_networks
    covers every net; the joint opt state is ours to persist)."""
    for name, st in (("latest_G_A", gA), ("latest_G_B", gB),
                     ("latest_D_A", dA), ("latest_D_B", dB),
                     ("latest_opt_G", joint_opt_state)):
        save_checkpoint(os.path.join(save_dir, name), st)


def main(cfg: GANConfig):
    os.makedirs(cfg.save_dir, exist_ok=True)
    logger = MetricLogger(cfg.save_dir, name="gan")
    logger.info(f"config: {dataclasses.asdict(cfg)}")
    if cfg.model == "pix2pix":
        g, d = train_pix2pix(cfg, logger)
        save_checkpoint(os.path.join(cfg.save_dir, "latest_G"), g)
        save_checkpoint(os.path.join(cfg.save_dir, "latest_D"), d)
    elif cfg.model == "cycle_gan":
        (gA, gB), (dA, dB), joint_opt_state = train_cyclegan(cfg, logger)
        _save_cyclegan(cfg.save_dir, gA, gB, dA, dB, joint_opt_state)
    else:
        raise ValueError(f"unknown model {cfg.model!r}")
    logger.info("done")


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(GANConfig):
        typ = {"int": int, "float": float, "str": str, "bool": lambda s: s.lower() in ("1", "true"),
               "Optional[int]": int}.get(str(f.type), str)
        p.add_argument(f"--{f.name}", type=typ, default=None)
    args = p.parse_args()
    cfg = GANConfig()
    for f in dataclasses.fields(GANConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    main(cfg)


if __name__ == "__main__":
    cli()


# colorization support: pix2pix with L (1ch) -> ab (2ch), the reference's
# colorization dataset/model combo (data/colorization_dataset.py). Select via
# --model pix2pix --dataset colorization (data_root must hold train/ images).

"""Pix2Pix and CycleGAN training logic as jitted steps.

Re-implements Style_Transfer/models/pix2pix_model.py:120-131 (D-then-G
update with GAN + lambda*L1) and cycle_gan_model.py:183-197 (joint-G update
with cycle/identity losses, then both Ds) as explicit jitted functions over
(generator QAT state, discriminator state) pairs. Only generators carry
GradBoost/QAT (q_optim default True, train_options.py:39; Ds stay float,
networks.py:411-431).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..nn.mode import QuantMode
from ..utils.losses import l1
from .networks import gan_loss


@flax.struct.dataclass
class NetState:
    params: Any
    batch_stats: Any
    quant: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.quant:
            v["quant"] = self.quant
        return v


def make_net_state(model, tx, rng, sample, init_kwargs=None) -> NetState:
    variables = jax.jit(lambda r, x: model.init(r, x, **(init_kwargs or {})))(rng, sample)
    return NetState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        quant=variables.get("quant", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def _apply_train(model, state: NetState, x, mode, mutable_quant):
    mutable = ["batch_stats"] + (["quant"] if mutable_quant else [])
    out, updates = model.apply(state.variables, x, mode=mode, train=True,
                               mutable=mutable)
    return out, updates


def make_pix2pix_steps(netG, netD, mode: QuantMode, gan_mode: str = "lsgan",
                       lambda_l1: float = 100.0):
    """(d_step, g_step) jitted fns (pix2pix_model.py:96-131).

    batch: {"A": (B,H,W,C), "B": (B,H,W,C)}; conditional D sees cat(A, x).
    """

    def d_step(g_state: NetState, d_state: NetState, batch):
        fake_b, _ = _apply_train(netG, g_state, batch["A"], mode, mode.observe)
        fake_b = jax.lax.stop_gradient(fake_b)

        def d_loss_fn(d_params):
            dv = {**d_state.variables, "params": d_params}
            pred_fake, upd = netD.apply(dv, jnp.concatenate([batch["A"], fake_b], -1),
                                        train=True, mutable=["batch_stats"])
            pred_real, upd2 = netD.apply({**dv, **upd},
                                         jnp.concatenate([batch["A"], batch["B"]], -1),
                                         train=True, mutable=["batch_stats"])
            loss = 0.5 * (gan_loss(pred_fake, False, gan_mode) +
                          gan_loss(pred_real, True, gan_mode))
            return loss, upd2

        (loss_d, upd), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
        updates, opt_state = d_state.tx.update(grads, d_state.opt_state, d_state.params)
        d_state = d_state.replace(
            params=optax.apply_updates(d_state.params, updates),
            batch_stats=upd.get("batch_stats", d_state.batch_stats),
            opt_state=opt_state)
        return d_state, {"loss_D": loss_d}

    def g_step(g_state: NetState, d_state: NetState, batch):
        def g_loss_fn(g_params):
            gv = {**g_state.variables, "params": g_params}
            mutable = ["batch_stats"] + (["quant"] if mode.observe else [])
            fake_b, upd = netG.apply(gv, batch["A"], mode=mode, train=True,
                                     mutable=mutable)
            pred_fake = netD.apply(d_state.variables,
                                   jnp.concatenate([batch["A"], fake_b], -1))
            loss_gan = gan_loss(pred_fake, True, gan_mode)
            loss_l1 = l1(fake_b, batch["B"]) * lambda_l1
            return loss_gan + loss_l1, (upd, loss_gan, loss_l1)

        (loss_g, (upd, loss_gan, loss_l1)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params)
        updates, opt_state = g_state.tx.update(grads, g_state.opt_state, g_state.params)
        g_state = g_state.replace(
            params=optax.apply_updates(g_state.params, updates),
            batch_stats=upd.get("batch_stats", g_state.batch_stats),
            quant=upd.get("quant", g_state.quant),
            opt_state=opt_state)
        return g_state, {"loss_G": loss_g, "loss_G_GAN": loss_gan, "loss_G_L1": loss_l1}

    return jax.jit(d_step), jax.jit(g_step)


def make_cyclegan_steps(netG_A, netG_B, netD_A, netD_B, mode: QuantMode,
                        gan_mode: str = "lsgan", lambda_a: float = 10.0,
                        lambda_b: float = 10.0, lambda_idt: float = 0.5):
    """(g_step, d_step) jitted fns (cycle_gan_model.py:128-197).

    G step updates both generators jointly (one QAdam over both param trees,
    cycle_gan_model.py:94-95); D step updates both discriminators against
    pool-provided fakes.
    """

    def g_step(gA: NetState, gB: NetState, dA: NetState, dB: NetState, batch,
               joint_opt_state):
        real_a, real_b = batch["A"], batch["B"]

        def g_loss_fn(params):
            pa, pb = params
            mutable = ["batch_stats"] + (["quant"] if mode.observe else [])
            fake_b, updA = netG_A.apply({**gA.variables, "params": pa}, real_a,
                                        mode=mode, train=True, mutable=mutable)
            rec_a, updB = netG_B.apply({**gB.variables, "params": pb}, fake_b,
                                       mode=mode, train=True, mutable=mutable)
            fake_a, updB2 = netG_B.apply({**gB.variables, **updB, "params": pb},
                                         real_b, mode=mode, train=True, mutable=mutable)
            rec_b, updA2 = netG_A.apply({**gA.variables, **updA, "params": pa},
                                        fake_a, mode=mode, train=True, mutable=mutable)
            loss_gan_a = gan_loss(netD_A.apply(dA.variables, fake_b), True, gan_mode)
            loss_gan_b = gan_loss(netD_B.apply(dB.variables, fake_a), True, gan_mode)
            loss_cyc_a = l1(rec_a, real_a) * lambda_a
            loss_cyc_b = l1(rec_b, real_b) * lambda_b
            if lambda_idt > 0:
                idt_a, _ = netG_A.apply({**gA.variables, **updA2, "params": pa},
                                        real_b, mode=mode, train=True, mutable=mutable)
                idt_b, _ = netG_B.apply({**gB.variables, **updB2, "params": pb},
                                        real_a, mode=mode, train=True, mutable=mutable)
                loss_idt = (l1(idt_a, real_b) * lambda_b * lambda_idt +
                            l1(idt_b, real_a) * lambda_a * lambda_idt)
            else:
                loss_idt = 0.0
            loss = loss_gan_a + loss_gan_b + loss_cyc_a + loss_cyc_b + loss_idt
            aux = (updA2, updB2, fake_a, fake_b,
                   {"loss_G": loss, "cyc_A": loss_cyc_a, "cyc_B": loss_cyc_b})
            return loss, aux

        (_, (updA, updB, fake_a, fake_b, metrics)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)((gA.params, gB.params))
        updates, joint_opt_state = gA.tx.update(grads, joint_opt_state,
                                                (gA.params, gB.params))
        new_pa, new_pb = optax.apply_updates((gA.params, gB.params), updates)
        gA = gA.replace(params=new_pa,
                        batch_stats=updA.get("batch_stats", gA.batch_stats),
                        quant=updA.get("quant", gA.quant))
        gB = gB.replace(params=new_pb,
                        batch_stats=updB.get("batch_stats", gB.batch_stats),
                        quant=updB.get("quant", gB.quant))
        return gA, gB, joint_opt_state, fake_a, fake_b, metrics

    def d_step(d_state: NetState, real, fake):
        def d_loss_fn(d_params):
            dv = {**d_state.variables, "params": d_params}
            pred_real, upd = netD_A.apply(dv, real, train=True, mutable=["batch_stats"])
            pred_fake, upd2 = netD_A.apply({**dv, **upd}, jax.lax.stop_gradient(fake),
                                           train=True, mutable=["batch_stats"])
            loss = 0.5 * (gan_loss(pred_real, True, gan_mode) +
                          gan_loss(pred_fake, False, gan_mode))
            return loss, upd2

        (loss_d, upd), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
        updates, opt_state = d_state.tx.update(grads, d_state.opt_state, d_state.params)
        return d_state.replace(
            params=optax.apply_updates(d_state.params, updates),
            batch_stats=upd.get("batch_stats", d_state.batch_stats),
            opt_state=opt_state), loss_d

    return jax.jit(g_step), jax.jit(d_step)

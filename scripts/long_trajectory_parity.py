"""Long-horizon whole-net QAT trajectory parity run vs torch (round 5).

Extends tests/test_qat_trajectory_parity.py's 30-step whole-net instrument to
200+ SGD steps to strengthen the converged-agreement leg of the accuracy
parity argument (docs/QAT_RECIPE.md "What is and isn't proven"): both stacks
train the tiny FrostNet from a bit-synced calibrated state on memorizable
data; mid-trajectory losses are chaotic (STE-mask flips amplify 1-ulp layout
differences), but the converged tails and trained observer endpoints must
agree.

Writes runs/long_trajectory_r05.txt. CPU-only (torch is the oracle); run on a
quiet host — this is a numerics record, not a perf measurement.

Usage: JAX_PLATFORMS=cpu python scripts/long_trajectory_parity.py [steps]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".cache", "jax"))

import jax.numpy as jnp
import optax
import torch
import torch.ao.quantization as tq
import torch.nn.functional as F

from frostnet_tpu.nn import QAT

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
LR = 0.01
BS, IMG, NCLASS = 8, 64, 8


def main():
    from tests.test_torch_e2e_parity import (
        _build_calibrated_pair, _synced_variables, _torch_observer_for,
        _walk_observers)

    rng = np.random.RandomState(42)
    X = rng.randn(BS, IMG, IMG, 3).astype(np.float32)
    Y = np.arange(BS) % NCLASS

    tmodel, model, variables = _build_calibrated_pair(3)
    synced = _synced_variables(tmodel, variables)

    tmodel.train()
    tmodel.apply(tq.enable_observer)
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    xt = torch.from_numpy(X.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(Y.astype(np.int64))

    tx = optax.sgd(LR)
    opt_state = tx.init(synced["params"])
    xj, yj = jnp.asarray(X), jnp.asarray(Y)

    @jax.jit
    def step(variables, opt_state, xb, yb):
        def loss_fn(params):
            out, mutated = model.apply(
                {**variables, "params": params}, xb, mode=QAT, train=True,
                mutable=["quant", "batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, yb).mean()
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {**variables, **mutated, "params": params}, opt_state, loss

    t_losses, j_losses = [], []
    jv = dict(synced)
    for i in range(STEPS):
        topt.zero_grad()
        tl = F.cross_entropy(tmodel(xt), yt)
        tl.backward()
        topt.step()
        t_losses.append(float(tl.detach()))
        jv, opt_state, jl = step(jv, opt_state, xj, yj)
        j_losses.append(float(jl))
        if (i + 1) % 25 == 0:
            print(f"step {i+1:4d}: torch {t_losses[-1]:.5f} "
                  f"jax {j_losses[-1]:.5f}", flush=True)

    t_losses = np.asarray(t_losses)
    j_losses = np.asarray(j_losses)

    # converged tails. At this horizon both stacks memorize to ~0, so a
    # relative gap is denominator-degenerate — report absolute tail losses,
    # the absolute gap, and the steps-to-memorization crossing instead.
    t_tail = t_losses[-20:].mean()
    j_tail = j_losses[-20:].mean()

    def cross(l, frac=0.05):
        idx = np.nonzero(l < frac * l[0])[0]
        return int(idx[0]) if len(idx) else -1

    # trained observer agreement
    worst, worst_path = 0.0, None
    for path, obs in _walk_observers(jv["quant"]):
        tobs = _torch_observer_for(tmodel, path)
        t_lo, t_hi = float(tobs.min_val), float(tobs.max_val)
        span = max(t_hi - t_lo, 1e-3)
        rel = max(abs(float(obs.min_val) - t_lo),
                  abs(float(obs.max_val) - t_hi)) / span
        if rel > worst:
            worst, worst_path = rel, path

    marks = [25, 50, 100, 150, STEPS] if STEPS >= 150 else [STEPS]
    lines = [
        f"Long-horizon whole-net QAT trajectory parity (round 5)",
        f"model: tiny FrostNet small/0.35 quantized, {NCLASS} classes, "
        f"full-batch SGD lr={LR}, {STEPS} steps, memorizable labels",
        f"initial loss: torch {t_losses[0]:.4f} jax {j_losses[0]:.4f}",
        "checkpoints (step: torch / jax loss): " + "  ".join(
            f"{m}: {t_losses[m-1]:.2e}/{j_losses[m-1]:.2e}" for m in marks),
        f"tail mean (last 20): torch {t_tail:.2e} jax {j_tail:.2e} "
        f"abs gap {abs(j_tail - t_tail):.2e}",
        f"steps to memorize (<5% of initial): torch {cross(t_losses)} "
        f"jax {cross(j_losses)}",
        f"worst trained-observer endpoint drift: {worst:.4f} of span "
        f"at {worst_path}",
        "(mid-descent per-step losses are chaos-bounded and NOT compared — "
        "see tests/test_qat_trajectory_parity.py; the converged tail, the "
        "memorization crossing, and the trained observer endpoints are "
        "the claims)",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    with open(os.path.join(REPO, "runs", "long_trajectory_r05.txt"), "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()

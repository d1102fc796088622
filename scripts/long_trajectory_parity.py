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

    # converged tails
    t_tail = t_losses[-20:].mean()
    j_tail = j_losses[-20:].mean()
    tail_rel = abs(j_tail - t_tail) / max(t_tail, 1e-9)

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

    lines = [
        f"Long-horizon whole-net QAT trajectory parity (round 5)",
        f"model: tiny FrostNet small/0.35 quantized, {NCLASS} classes, "
        f"full-batch SGD lr={LR}, {STEPS} steps, memorizable labels",
        f"initial loss: torch {t_losses[0]:.4f} jax {j_losses[0]:.4f}",
        f"final loss:   torch {t_losses[-1]:.6f} jax {j_losses[-1]:.6f}",
        f"tail mean (last 20): torch {t_tail:.6f} jax {j_tail:.6f} "
        f"rel gap {tail_rel:.4f}",
        f"memorization: torch final/initial {t_losses[-1]/t_losses[0]:.5f}, "
        f"jax {j_losses[-1]/j_losses[0]:.5f}",
        f"worst trained-observer endpoint drift: {worst:.4f} of span "
        f"at {worst_path}",
        f"per-step loss rel gap: median "
        f"{np.median(np.abs(j_losses-t_losses)/np.maximum(t_losses,1e-9)):.4f}"
        f", max {np.max(np.abs(j_losses-t_losses)/np.maximum(t_losses,1e-9)):.4f}"
        f" (mid-descent chaos is expected; the tail is the claim)",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    with open(os.path.join(REPO, "runs", "long_trajectory_r05.txt"), "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()

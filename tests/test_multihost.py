"""Multi-host and tensor-parallel correctness.

1. A real 2-process ``jax.distributed`` run (localhost coordinator, one CPU
   device per process) driving one dp train step through
   ``frostnet_tpu.parallel.multihost`` — the multi-node path the reference
   reaches via timm's DDP launcher (training_commands.txt:1-19).
2. mp=2 vs mp=1 numerics: the tensor-parallel sharding must not change the
   math — one QAT train step from identical state/batch yields the same loss
   and the same updated params on a (8,1) and a (4,2) mesh.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(port):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)
    ]
    outs, errs, rcs = [], [], []
    for p in procs:
        out, err = p.communicate(timeout=900)
        outs.append(out)
        errs.append(err)
        rcs.append(p.returncode)
    return outs, errs, rcs


def test_two_process_distributed_train_step():
    # Gloo's key-value/connect handshakes run on fixed ~30s deadlines; under
    # heavy CPU contention (e.g. the full suite) a worker can miss one and
    # die, so allow retries on fresh ports before judging.
    for attempt in range(3):
        outs, errs, rcs = _spawn_workers(_free_port())
        if rcs == [0, 0]:
            break
    if rcs != [0, 0]:
        # surface the tails so in-suite failures are diagnosable
        tails = "\n===\n".join(e[-2000:] for e in errs)
        raise AssertionError(f"workers failed {attempt + 1} times: rcs={rcs}\n{tails}")
    losses = [
        [line for line in o.splitlines() if line.startswith("LOSS")][0]
        for o in outs
    ]
    steps = [
        [line for line in o.splitlines() if line.startswith("STEP")][0]
        for o in outs
    ]
    assert losses[0] == losses[1], losses    # same global loss on both hosts
    assert steps == ["STEP 1", "STEP 1"]
    loss = float(losses[0].split()[1])
    assert np.isfinite(loss) and loss > 0


_WARM_STATE = {}


def _warm_state(model, tx):
    """A common 5-step pre-trained state (computed once, single layout).

    Warm BN/observer statistics matter: at RANDOM init a dead-ReLU channel
    gives ~0 batch variance and the BN backward multiplies by
    rsqrt(eps)≈316, so ANY partial-sum regrouping (a new mesh axis) moves
    depthwise-kernel grads at the 1e-1 level. After a few real steps the
    statistics are healthy and the layout comparison can be tight.
    """
    if "state" in _WARM_STATE:
        return _WARM_STATE["state"]
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.train import create_train_state, make_train_step

    sample = jnp.zeros((8, 16, 16, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    state = state.start_qat()
    step = make_train_step(model, QAT, num_classes=8, donate=False)
    rng = np.random.RandomState(7)
    for _ in range(5):
        batch = {"image": jnp.asarray((0.5 * rng.randn(8, 16, 16, 3)).astype(np.float32)),
                 "label": jnp.asarray(rng.randint(0, 8, 8).astype(np.int32))}
        state, _ = step(state, batch)
    _WARM_STATE["state"] = jax.device_get(state)
    return _WARM_STATE["state"]


def _mp_run(mp: int):
    """One QAT train step + QAT_FROZEN eval forward on a (dp=4, mp) mesh,
    starting from the SAME warm pre-trained state (see _warm_state).

    dp is held FIXED at 4 so the batch partitioning (and its floating-point
    reduction order) is identical between runs: a different dp extent changes
    partial-sum grouping. With dp fixed, the ONLY difference is the
    tensor-parallel sharding under test.
    """
    from frostnet_tpu.models.frostnet import FrostNet
    from frostnet_tpu.nn import QAT, QAT_FROZEN
    from frostnet_tpu.optim import get_optimizer
    from frostnet_tpu.parallel import (make_mesh, replicate, shard_batch,
                                       shard_params_for_mp)
    from frostnet_tpu.train import make_train_step

    mesh = make_mesh(dp=4, mp=mp, devices=jax.devices()[:4 * mp])
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=8)
    tx = get_optimizer("QSGD", 1e-3)
    state = _warm_state(model, tx)
    state = state.replace(
        params=shard_params_for_mp(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        quant=replicate(state.quant, mesh),
        opt_state=replicate(state.opt_state, mesh),
    ).start_qat()

    rng = np.random.RandomState(1)
    batch = shard_batch(
        {"image": (0.5 * rng.randn(8, 16, 16, 3)).astype(np.float32),
         "label": rng.randint(0, 8, 8).astype(np.int32)}, mesh)
    with mesh:
        qat_step = make_train_step(model, QAT, num_classes=8, donate=False)
        state, metrics = qat_step(state, batch)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "quant": state.quant}, batch["image"], mode=QAT_FROZEN)
        jax.block_until_ready(logits)
    return {
        "qat_loss": float(metrics["loss"]),
        "params": jax.tree.map(np.asarray, state.params),
        "quant": jax.tree.map(np.asarray, state.quant),
        "eval_logits": np.asarray(logits),
    }


def test_mp2_matches_mp1_numerics():
    """Tensor-parallel sharding must not change the math: one QAT train step
    and the frozen eval from identical state/batch agree between mp=1 and
    mp=2 (same dp=4 batch layout)."""
    r1 = _mp_run(mp=1)
    r2 = _mp_run(mp=2)
    assert np.isclose(r1["qat_loss"], r2["qat_loss"], rtol=1e-6), (
        r1["qat_loss"], r2["qat_loss"])
    # the post-step forward is the serving contract — bit-close
    np.testing.assert_allclose(r1["eval_logits"], r2["eval_logits"],
                               atol=1e-5)
    # One tolerance band for EVERY leaf — the warm start makes this possible
    # (round 2 needed a 150%-relative carve-out for layer*/conv2 depthwise
    # kernels because random-init BN backward is ill-conditioned; from the
    # warm state the measured worst kernel divergence is <1e-6 relative and
    # only near-zero reduce_conv BN biases move at the 1e-4 absolute level).
    for key in ("params", "quant"):
        flat1 = jax.tree_util.tree_flatten_with_path(r1[key])[0]
        flat2 = jax.tree.leaves(r2[key])
        assert len(flat1) == len(flat2)
        for (path, a), b in zip(flat1, flat2):
            pathstr = "/".join(str(getattr(k, "key", k)) for k in path)
            scale = max(float(np.abs(a).max()), 1.0)
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                       err_msg=f"{key}:{pathstr}")

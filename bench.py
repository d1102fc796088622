"""Benchmark: FrostNet-1.0 (large) QAT training throughput, images/sec/chip.

This is the BASELINE.json headline metric: fake-quant (QAT) train-step
throughput at 224x224 on real TPU. Synthetic data is staged with the
prefetch pipeline so only the device hot loop is measured.

``vs_baseline`` normalizes against the BASELINE.md target "≥2× A100-eager
QAT images/sec/chip": no A100 figure exists in the reference repo, so we use
a documented estimate A100_EAGER_QAT = 950 img/s for FrostNet-1.0-scale
eager-mode PyTorch QAT (per-module FakeQuantize graph, fp32 eager, bs 384)
-> target = 1900 img/s; vs_baseline = measured / target (>1.0 beats it).
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

A100_EAGER_QAT_IMG_S = 950.0
TARGET = 2.0 * A100_EAGER_QAT_IMG_S

BATCH = int(os.environ.get("BENCH_BATCH", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
IMAGE = 224


def _wait_for_device(max_probes: int = 8, sleep_s: int = 60) -> None:
    """The axon tunnel periodically degrades for minutes at a time; probe it
    in a killable subprocess so a transient outage delays the bench instead
    of hanging it. Proceeds after the retry budget either way."""
    import subprocess
    import sys

    for _ in range(max_probes):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=90, capture_output=True, text=True)
            if r.returncode == 0 and r.stdout.strip():
                return
        except subprocess.TimeoutExpired:
            pass
        time.sleep(sleep_s)


def main():
    _wait_for_device()
    from frostnet_tpu.models import create_model
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
    from frostnet_tpu.parallel import make_mesh, replicate, shard_batch
    from frostnet_tpu.train import create_train_state, make_train_step

    n_chips = jax.device_count()
    model = create_model("frostnet_quant_large_1_0", num_classes=1000,
                         dtype=jnp.bfloat16)
    tx = get_optimizer("QSGD", 0.04, weight_decay=grouped_weight_decay(4e-5))

    sample = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    batch = {"image": jnp.ones((BATCH, IMAGE, IMAGE, 3), jnp.float32),
             "label": jnp.zeros((BATCH,), jnp.int32)}
    if n_chips > 1:
        # multi-chip: dp-shard the batch, replicate state over the mesh.
        # (single-chip skips NamedSharding entirely — the axon single-device
        # path executes sharding-annotated programs an order of magnitude
        # slower, measured r1.)
        mesh = make_mesh()
        state = state.replace(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            quant=replicate(state.quant, mesh),
            opt_state=replicate(state.opt_state, mesh),
        )
        batch = shard_batch(batch, mesh)
    state = state.start_qat()

    step = make_train_step(model, QAT, num_classes=1000)
    state, _ = step(state, batch)  # compile + 1 step
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    img_s_chip = BATCH * STEPS / dt / n_chips
    print(json.dumps({
        "metric": "frostnet_large_1_0 QAT train throughput (224x224, bf16 compute)",
        "value": round(img_s_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s_chip / TARGET, 3),
    }))


if __name__ == "__main__":
    main()

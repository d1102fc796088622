"""Benchmark: FrostNet-1.0 (large) QAT training throughput, images/sec/chip.

This is the BASELINE.json headline metric: fake-quant (QAT) train-step
throughput at 224x224 on real TPU. Synthetic data is staged on device so
only the device hot loop is measured.

``vs_baseline`` normalizes against the BASELINE.md target "≥2x A100-eager
QAT images/sec/chip": no A100 figure exists in the reference repo, so we use
a documented estimate A100_EAGER_QAT = 950 img/s for FrostNet-1.0-scale
eager-mode PyTorch QAT (per-module FakeQuantize graph, fp32 eager, bs 384)
-> target = 1900 img/s; vs_baseline = measured / target (>1.0 beats it).

Robustness contract (round-2 fix for BENCH_r01 rc=124/parsed=null):
- ALWAYS prints exactly one JSON line, even on tunnel outage / cold compile /
  crash. Degraded runs emit {"value": 0, "degraded": true, "reason": ...}.
- A watchdog hard-caps wall clock at BENCH_BUDGET_S (default 420 s) and
  emits the degraded line before exiting.
- The compile cache lives in bench_cache/jax (on disk, gitignored since the
  blobs exceed GitHub file limits), so the driver's in-tree run reuses the
  TPU executables pre-warmed here (fresh remote compiles take minutes; warm
  ones take seconds). A fresh clone starts cold: the first run may emit the
  degraded line once while the cache warms.
"""
import json
import os
import subprocess
import sys
import threading
import time

START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 420))

A100_EAGER_QAT_IMG_S = 950.0
TARGET = 2.0 * A100_EAGER_QAT_IMG_S

BATCH = int(os.environ.get("BENCH_BATCH", 256))  # honest sweep: 256 > 512 (3.0k vs 2.8k img/s)
_R = os.environ.get("BENCH_REMAT", "0")  # 0 | 1/full | conv_outs (A/B knob)
REMAT = {"0": False, "1": True, "full": True}.get(_R, _R)
STEPS = int(os.environ.get("BENCH_STEPS", 30))
REPS = int(os.environ.get("BENCH_REPS", 3))  # report best-of-N: host/tunnel
IMAGE = 224                                  # contention skews single reps
                                             # (r1's "bs384 cliff" was that)

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, "bench_cache", "jax"))
os.environ["JAX_COMPILATION_CACHE_DIR"] = CACHE

_emitted = threading.Event()
_best_so_far = [0.0]  # updated after each completed rep; watchdog fallback


def emit(value: float, vs_baseline: float, **extra) -> None:
    """Print the one driver-visible JSON line (at most once)."""
    if _emitted.is_set():
        return
    _emitted.set()
    rec = {
        "metric": "frostnet_large_1_0 QAT train throughput (224x224, bf16 compute)",
        "value": value,
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
        "timing": f"best_of_{REPS}_reps, chained steps + host readback",
    }
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _watchdog() -> None:
    remaining = BUDGET_S - (time.monotonic() - START)
    if remaining > 0:
        time.sleep(remaining)
    best = _best_so_far[0]
    emit(round(best, 1), round(best / TARGET, 3), degraded=True,
         reason=f"wall-clock budget {BUDGET_S:.0f}s exceeded "
                f"({'partial measurement' if best else 'tunnel degraded or cold compile'})")
    # os._exit fires even if the main thread is stuck inside a C call
    # (hung jax.devices() during a tunnel outage).
    os._exit(0)


def _probe_device(probes: int = 2, timeout_s: int = 45, sleep_s: int = 15) -> bool:
    """The axon tunnel periodically degrades; probe in a killable subprocess
    so an outage fails fast instead of hanging the bench."""
    for i in range(probes):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=timeout_s, capture_output=True, text=True)
            if r.returncode == 0 and r.stdout.strip():
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < probes:
            time.sleep(sleep_s)
    return False


def main() -> None:
    if not _probe_device():
        emit(0.0, 0.0, degraded=True, reason="TPU unreachable after probes")
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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

    step = make_train_step(model, QAT, num_classes=1000, remat=REMAT)
    state, _ = step(state, batch)  # compile + 1 step
    jax.block_until_ready(state.params)

    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = step(state, batch)
        # HONEST timing requires a host readback of a value that depends on
        # the final step: through this host's device transport,
        # block_until_ready returns before execution finishes (measured: a
        # chained-matmul loop "achieved" 34 PFLOPS under block_until_ready
        # vs 191 TFLOPS ≈ v5e peak with readback).
        float(metrics["loss"])
        best = max(best, BATCH * STEPS / (time.perf_counter() - t0))
        _best_so_far[0] = best / n_chips

    img_s_chip = best / n_chips
    emit(round(img_s_chip, 1), round(img_s_chip / TARGET, 3))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the JSON line must always land
        emit(0.0, 0.0, degraded=True,
             reason=f"{type(e).__name__}: {e}"[:300])
    raise SystemExit(0)

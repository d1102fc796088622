"""Profiling & tracing.

The reference has wall-clock timers only (SURVEY.md §5.1). Here:
  * :class:`StepTimer` — steady-state step timing with device sync;
  * :func:`chain_time` — the repo's one honest micro/serving timing helper;
  * :func:`trace` — context manager around jax.profiler (perfetto/tensorboard
    trace of the XLA timeline, the real TPU tracing story);
  * :func:`device_memory_stats` — per-device HBM usage snapshot.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


class StepTimer:
    """Wall-clock step timer that ignores the first (compile) steps."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.count = -skip_first
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > 0:
            self.total += dt

    @property
    def mean_s(self) -> float:
        return self.total / max(self.count, 1)


def chain_time(fn, x, *rest, steps: int = 10, inner: int = 1, reps: int = 3,
               feedback: str = "element") -> float:
    """Honestly time ``fn(x, *rest)`` on this transport; returns s/call.

    On the axon transport ``jax.block_until_ready`` returns BEFORE execution
    finishes (CLAUDE.md), so naive loops measure dispatch. This helper chains
    ``steps * inner`` serialized calls on device inside one jitted program and
    reads back ONE scalar that data-depends on the final call — the only
    timing methodology that has survived audit in this repo. ``inner``
    unrolled calls per ``fori_loop`` iteration amortize the transport's
    ~0.9 ms/iteration floor.

    ``feedback`` picks how each call's output feeds the next input:
      * ``"full"`` — the output IS the next input (requires output shape ==
        input shape). Immune to XLA dead-code narrowing and adds no extra
        traffic; use for same-shape op probes (XLA narrows a conv whose
        output is only sliced — measured, CLAUDE.md).
      * ``"element"`` — a full REDUCTION of the output is folded back into
        the carry (``carry*0 + mean(y)``) so shapes may differ (whole
        models, blocks). The mean forces every output element to be
        computed — a single-element feed (``y[0]*0``) does NOT: XLA
        constant-folds the ``*0`` and deletes the whole loop for integer
        outputs, and narrows each call to one output element for floats
        (verified in optimized HLO, round-3 review). The reduction adds one
        read pass over the output, so use this mode when the output is
        small relative to the op (models/blocks), never for op probes.

    Best-of-``reps`` is returned; callers printing results should label them
    best-of-N (ADVICE round 2).
    """
    if feedback not in ("full", "element"):
        raise ValueError(feedback)

    def chained(x0, rest_):
        def body(i, carry):
            for _ in range(inner):
                if feedback == "full":
                    carry = fn(carry, *rest_)
                else:
                    y = fn(carry, *rest_)
                    carry = carry * 0 + jnp.mean(
                        y.astype(jnp.float32)).astype(carry.dtype)
            return carry
        final = jax.lax.fori_loop(0, steps, body, x0)
        return jnp.sum(fn(final, *rest_).astype(jnp.float32))

    cfn = jax.jit(chained)
    if os.environ.get("FROSTNET_COMPILE_ONLY") == "1":
        # Prewarm mode: populate the persistent compile cache WITHOUT
        # executing. The axon tunnel's degraded mode still serves compiles
        # while large-executable loads/readbacks stall (measured round 5),
        # so a prewarm pass during an outage makes every measurement leg
        # start warm when a window opens.
        cfn.lower(x, rest).compile()
        return float("nan")
    v = float(cfn(x, rest))  # compile + warm
    assert v == v, "nan from timed fn"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(cfn(x, rest))
        best = min(best, time.perf_counter() - t0)
    return best / (steps * inner + 1)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA device trace viewable in tensorboard/perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def load_device_trace(logdir: str):
    """Load the newest perfetto trace under ``logdir`` written by
    :func:`trace` and index its metadata.

    Returns ``(events, proc, threads)``: the raw traceEvents list, a
    ``pid -> process name`` map, and a ``(pid, tid) -> thread name`` map —
    the shared plumbing for trace summarizers
    (scripts/profile_train_step.py, scripts/profile_gan_int8.py).
    Returns ``None`` if no trace file exists.
    """
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    proc: Dict = {}
    threads: Dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    return events, proc, threads


def device_memory_stats() -> Dict[str, Dict]:
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out

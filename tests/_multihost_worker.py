"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>

Each process owns one virtual CPU device; together they form a dp mesh and
run ONE QAT train step through frostnet_tpu.parallel.multihost — the
multi-node story (SURVEY.md §2.8, reference training_commands.txt DDP).
Prints "LOSS <value>" which the test asserts is identical across processes.
"""
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
# both processes live on this host; Gloo must not advertise a non-routable
# container interface or its TCP pair connect times out
os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compile cache must stay OFF here — executables loaded
# from the cache fail Gloo context init reproducibly in this jax build
# (GetKeyValue/Connect timeouts on every run; fresh compiles never do).
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import QAT
from frostnet_tpu.optim import get_optimizer
from frostnet_tpu.parallel import make_mesh, multihost
from frostnet_tpu.train import create_train_state, make_train_step

multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs, jax.process_count()
assert multihost.is_primary() == (pid == 0)

mesh = make_mesh(devices=jax.devices())  # dp = nprocs, mp = 1

model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=8)
tx = get_optimizer("QSGD", 0.01)
GLOBAL_BATCH = 4 * nprocs
sample = jnp.zeros((GLOBAL_BATCH, 16, 16, 3), jnp.float32)
state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
state = state.start_qat()

# replicate state globally (every process computed identical values)
state = jax.tree.map(
    lambda x: multihost_utils.host_local_array_to_global_array(x, mesh, P())
    if hasattr(x, "shape") else x, state)

# dp-shard the global batch: every process materializes the full batch and
# contributes its local slice (multihost.local_batch_slice)
rng = np.random.RandomState(0)
full = {"image": rng.randn(GLOBAL_BATCH, 16, 16, 3).astype(np.float32),
        "label": rng.randint(0, 8, GLOBAL_BATCH).astype(np.int32)}
sl = multihost.local_batch_slice(GLOBAL_BATCH)
sharding = NamedSharding(mesh, P("dp"))
batch = {
    k: jax.make_array_from_process_local_data(sharding, v[sl],
                                              global_shape=v.shape)
    for k, v in full.items()
}

with mesh:
    step = make_train_step(model, QAT, num_classes=8, donate=False)
    # compile is process-local and its duration varies (cold cache, CPU
    # contention); Gloo's key-value init times out at 30s, so barrier-sync
    # the processes between compile and the first collective execution.
    compiled = step.lower(state, batch).compile()
    multihost_utils.sync_global_devices("compiled")
    # Gloo's first collective sets up TCP pairs under a fixed ~30s deadline;
    # a scheduler stall on either side can miss it. Sync and retry once —
    # a successful clique is cached for subsequent steps.
    for attempt in range(2):
        try:
            state, metrics = compiled(state, batch)
            jax.block_until_ready(metrics)
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 1:
                raise
            print(f"first collective failed ({type(e).__name__}); retrying",
                  file=sys.stderr, flush=True)
            multihost_utils.sync_global_devices("retry")

# psum-produced metrics are fully replicated -> scalar conversion is legal
print(f"LOSS {float(metrics['loss']):.6f}", flush=True)
print(f"STEP {int(state.step)}", flush=True)

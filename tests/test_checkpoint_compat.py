"""Evaluator checkpoint loading: restore_model_variables must load model
variables from a checkpoint saved by a trainer with a DIFFERENT optimizer
chain (the trainer uses LR-schedule transforms whose opt_state tree differs
from the evaluator's constant-lr chain — a full-tree restore rejects that)."""
import numpy as np
import jax
import jax.numpy as jnp

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import QAT
from frostnet_tpu.optim import get_lr_scheduler, get_optimizer, grouped_weight_decay
from frostnet_tpu.train import create_train_state
from frostnet_tpu.utils.checkpoint import restore_model_variables, save_checkpoint


def test_eval_restore_across_optimizer_chains(tmp_path):
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=4)
    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)

    # trainer-side state: schedule + grouped weight decay (the real recipe)
    sched = get_lr_scheduler("cos_lr", base_lr=0.04, total_steps=100)
    train_tx = get_optimizer("QSGD", sched,
                             weight_decay=grouped_weight_decay(4e-5))
    tstate = create_train_state(model, train_tx, jax.random.PRNGKey(0), sample,
                                init_kwargs={"mode": QAT, "train": True})
    tstate = tstate.replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path / "ckpt"), tstate)

    # evaluator-side template: plain constant-lr chain (different opt_state)
    estate = create_train_state(model, get_optimizer("QSGD", 1e-3),
                                jax.random.PRNGKey(1), sample,
                                init_kwargs={"mode": QAT, "train": True})
    restored = restore_model_variables(str(tmp_path / "ckpt"), estate)

    for a, b in zip(jax.tree.leaves(tstate.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(tstate.quant),
                    jax.tree.leaves(restored.quant)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 7
    # evaluator's own optimizer state untouched
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        estate.opt_state)

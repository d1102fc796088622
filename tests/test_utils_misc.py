"""Unit tests for small utilities: losses (vs torch), metrics, ImagePool,
ReduceLROnPlateau, checkpoint round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from frostnet_tpu.gan.image_pool import ImagePool
from frostnet_tpu.optim import ReduceLROnPlateau
from frostnet_tpu.utils.losses import cross_entropy, smooth_l1
from frostnet_tpu.utils.metrics import (
    AverageMeter,
    confusion_matrix,
    miou_from_confusion,
    topk_accuracy,
)


def test_cross_entropy_matches_torch_weighted_ignore():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 5).astype(np.float32)
    labels = np.array([0, 1, 2, 255, 4, 3])
    weights = rng.rand(5).astype(np.float32) + 0.5

    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels.astype(np.int64)),
                           weight=torch.from_numpy(weights),
                           ignore_index=255).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              class_weights=jnp.asarray(weights), ignore_index=255))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(1)
    a, b = rng.randn(20).astype(np.float32), rng.randn(20).astype(np.float32)
    want = F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b),
                            reduction="none").numpy()
    got = np.asarray(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    top1, top2 = topk_accuracy(logits, labels, (1, 2))
    assert float(top1) == 0.5
    assert float(top2) == 0.5  # class 2 is rank 2 (0-indexed last)


def test_miou_perfect_prediction():
    pred = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 8, 8)))
    cm = confusion_matrix(pred, pred, 4)
    _, miou = miou_from_confusion(cm)
    assert float(miou) == 1.0
    # ignored pixels contribute nothing
    target = pred.at[0, 0, 0].set(255)
    cm2 = confusion_matrix(pred, target, 4, ignore_index=255)
    assert int(cm2.sum()) == pred.size - 1


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert abs(m.avg - 2.0) < 1e-9


def test_image_pool_buffers_history():
    pool = ImagePool(pool_size=4, seed=0)
    first = np.ones((4, 2, 2, 3), np.float32)
    out1 = pool.query(first)
    np.testing.assert_array_equal(out1, first)  # buffer fills, passthrough
    out2 = pool.query(first * 2)
    # some returned images must come from the old buffer or the new batch
    assert out2.shape == first.shape
    vals = {float(v) for v in np.unique(out2)}
    assert vals.issubset({1.0, 2.0})


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(base_lr=1.0, factor=0.5, patience=1, threshold=0.0)
    lrs = [s.step(1.0) for _ in range(5)]
    assert lrs[0] == 1.0 and lrs[-1] < 1.0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from frostnet_tpu.optim import qsgd
    from frostnet_tpu.train.state import QATTrainState
    from frostnet_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    tx = qsgd(0.1)
    params = {"w": jnp.arange(4.0)}
    state = QATTrainState(
        step=jnp.asarray(7), params=params, batch_stats={}, quant={},
        opt_state=tx.init(params), rng=jax.random.PRNGKey(3), tx=tx)
    save_checkpoint(str(tmp_path / "ckpt"), state)

    blank = QATTrainState(
        step=jnp.asarray(0), params={"w": jnp.zeros(4)}, batch_stats={},
        quant={}, opt_state=tx.init(params), rng=jax.random.PRNGKey(0), tx=tx)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), blank)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))


def test_make_dp_mesh_divides_batch():
    """make_dp_mesh picks the LARGEST batch divisor that fits the device
    count, so the GAN trainers' reference-default batch_size=1 degrades to
    the single-device fast path instead of raising in shard_batch, while
    coprime batches still use as many devices as divide them (torch
    DataParallel's scatter-over-fewer-GPUs behavior)."""
    from frostnet_tpu.parallel import make_dp_mesh, shard_batch

    n = jax.device_count()
    assert make_dp_mesh(1).size == 1
    assert make_dp_mesh(4 * n).size == n
    if n >= 8:
        assert make_dp_mesh(6).size == 6   # gcd(6,8)=2 would waste 4 devices
        assert make_dp_mesh(12).size == 6
        assert make_dp_mesh(3).size == 3
        assert make_dp_mesh(7).size == 7
    odd = make_dp_mesh(3)
    assert 3 % odd.size == 0
    # the contract: a batch of that size actually shards
    x = jnp.zeros((3, 4))
    y = shard_batch(x, odd)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_chain_time_smoke():
    """chain_time returns a sane per-call duration in both feedback modes
    and rejects unknown modes."""
    import pytest

    from frostnet_tpu.utils.profiling import chain_time

    x = jnp.ones((8, 8), jnp.float32)
    t_full = chain_time(lambda a: a * 1.0001, x, steps=3, inner=2, reps=1,
                        feedback="full")
    t_elem = chain_time(lambda a: a.sum(keepdims=True), x, steps=3, reps=1)
    assert 0 < t_full < 10 and 0 < t_elem < 10
    with pytest.raises(ValueError):
        chain_time(lambda a: a, x, feedback="nope")


def test_seg_bce_loss_matches_torch_reference():
    """SegmentationLoss loss_type='bce' (segmentation_loss.py:15-44):
    one-hot targets with ignore pixels converted to all-zero rows, plain
    BCEWithLogitsLoss. (The reference's weight= path is latently broken —
    a (C,) weight cannot broadcast against NCHW in torch — so the oracle
    runs unweighted; our NHWC layout applies per-class weight correctly
    and that fix is documented in make_seg_train_step.)"""
    import torch
    import jax
    import jax.numpy as jnp
    import numpy as np
    from frostnet_tpu.utils.losses import binary_cross_entropy_with_logits

    rng = np.random.RandomState(0)
    n, c, h, w = 2, 5, 4, 6
    logits = rng.randn(n, h, w, c).astype(np.float32)
    label = rng.randint(0, c, (n, h, w))
    label[0, 0, :3] = 255  # ignore pixels

    onehot = jax.nn.one_hot(jnp.asarray(label), c, dtype=jnp.float32)
    ours = float(binary_cross_entropy_with_logits(jnp.asarray(logits), onehot))

    t_logits = torch.tensor(logits).permute(0, 3, 1, 2).contiguous()
    x = torch.tensor(label).clone()
    x[x == 255] = c
    x_one_hot = torch.zeros(n, c + 1, h, w).scatter_(1, x.unsqueeze(1), 1)
    target = x_one_hot[:, :c].contiguous()
    want = float(torch.nn.BCEWithLogitsLoss()(t_logits, target))
    np.testing.assert_allclose(ours, want, rtol=1e-6)


@pytest.mark.slow  # ~126 s: a short training loop
def test_seg_train_step_bce_learns_shapes():
    """loss_type='bce' wires through make_seg_train_step and yields a
    finite loss on the synthetic task."""
    import jax
    import numpy as np
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer
    from frostnet_tpu.segmentation.models import get_seg_model
    from frostnet_tpu.segmentation.train import make_seg_train_step
    from frostnet_tpu.train.state import create_train_state

    model = get_seg_model("mobilenetv3_small", num_classes=19)
    state = create_train_state(
        model, get_optimizer("QSGD", 0.01), jax.random.PRNGKey(0),
        np.zeros((2, 32, 32, 3), np.float32),
        init_kwargs={"mode": QAT, "train": True}).start_qat()
    step = make_seg_train_step(model, QAT, None, 255, 19, loss_type="bce")
    rng = np.random.RandomState(0)
    batch = {"image": rng.randn(2, 32, 32, 3).astype(np.float32),
             "label": rng.randint(0, 19, (2, 32, 32)).astype(np.int32)}
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

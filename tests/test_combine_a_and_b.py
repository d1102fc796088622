"""A/B pairing prep script -> AlignedDataset roundtrip
(reference Style_Transfer/datasets/combine_A_and_B.py:1-48)."""
import importlib.util
import os
import sys

import numpy as np
import pytest

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

_spec = importlib.util.spec_from_file_location(
    "combine_a_and_b",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "combine_a_and_b.py"))
combine = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(combine)


@pytest.fixture()
def ab_dirs(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    fa, fb = tmp_path / "A", tmp_path / "B"
    for split in ("train", "val"):
        (fa / split).mkdir(parents=True)
        (fb / split).mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
                fa / split / f"{i}.png")
            Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
                fb / split / f"{i}.png")
    return fa, fb, tmp_path / "AB"


def test_combine_writes_concatenated_pairs(ab_dirs):
    from PIL import Image

    fa, fb, fab = ab_dirs
    n = combine.main(str(fa), str(fb), str(fab))
    assert n == 6
    out = Image.open(fab / "train" / "0.png")
    assert out.size == (128, 64)  # A|B side by side
    a = np.asarray(Image.open(fa / "train" / "0.png"))
    b = np.asarray(Image.open(fb / "train" / "0.png"))
    ab = np.asarray(out)
    np.testing.assert_array_equal(ab[:, :64], a)
    np.testing.assert_array_equal(ab[:, 64:], b)


def test_combined_output_feeds_aligned_dataset(ab_dirs):
    from frostnet_tpu.gan.data import AlignedDataset

    fa, fb, fab = ab_dirs
    combine.main(str(fa), str(fb), str(fab))
    ds = AlignedDataset(str(fab), phase="train", batch_size=2,
                        load_size=40, crop_size=32)
    batch = next(iter(ds))
    assert batch["A"].shape == (2, 32, 32, 3)
    assert batch["B"].shape == (2, 32, 32, 3)
    assert batch["A"].min() >= -1.0 and batch["A"].max() <= 1.0


def test_use_ab_suffix_pairing(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    fa = tmp_path / "flat"
    fa.mkdir()
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            fa / f"{i}_A.png")
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            fa / f"{i}_B.png")
    n = combine.main(str(fa), str(fa), str(tmp_path / "out"), use_ab=True)
    assert n == 2
    assert sorted(os.listdir(tmp_path / "out")) == ["0.png", "1.png"]


def test_size_mismatch_raises_without_resize(tmp_path):
    from PIL import Image

    fa, fb = tmp_path / "a", tmp_path / "b"
    fa.mkdir(), fb.mkdir()
    Image.new("RGB", (32, 32)).save(fa / "x.png")
    Image.new("RGB", (48, 32)).save(fb / "x.png")
    with pytest.raises(ValueError, match="size mismatch"):
        combine.main(str(fa), str(fb), str(tmp_path / "o"))
    assert combine.main(str(fa), str(fb), str(tmp_path / "o"), resize_b=True) == 1


def test_prepare_cityscapes_pix2pix(tmp_path):
    """Cityscapes gtFine/leftImg8bit trees -> aligned photo|segmap pairs +
    cyclegan A/B dirs (reference prepare_cityscapes_dataset.py:28-66)."""
    from PIL import Image

    _spec2 = importlib.util.spec_from_file_location(
        "prepare_cityscapes_pix2pix",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "prepare_cityscapes_pix2pix.py"))
    prep = importlib.util.module_from_spec(_spec2)
    _spec2.loader.exec_module(prep)

    rng = np.random.RandomState(0)
    gt, li = tmp_path / "gtFine", tmp_path / "leftImg8bit"
    for phase in ("train", "val"):
        (gt / phase / "city").mkdir(parents=True)
        (li / phase / "city").mkdir(parents=True)
        for i in range(2):
            stem = f"city_{i:06d}_000019"
            Image.fromarray(rng.randint(0, 255, (128, 256, 3), np.uint8)).save(
                gt / phase / "city" / f"{stem}_gtFine_color.png")
            Image.fromarray(rng.randint(0, 255, (128, 256, 3), np.uint8)).save(
                li / phase / "city" / f"{stem}_leftImg8bit.png")

    out = tmp_path / "out"
    assert prep.process_phase(str(gt), str(li), str(out), "train", size=64) == 2
    assert prep.process_phase(str(gt), str(li), str(out), "val", size=64) == 2

    # train phase -> 'train', val -> 'test'; aligned is 2*size wide
    pair = Image.open(out / "train" / "0.jpg")
    assert pair.size == (128, 64)
    assert Image.open(out / "test" / "1.jpg").size == (128, 64)
    assert (out / "trainA" / "0_A.jpg").exists()
    assert (out / "trainB" / "0_B.jpg").exists()

    # the aligned file is consumable by the GAN AlignedDataset
    from frostnet_tpu.gan.data import AlignedDataset

    ds = AlignedDataset(str(out), phase="train", load_size=64, crop_size=32,
                       batch_size=1)
    batch = next(iter(ds))
    assert batch["A"].shape[-3:] == (32, 32, 3)

    # mismatched pair names raise
    (gt / "train" / "city" / "zzz_9_gtFine_color.png").write_bytes(
        (gt / "train" / "city" / "city_000000_000019_gtFine_color.png").read_bytes())
    (li / "train" / "city" / "aaa_0_leftImg8bit.png").write_bytes(
        (li / "train" / "city" / "city_000000_000019_leftImg8bit.png").read_bytes())
    with pytest.raises(ValueError):
        prep.process_phase(str(gt), str(li), str(out), "train", size=64)


def test_aligned_crop_and_flip_are_shared_across_ab(tmp_path):
    """The reference applies the SAME transform params to both halves
    (aligned_dataset.py:49-54); with A == B content, every sampled pair must
    come out identical — independent crops/flips would break pix2pix's
    pixel-aligned L1 target."""
    from PIL import Image
    from frostnet_tpu.gan.data import AlignedDataset

    rng = np.random.RandomState(0)
    (tmp_path / "train").mkdir()
    for i in range(4):
        half = rng.randint(0, 255, (48, 48, 3), np.uint8)
        Image.fromarray(np.concatenate([half, half], axis=1)).save(
            tmp_path / "train" / f"{i}.png")
    ds = AlignedDataset(str(tmp_path), phase="train", batch_size=2,
                        load_size=40, crop_size=24, seed=3)
    for batch in ds:
        np.testing.assert_array_equal(batch["A"], batch["B"])


def test_unaligned_a_covers_epoch_b_random(tmp_path):
    """Reference protocol (unaligned_dataset.py:51-56): A iterates a
    shuffled epoch — every A image appears exactly once per epoch at
    batch_size 1 — while B is drawn at random to avoid fixed pairs."""
    from PIL import Image
    from frostnet_tpu.gan.data import UnalignedDataset

    for side in ("A", "B"):
        (tmp_path / f"train{side}").mkdir()
    # encode the image index in a constant pixel value so we can recover
    # which file each sample came from after resize (constant images are
    # interpolation-invariant)
    for i in range(6):
        Image.fromarray(np.full((32, 32, 3), 10 + i * 20, np.uint8)).save(
            tmp_path / "trainA" / f"{i}.png")
        Image.fromarray(np.full((32, 32, 3), 15, np.uint8)).save(
            tmp_path / "trainB" / f"{i}.png")
    ds = UnalignedDataset(str(tmp_path), "train", batch_size=1,
                          load_size=16, crop_size=8, seed=0)
    seen = []
    for batch in ds:
        v = (batch["A"][0, 0, 0, 0] + 1) / 2 * 255  # undo [-1,1]
        seen.append(int(round((v - 10) / 20)))
    assert sorted(seen) == list(range(6)), seen


def test_apply_direction_swaps_domains():
    """--direction BtoA swaps which domain is the generator input
    (reference pix2pix_model.py:78-84 set_input)."""
    from frostnet_tpu.gan.data import apply_direction

    batch = {"A": np.ones(3), "B": np.zeros(3)}
    out = apply_direction(batch, "BtoA")
    np.testing.assert_array_equal(out["A"], np.zeros(3))
    np.testing.assert_array_equal(out["B"], np.ones(3))
    same = apply_direction(batch, "AtoB")
    np.testing.assert_array_equal(same["A"], np.ones(3))
    # original dict untouched (shard_batch consumes the returned one)
    np.testing.assert_array_equal(batch["A"], np.ones(3))
    with pytest.raises(ValueError):
        apply_direction(batch, "sideways")


def test_aligned_test_phase_is_serial_and_unflipped(tmp_path):
    """The reference tester hard-sets serial_batches + no_flip
    (test.py:43-44); phase='test' must yield file order, unflipped, with
    the whole frame when load_size == crop_size."""
    from PIL import Image
    from frostnet_tpu.gan.data import AlignedDataset

    (tmp_path / "test").mkdir()
    halves = []
    rng = np.random.RandomState(0)
    for i in range(3):
        half = rng.randint(0, 255, (16, 16, 3), np.uint8)
        halves.append(half)
        Image.fromarray(np.concatenate([half, half], axis=1)).save(
            tmp_path / "test" / f"{i}.png")
    ds = AlignedDataset(str(tmp_path), phase="test", batch_size=1,
                        load_size=16, crop_size=16, seed=9)
    got = [((b["A"][0] + 1) / 2 * 255) for b in ds]
    for want, have in zip(halves, got):
        np.testing.assert_allclose(have, want.astype(np.float32), atol=0.51)


def test_lab_rgb_roundtrip():
    """lab_to_rgb inverts rgb_to_lab (the skimage color.lab2rgb path the
    reference display uses, colorization_model.py:48-63)."""
    from frostnet_tpu.gan.data import lab_to_rgb, rgb_to_lab

    rng = np.random.RandomState(0)
    rgb = rng.rand(5, 7, 3).astype(np.float32)
    back = lab_to_rgb(rgb_to_lab(rgb))
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_gan_tester_colorization(tmp_path):
    """--dataset colorization runs end-to-end: 1-ch L in, 2-ch ab out,
    gallery displayed as Lab->RGB conversions (reference test.py +
    colorization_model.py)."""
    import argparse
    from PIL import Image
    from frostnet_tpu.gan import test as gan_test

    (tmp_path / "test").mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            tmp_path / "test" / f"{i}.png")
    args = argparse.Namespace(
        checkpoint=None, netG="resnet_6blocks", dataset="colorization",
        data_root=str(tmp_path), crop_size=32, num_test=1,
        direction="AtoB", results_dir=str(tmp_path / "results"),
        export_int8=None)
    gan_test.main(args)
    assert (tmp_path / "results" / "web" / "index.html").exists()
    imgs = os.listdir(tmp_path / "results" / "web" / "images")
    assert any("fake_B_int8" in f for f in imgs)


def test_gan_linear_lr_schedule_matches_lambda_rule():
    """lr_policy 'linear' (networks.py:143-147): constant for `epochs` QAT
    epochs then linear decay toward zero over n_epochs_decay; warm-up steps
    hold the base lr. Compare against the reference lambda_rule evaluated
    per epoch."""
    from frostnet_tpu.gan.train import GANConfig, _gan_lr_schedule

    cfg = GANConfig(lr=2e-4, fp_epochs=1, epochs=3, n_epochs_decay=4,
                    steps_per_epoch=5)
    sched = _gan_lr_schedule(cfg, 5)

    def lambda_rule(epoch):  # reference, epoch_count=1
        return 1.0 - max(0, epoch + 1 - cfg.epochs) / float(cfg.n_epochs_decay + 1)

    # warm-up steps: base lr
    for count in range(5):
        np.testing.assert_allclose(float(sched(count)), cfg.lr, rtol=1e-6)
    # QAT epoch e (1-based) runs at the multiplier AFTER e-1 epoch-end updates
    for e in range(1, cfg.epochs + cfg.n_epochs_decay + 1):
        count = 5 + (e - 1) * 5 + 2  # a step inside QAT epoch e
        want = cfg.lr * lambda_rule(e - 1)
        np.testing.assert_allclose(float(sched(count)), want, rtol=1e-6)
    # decay reaches 1/(n+1) of base on the last epoch, ~0 after
    assert float(sched(5 + (cfg.epochs + cfg.n_epochs_decay) * 5)) < cfg.lr * 0.21


def test_gan_trainer_accepts_decay_epochs():
    """n_epochs_decay extends QAT with the schedule threaded through qadam
    (optax schedules); one tiny pix2pix run exercises it end-to-end."""
    import jax
    from frostnet_tpu.gan.train import GANConfig, train_pix2pix
    from frostnet_tpu.utils.logging import MetricLogger

    cfg = GANConfig(dataset="synthetic", crop_size=32, batch_size=2,
                    epochs=1, fp_epochs=1, n_epochs_decay=1,
                    steps_per_epoch=2, netG="resnet_6blocks",
                    save_epoch_freq=0)  # also covers the freq-0 no-save path
    g_state, d_state = train_pix2pix(cfg, MetricLogger(None, name="t"))
    # the decay epoch actually ran: G took (fp 1 + qat 1 + decay 1) x 2
    # optimizer steps (counts live in the optax ScaleByAdam state)
    counts = [int(x) for x in jax.tree.leaves(g_state.opt_state)
              if getattr(x, "ndim", None) == 0 and x.dtype == np.int32]
    assert 6 in counts, counts


def test_gan_tester_single_dataset(tmp_path):
    """--dataset single (reference TestModel + single_dataset flow): apply
    the generator to one directory of unpaired images; visuals carry no
    real_B."""
    import argparse
    from PIL import Image
    from frostnet_tpu.gan import test as gan_test

    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            tmp_path / f"{i}.png")
    args = argparse.Namespace(
        checkpoint=None, netG="resnet_6blocks", dataset="single",
        data_root=str(tmp_path), crop_size=32, num_test=2,
        direction="AtoB", results_dir=str(tmp_path / "results"),
        export_int8=None)
    gan_test.main(args)
    imgs = os.listdir(tmp_path / "results" / "web" / "images")
    assert any("fake_B_int8" in f for f in imgs)
    assert not any("real_B" in f for f in imgs)

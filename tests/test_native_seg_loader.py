"""Native C++ segmentation loader (frostnet_tpu/native/dataloader.cpp
fnsl_* ABI): paired PNG/JPEG decode + synchronized augmentation, mirroring
the reference Semantic_Segmentation/utilities/data_transforms.py:18-166
pipeline. Also covers the VOC val-resize protocol fix (voc.py:71-77)."""
import os

import numpy as np
import pytest

from PIL import Image

pytest.importorskip("frostnet_tpu.native")
from frostnet_tpu.native import NativeSegmentationLoader  # noqa: E402

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow


def _write_pairs(d, n=8, size=(40, 60), classes=19, img_fmt="png"):
    rng = np.random.RandomState(0)
    imgs, masks, pi, pm = [], [], [], []
    for i in range(n):
        img = rng.randint(0, 255, (*size, 3), np.uint8)
        mask = rng.randint(0, classes, size, np.uint8)
        a = os.path.join(d, f"img{i}.{img_fmt}")
        b = os.path.join(d, f"mask{i}.png")
        Image.fromarray(img).save(a)
        Image.fromarray(mask).save(b)
        imgs.append(img), masks.append(mask), pi.append(a), pm.append(b)
    return imgs, masks, pi, pm


def test_eval_identity_at_native_resolution(tmp_path):
    imgs, masks, pi, pm = _write_pairs(str(tmp_path))
    ld = NativeSegmentationLoader(pi, pm, crop_size=(40, 60), batch_size=4,
                                  train=False, threads=1, seed=1)
    got = list(ld)
    assert len(got) == len(ld) == 2
    gi = np.concatenate([b["image"] for b in got])
    gm = np.concatenate([b["label"] for b in got])
    assert gi.dtype == np.uint8 and gm.dtype == np.int32
    # whole-frame resize to the source resolution is the identity, and
    # eval order is the file order (threads=1 keeps completion order too)
    np.testing.assert_array_equal(gi, np.stack(imgs))
    np.testing.assert_array_equal(gm, np.stack(masks))


def test_palette_mask_decodes_to_class_indices(tmp_path):
    # VOC-style palettized mask: the PALETTE INDEX is the class id; decoding
    # must keep indices, never expand to RGB
    mask = np.zeros((20, 20), np.uint8)
    mask[5:15, 5:15] = 7
    mask[0, :] = 255  # boundary/ignore
    pal = Image.fromarray(mask, mode="P")
    pal.putpalette([(i * 37) % 256 for i in range(768)])
    pal.save(tmp_path / "mask0.png")
    Image.fromarray(np.full((20, 20, 3), 128, np.uint8)).save(tmp_path / "img0.png")
    ld = NativeSegmentationLoader([str(tmp_path / "img0.png")],
                                  [str(tmp_path / "mask0.png")],
                                  crop_size=(20, 20), batch_size=1,
                                  train=False, threads=1)
    got = next(iter(ld))["label"][0]
    np.testing.assert_array_equal(got, mask.astype(np.int32))


def test_jpeg_image_png_mask_pair(tmp_path):
    # the VOC layout: JPEG photos + PNG masks. Smooth gradients survive
    # JPEG nearly losslessly (noise images do not — that would test the
    # codec, not the loader).
    yy, xx = np.mgrid[0:40, 0:60]
    imgs, pi, pm, masks = [], [], [], []
    rng = np.random.RandomState(0)
    for i in range(2):
        img = np.stack([(yy * 4 + i * 30) % 256, (xx * 3) % 256,
                        ((yy + xx) * 2) % 256], -1).astype(np.uint8)
        mask = rng.randint(0, 21, (40, 60), np.uint8)
        a, b = os.path.join(tmp_path, f"i{i}.jpg"), os.path.join(tmp_path, f"m{i}.png")
        Image.fromarray(img).save(a, quality=95)
        Image.fromarray(mask).save(b)
        imgs.append(img), pi.append(a), pm.append(b), masks.append(mask)
    ld = NativeSegmentationLoader(pi, pm, crop_size=(40, 60), batch_size=2,
                                  train=False, threads=1)
    got = next(iter(ld))
    diff = np.abs(got["image"].astype(int) - np.stack(imgs).astype(int))
    assert diff.mean() < 6, diff.mean()
    np.testing.assert_array_equal(got["label"], np.stack(masks).astype(np.int32))


def test_train_augmentation_semantics(tmp_path):
    imgs, masks, pi, pm = _write_pairs(str(tmp_path), size=(30, 30))
    ld = NativeSegmentationLoader(pi, pm, crop_size=(48, 48), batch_size=4,
                                  train=True, threads=2, seed=3,
                                  scale=(0.5, 2.0), ignore=255)
    seen_ignore = False
    n = 0
    for b in ld:
        n += 1
        assert b["image"].shape == (4, 48, 48, 3)
        assert b["label"].shape == (4, 48, 48)
        vals = set(np.unique(b["label"]).tolist())
        assert vals <= set(range(19)) | {255}, vals
        seen_ignore |= 255 in vals
        # pad pixels are (image 0, mask ignore) — wherever the mask is
        # ignore in the pad region the image must be black. Padding occurs
        # when the scaled 30x30 source is smaller than the 48x48 crop.
        m = b["label"] == 255
        assert (b["image"][m] == 0).all()
    assert n == 2
    assert seen_ignore  # crop 48 > source 30 guarantees padding happened


def test_mask_geometry_tracks_image(tmp_path):
    # a half-red / half-blue image with mask 1 on the red half: after any
    # train aug, red pixels must still carry class 1 and blue pixels class 2
    # (flip/scale/crop are synchronized; boundary pixels are interpolated so
    # test only saturated pixels)
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :16, 0] = 255
    img[:, 16:, 2] = 255
    mask = np.where(np.arange(32)[None, :] < 16, 1, 2).astype(np.uint8)
    mask = np.broadcast_to(mask, (32, 32)).copy()
    Image.fromarray(img).save(tmp_path / "i.png")
    Image.fromarray(mask).save(tmp_path / "m.png")
    ld = NativeSegmentationLoader([str(tmp_path / "i.png")] * 4,
                                  [str(tmp_path / "m.png")] * 4,
                                  crop_size=(24, 24), batch_size=4,
                                  train=True, threads=1, seed=11)
    b = next(iter(ld))
    red = b["image"][..., 0] == 255
    blue = b["image"][..., 2] == 255
    assert red.any() and blue.any()
    assert (b["label"][red] == 1).all()
    assert (b["label"][blue] == 2).all()


def test_trainer_native_loader_wiring(tmp_path):
    # cityscapes-style file-list tree consumed through build_seg_dataset,
    # driving one real uint8 QAT train step (device-side normalization)
    import jax
    from frostnet_tpu.nn import QAT
    from frostnet_tpu.optim import get_optimizer
    from frostnet_tpu.segmentation.train import (
        SegConfig, build_seg_dataset, make_seg_train_step)
    from frostnet_tpu.segmentation.models import get_seg_model
    from frostnet_tpu.train.state import create_train_state

    _, _, pi, pm = _write_pairs(str(tmp_path), n=4, size=(40, 40))
    with open(tmp_path / "train.txt", "w") as f:
        for a, b in zip(pi, pm):
            f.write(f"{os.path.basename(a)},{os.path.basename(b)}\n")
    cfg = SegConfig(dataset="city", data_dir=str(tmp_path), loader="native",
                    num_classes=19, crop_size=32, batch_size=2)
    ds = build_seg_dataset(cfg, train=True)
    assert isinstance(ds, NativeSegmentationLoader)
    batch = next(iter(ds))
    assert batch["image"].dtype == np.uint8

    model = get_seg_model("mobilenetv3_small", num_classes=19)
    state = create_train_state(
        model, get_optimizer("QSGD", 0.01), jax.random.PRNGKey(0),
        np.zeros((2, 32, 32, 3), np.float32),
        init_kwargs={"mode": QAT, "train": True}).start_qat()
    step = make_seg_train_step(model, QAT, None, 255, 19)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_voc_val_resizes_variable_size_images(tmp_path):
    # reference voc.py val protocol: Resize to crop_size — also what makes
    # fixed-shape batching possible with VOC's variable image sizes
    from frostnet_tpu.segmentation.data import VOCSegmentation

    base = tmp_path / "VOC2012"
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "SegmentationClass").mkdir()
    rng = np.random.RandomState(0)
    for name, size in (("a", (41, 53)), ("b", (67, 31))):
        Image.fromarray(rng.randint(0, 255, (*size, 3), np.uint8)).save(
            base / "JPEGImages" / f"{name}.jpg")
        Image.fromarray(rng.randint(0, 21, size, np.uint8)).save(
            base / "SegmentationClass" / f"{name}.png")
    with open(base / "ImageSets" / "Segmentation" / "val.txt", "w") as f:
        f.write("a\nb\n")
    ds = VOCSegmentation(str(tmp_path), train=False, crop_size=(24, 24),
                         batch_size=2)
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 24, 24, 3)
    assert batch["label"].shape == (2, 24, 24)
    assert set(np.unique(batch["label"])) <= set(range(21)) | {255}


def test_corrupt_and_missing_files_degrade_not_crash(tmp_path):
    """libjpeg/libpng failures longjmp back and the item degrades to a
    zero image / ignore mask instead of killing the worker (NATIVE.md
    failure containment)."""
    imgs, masks, pi, pm = _write_pairs(str(tmp_path), n=4, size=(20, 20))
    # corrupt one image (truncate), point one mask at a missing file
    with open(pi[1], "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n\x00\x00")  # valid signature, garbage body
    pm[2] = str(tmp_path / "missing.png")
    ld = NativeSegmentationLoader(pi, pm, crop_size=(20, 20), batch_size=4,
                                  train=False, threads=1, seed=0)
    b = next(iter(ld))
    # item 1 (bad image) and item 2 (missing mask) degrade to zero/ignore
    for i in (1, 2):
        assert (b["image"][i] == 0).all()
        assert (b["label"][i] == 255).all()
    # intact items decode normally
    np.testing.assert_array_equal(b["image"][0], imgs[0])
    np.testing.assert_array_equal(b["label"][3], masks[3].astype(np.int32))

"""VOC segmentation wiring: file-list parsing, COCO-as-VOC union, trainer
dispatch (reference Semantic_Segmentation/train.py:39-66,
data_loader/segmentation/voc.py:13-108)."""
import numpy as np
import pytest

from frostnet_tpu.segmentation import VOCSegmentation
from frostnet_tpu.segmentation.train import (SegConfig, build_seg_dataset,
                                             resolve_dataset_defaults)


@pytest.fixture()
def voc_root(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    base = tmp_path / "VOC2012"
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "SegmentationClass").mkdir()
    ids = {"train": [f"tr_{i}" for i in range(6)],
           "val": [f"va_{i}" for i in range(4)]}
    for split, names in ids.items():
        with open(base / "ImageSets" / "Segmentation" / f"{split}.txt", "w") as f:
            f.write("\n".join(names) + "\n")
        for n in names:
            Image.fromarray(
                rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
                base / "JPEGImages" / f"{n}.jpg")
            mask = rng.randint(0, 21, (48, 64)).astype(np.uint8)
            mask[0, 0] = 255  # VOC boundary ignore label
            Image.fromarray(mask, mode="L").save(
                base / "SegmentationClass" / f"{n}.png")
    return tmp_path


def test_voc_segmentation_batches(voc_root):
    ds = VOCSegmentation(str(voc_root), train=True, crop_size=(32, 32),
                         batch_size=2, seed=0)
    assert VOCSegmentation.NUM_CLASSES == 21
    assert len(ds) == 3
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["label"].shape == (2, 32, 32)
    lab = batch["label"]
    assert ((lab < 21) | (lab == 255)).all()


def test_voc_coco_union_list(voc_root, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    extra = tmp_path / "coco_as_voc"
    extra.mkdir()
    lines = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            extra / f"im_{i}.jpg")
        Image.fromarray(rng.randint(0, 21, (40, 40)).astype(np.uint8)).save(
            extra / f"m_{i}.png")
        lines.append(f"im_{i}.jpg,m_{i}.png")
    lst = extra / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    plain = VOCSegmentation(str(voc_root), train=True, batch_size=1)
    union = VOCSegmentation(str(voc_root), train=True, batch_size=1,
                            coco_list=str(lst))
    assert len(union.pairs) == len(plain.pairs) + 4


def test_trainer_dispatch_selects_pascal(voc_root):
    cfg = resolve_dataset_defaults(
        SegConfig(dataset="pascal", data_dir=str(voc_root), batch_size=2))
    # reference fixes pascal at 512 crop / 21 classes (train.py:39-53)
    assert cfg.num_classes == 21 and cfg.crop_size == 512
    ds = build_seg_dataset(cfg, train=False)
    assert isinstance(ds, VOCSegmentation)
    with pytest.raises(ValueError):
        build_seg_dataset(SegConfig(dataset="nope"), train=True)
    with pytest.raises(FileNotFoundError):
        build_seg_dataset(SegConfig(dataset="pascal", data_dir="/nonexistent"),
                          train=True)


def test_every_seg_model_accepts_trainer_kwargs():
    """The trainer and evaluator construct models with dataset= (LR-ASPP
    pool geometry); ESPNet heads use fixed PSP geometry and must tolerate
    the kwarg instead of crashing (espnetv2 did, round-3 fix)."""
    from frostnet_tpu.segmentation.models import SEG_MODELS, get_seg_model

    for name in SEG_MODELS:
        get_seg_model(name, num_classes=19, dataset="pascal")
        get_seg_model(name, num_classes=19, dataset="city")

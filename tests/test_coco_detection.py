"""COCO detection wiring: COCODetection JSON parsing + trainer/eval dispatch
(reference Object_Detection/data/coco.py:1-112, data/config.py:50-80)."""
import json

import numpy as np
import pytest

from frostnet_tpu.detection import COCODetection, CONFIGS
from frostnet_tpu.detection.train import (DetConfig, build_detection_dataset,
                                          select_config)


@pytest.fixture()
def coco_root(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    (tmp_path / "annotations").mkdir()
    for split, n in (("train2017", 8), ("val2017", 4)):
        (tmp_path / split).mkdir()
        images, annotations = [], []
        aid = 1
        for i in range(n):
            fn = f"{i:012d}.jpg"
            Image.fromarray(
                rng.randint(0, 255, (64, 80, 3), np.uint8)).save(tmp_path / split / fn)
            images.append({"id": i, "file_name": fn, "width": 80, "height": 64})
            for _ in range(rng.randint(1, 4)):
                x, y = rng.randint(0, 40), rng.randint(0, 30)
                w, h = rng.randint(8, 30), rng.randint(8, 25)
                annotations.append({
                    "id": aid, "image_id": i,
                    # COCO category ids are sparse (up to 90 for 80 classes)
                    "category_id": int(rng.choice([1, 3, 17, 90])),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "iscrowd": 0})
                aid += 1
        # one crowd + one degenerate box that the loader must drop
        annotations.append({"id": aid, "image_id": 0, "category_id": 1,
                            "bbox": [1.0, 1.0, 10.0, 10.0], "iscrowd": 1})
        annotations.append({"id": aid + 1, "image_id": 0, "category_id": 1,
                            "bbox": [1.0, 1.0, 0.5, 10.0], "iscrowd": 0})
        with open(tmp_path / "annotations" / f"instances_{split}.json", "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": [{"id": c} for c in (1, 3, 17, 90)]}, f)
    return tmp_path


def test_coco_detection_parses_and_batches(coco_root):
    ds = COCODetection(str(coco_root), split="train2017", batch_size=4, seed=0)
    assert ds.num_classes == 4
    # sparse category ids remap to contiguous labels in id order
    assert ds.cat_to_label == {1: 0, 3: 1, 17: 2, 90: 3}
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 300, 300, 3)
    assert batch["boxes"].shape[0] == 4 and batch["boxes"].shape[2] == 4
    assert batch["valid"].any()
    v = batch["valid"]
    assert batch["labels"][v].min() >= 0 and batch["labels"][v].max() <= 3
    # valid boxes are normalized point-form
    bv = batch["boxes"][v]
    assert (bv >= 0).all() and (bv <= 1).all() and (bv[:, 2:] > bv[:, :2]).all()


def test_coco_val_split_is_deterministic(coco_root):
    ds = COCODetection(str(coco_root), split="val2017", batch_size=2, train=False)
    a = next(iter(ds))
    b = next(iter(ds))
    np.testing.assert_array_equal(a["image"], b["image"])


def test_trainer_dispatch_selects_coco(coco_root):
    assert select_config("qssd", "coco") is CONFIGS["coco"]
    assert select_config("qtdsod", "coco") is CONFIGS["tdsod_coco"]
    assert select_config("qssd", "voc") is CONFIGS["voc"]
    cfg = DetConfig(dataset="coco", data_root=str(coco_root), batch_size=2)
    ds = build_detection_dataset(cfg)
    assert isinstance(ds, COCODetection)
    # the head default follows the dataset config like the reference's
    # oversized 201-way COCO head (config.py:52)
    assert CONFIGS["coco"]["num_classes"] == 201
    with pytest.raises(ValueError):
        build_detection_dataset(DetConfig(dataset="nope"))


def test_missing_coco_root_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        COCODetection(str(tmp_path))


def test_coco_annotations_feed_native_loader(coco_root):
    """COCODetection.annotations() hands (paths, boxes, labels) to the C++
    detection loader — same contract the VOC path is tested with
    (test_native_det_loader.py)."""
    pytest.importorskip("frostnet_tpu.native")
    from frostnet_tpu.detection.data import COCODetection
    from frostnet_tpu.native import NativeDetectionLoader

    ds = COCODetection(str(coco_root), split="train2017", batch_size=2)
    paths, boxes, labels = ds.annotations()
    assert len(paths) == len(boxes) == len(labels) == len(ds.samples)
    ld = NativeDetectionLoader(paths, boxes, labels, batch_size=2, size=64,
                               train=False, threads=1)
    batch = next(iter(ld))
    assert batch["image"].shape == (2, 64, 64, 3)
    # each synthetic image carries at least one annotation
    assert (batch["valid"].sum(axis=1) >= 1).all()
    assert (batch["boxes"][batch["valid"]] >= 0).all()
    assert (batch["boxes"][batch["valid"]] <= 1).all()

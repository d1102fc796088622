"""Custom file-list segmentation dataset wiring — the reference's
custom-dataset sample layout (data_loader/segmentation/
custom_dataset_loader.py: root/{train,val}.txt lines "img.jpg, mask.png",
images under root/images, masks under root/annotations)."""
import numpy as np
import pytest

from frostnet_tpu.segmentation import CustomSegmentation
from frostnet_tpu.segmentation.train import (SegConfig, build_seg_dataset,
                                             resolve_dataset_defaults)


@pytest.fixture()
def custom_root(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "annotations").mkdir()
    names = {"train": [f"tr_{i}" for i in range(6)],
             "val": [f"va_{i}" for i in range(4)]}
    for split, ids in names.items():
        # the reference sample's comma-space separated lines
        with open(tmp_path / f"{split}.txt", "w") as f:
            f.write("\n".join(f"{n}.jpg, {n}.png" for n in ids) + "\n")
        for n in ids:
            Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
                tmp_path / "images" / f"{n}.jpg")
            Image.fromarray(rng.randint(0, 2, (48, 64)).astype(np.uint8),
                            mode="L").save(tmp_path / "annotations" / f"{n}.png")
    return tmp_path


def test_custom_segmentation_batches(custom_root):
    ds = CustomSegmentation(str(custom_root), train=True, crop_size=(32, 32),
                            batch_size=2, seed=0)
    assert len(ds) == 3
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["label"].shape == (2, 32, 32)
    assert (batch["label"] < 2).all()


def test_custom_missing_file_raises(custom_root):
    with open(custom_root / "train.txt", "a") as f:
        f.write("nope.jpg, nope.png\n")
    with pytest.raises(FileNotFoundError):
        CustomSegmentation(str(custom_root), train=True)


def test_trainer_dispatch_selects_custom(custom_root):
    cfg = resolve_dataset_defaults(
        SegConfig(dataset="custom", data_dir=str(custom_root), crop_size=32,
                  batch_size=2))
    assert cfg.num_classes == 2  # reference sample: background/person
    ds = build_seg_dataset(cfg, train=False)
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 32, 32, 3)


def test_custom_native_loader_paths(custom_root):
    """--loader native routes the same root-relative pair list through the
    C++ pool (paths resolve against data_dir like the city lists)."""
    pytest.importorskip("frostnet_tpu.native")
    cfg = resolve_dataset_defaults(
        SegConfig(dataset="custom", data_dir=str(custom_root), crop_size=32,
                  batch_size=2, loader="native"))
    ds = build_seg_dataset(cfg, train=True)
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["image"].dtype == np.uint8
    assert set(np.unique(batch["label"])) <= {0, 1, cfg.ignore_index}

"""Dataset loaders: SVHN .mat parsing + the classification dataset registry
(reference data_functions.py:12-209 dispatch)."""
import numpy as np
import pytest

from frostnet_tpu.data import SVHNClassification, build_classification_dataset


@pytest.fixture()
def svhn_dir(tmp_path):
    from scipy.io import savemat

    rng = np.random.RandomState(0)
    root = tmp_path / "svhn"
    root.mkdir()
    for split, n in (("train", 40), ("test", 24)):
        X = rng.randint(0, 255, (32, 32, 3, n), np.uint8)
        y = rng.randint(1, 11, (n, 1)).astype(np.uint8)  # official 1..10
        savemat(str(root / f"{split}_32x32.mat"), {"X": X, "y": y})
    return tmp_path


def test_svhn_shapes_normalization_and_label_remap(svhn_dir):
    ds = SVHNClassification(str(svhn_dir / "svhn"), train=False, batch_size=8)
    assert len(ds) == 3 and ds.num_classes == 10
    # torchvision semantics: label 10 is digit 0
    assert ds.labels.min() >= 0 and ds.labels.max() <= 9
    batch = next(iter(ds))
    assert batch["image"].shape == (8, 32, 32, 3)
    assert batch["label"].dtype == np.int32
    # test split applies normalize only: invertible back to uint8/255 grid
    im = batch["image"] * SVHNClassification.STD + SVHNClassification.MEAN
    np.testing.assert_allclose(
        im, np.round(im * 255) / 255, atol=1e-5)


def test_svhn_train_augmentation_is_seeded(svhn_dir):
    a = next(iter(SVHNClassification(str(svhn_dir / "svhn"), True, 8, seed=3)))
    b = next(iter(SVHNClassification(str(svhn_dir / "svhn"), True, 8, seed=3)))
    c = next(iter(SVHNClassification(str(svhn_dir / "svhn"), True, 8, seed=4)))
    np.testing.assert_array_equal(a["image"], b["image"])
    assert not np.allclose(a["image"], c["image"])
    assert a["image"].shape == (8, 32, 32, 3)


@pytest.fixture()
def cifar_dir(tmp_path):
    import pickle

    rng = np.random.RandomState(0)
    ten = tmp_path / "cifar-10-batches-py"
    hundred = tmp_path / "cifar-100-python"
    ten.mkdir(), hundred.mkdir()
    for i in range(1, 6):
        with open(ten / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rng.randint(0, 255, (8, 3072), np.uint8),
                         b"labels": list(rng.randint(0, 10, 8))}, f)
    with open(ten / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.randint(0, 255, (8, 3072), np.uint8),
                     b"labels": list(rng.randint(0, 10, 8))}, f)
    for split in ("train", "test"):
        with open(hundred / split, "wb") as f:
            pickle.dump({b"data": rng.randint(0, 255, (8, 3072), np.uint8),
                         b"fine_labels": list(rng.randint(0, 100, 8))}, f)
    return tmp_path


def test_cifar_per_dataset_stats(cifar_dir):
    """cifar100 must normalize with its own mean/std (reference
    data_functions.py:101-113), not CIFAR-10's — and cifar10's std is
    (.247,.243,.261) there, not the common (.2023,...) triplet."""
    from frostnet_tpu.data.datasets import CIFARClassification

    c10 = CIFARClassification(str(cifar_dir), train=False, batch_size=8)
    c100 = CIFARClassification(str(cifar_dir), train=False, batch_size=8,
                               cifar100=True)
    np.testing.assert_allclose(c100.mean, [0.5071, 0.4865, 0.4409])
    np.testing.assert_allclose(c100.std, [0.2673, 0.2564, 0.2762])
    np.testing.assert_allclose(c10.std, [0.247, 0.243, 0.261])
    assert c100.num_classes == 100
    for ds in (c10, c100):
        batch = next(iter(ds))
        # test split is normalize-only: invertible back to the uint8/255 grid
        im = batch["image"] * ds.std + ds.mean
        np.testing.assert_allclose(im, np.round(im * 255) / 255, atol=1e-5)


def test_cifar_train_aug_is_random_resized_crop(cifar_dir):
    """Train aug is RandomResizedCrop(32)+hflip (reference :97-99), seeded."""
    from frostnet_tpu.data.datasets import CIFARClassification

    a = next(iter(CIFARClassification(str(cifar_dir), True, 16, seed=1)))
    b = next(iter(CIFARClassification(str(cifar_dir), True, 16, seed=1)))
    c = next(iter(CIFARClassification(str(cifar_dir), True, 16, seed=2)))
    np.testing.assert_array_equal(a["image"], b["image"])
    assert not np.allclose(a["image"], c["image"])
    assert a["image"].shape == (16, 32, 32, 3)


def test_registry_dispatch(svhn_dir):
    ds = build_classification_dataset("svhn", str(svhn_dir), train=True,
                                      batch_size=4)
    assert isinstance(ds, SVHNClassification)
    with pytest.raises(FileNotFoundError):
        build_classification_dataset("cifar10", str(svhn_dir), train=True)


def test_randaugment_spec_and_determinism(tmp_path):
    """RandAugment: recipe-spec parsing ('rand-m9-mstd0.5', --aa in
    training_commands.txt), seeded determinism, every op yields a valid
    uint8 image, and the ImageFolder train path actually applies it."""
    import pytest

    from frostnet_tpu.data import RandAugment, build_classification_dataset
    from frostnet_tpu.data.randaugment import _ops

    ra = RandAugment.from_string("rand-m9-mstd0.5")
    assert ra.magnitude == 9.0 and ra.magnitude_std == 0.5 and ra.num_ops == 2
    assert RandAugment.from_string("rand-m5-n3").num_ops == 3
    with pytest.raises(ValueError):
        RandAugment.from_string("original-m9")

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 48, 3), np.uint8)
    # every op in the table runs and preserves shape/dtype
    for name, op in _ops(9.0).items():
        from PIL import Image
        out = np.asarray(op(Image.fromarray(img), rng))
        assert out.shape == img.shape and out.dtype == np.uint8, name
    # same seed -> same augmentation; different seed -> (almost surely) not
    a = ra(img, np.random.RandomState(3))
    b = ra(img, np.random.RandomState(3))
    c = ra(img, np.random.RandomState(4))
    np.testing.assert_array_equal(a, b)
    assert a.shape == img.shape
    assert not np.array_equal(a, c)

    # wiring: the folder dataset applies it on the train path only
    from PIL import Image
    for split in ("train", "val"):
        d = tmp_path / "mini" / split / "class0"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.randint(0, 256, (64, 64, 3), np.uint8)).save(
                d / f"{i}.jpg")
    ds = build_classification_dataset(
        "mini", str(tmp_path), train=True, image_size=32, batch_size=2,
        aa="rand-m9-mstd0.5")
    assert ds.randaugment is not None
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 32, 32, 3)
    ds_val = build_classification_dataset(
        "mini", str(tmp_path), train=False, image_size=32, batch_size=2,
        aa="rand-m9-mstd0.5")
    assert ds_val.randaugment is None

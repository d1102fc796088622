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

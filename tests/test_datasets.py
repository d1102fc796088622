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


def test_registry_dispatch(svhn_dir):
    ds = build_classification_dataset("svhn", str(svhn_dir), train=True,
                                      batch_size=4)
    assert isinstance(ds, SVHNClassification)
    with pytest.raises(FileNotFoundError):
        build_classification_dataset("cifar10", str(svhn_dir), train=True)

"""mIoU oracle: our on-device confusion matrix reproduces the reference's
torch.histc-based MIOU inter/union counts exactly (Semantic_Segmentation/
utilities/metrics/segmentation_miou.py), including the 255-ignore handling
(their uint8 +1 wrap trick)."""
import importlib.util
import sys

import numpy as np
import jax.numpy as jnp
import torch

from frostnet_tpu.utils.metrics import confusion_matrix, miou_from_confusion


def _load_reference_miou():
    if "ref_miou" in sys.modules:
        return sys.modules["ref_miou"]
    spec = importlib.util.spec_from_file_location(
        "ref_miou",
        "/root/reference/Semantic_Segmentation/utilities/metrics/"
        "segmentation_miou.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_miou"] = mod
    return mod


def test_inter_union_matches_reference_histc():
    ref = _load_reference_miou()
    rng = np.random.RandomState(0)
    C = 6
    m = ref.MIOU(num_classes=C)

    logits = rng.randn(2, C, 24, 24).astype(np.float32)
    target = rng.randint(0, C, (2, 24, 24))
    target[rng.rand(*target.shape) < 0.1] = 255  # ignore pixels

    inter_ref, union_ref = m.get_iou(torch.from_numpy(logits),
                                     torch.from_numpy(target))

    pred = np.argmax(logits, axis=1)
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(target),
                                     C, ignore_index=255))
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter  # pred + mask - inter

    np.testing.assert_array_equal(inter, inter_ref)
    np.testing.assert_allclose(union, union_ref - m.epsilon, atol=1e-4)


def test_miou_from_confusion_value():
    # 3 classes, class 2 absent: present-only mean (documented deviation —
    # the reference averages absent classes as ~0, which only differs when a
    # class never appears in pred nor target)
    cm = jnp.asarray([[8, 2, 0], [1, 9, 0], [0, 0, 0]])
    iou, miou = miou_from_confusion(cm)
    np.testing.assert_allclose(np.asarray(iou)[:2],
                               [8 / 11, 9 / 12], rtol=1e-6)
    np.testing.assert_allclose(float(miou), (8 / 11 + 9 / 12) / 2, rtol=1e-6)

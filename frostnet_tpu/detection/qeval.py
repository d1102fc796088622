"""Detection evaluator CLI: VOC mAP in QAT-sim and frozen-INT8 modes.

Re-implements Object_Detection/qeval_convert.py:406-473 (build test nets,
load weights, convert, per-image detect + accumulate, voc_eval mAP) — and
repairs the reference's dangling ``from qeval import evaluator`` import
(qtrainval.py:26 refers to a module that doesn't exist there).

Run: python -m frostnet_tpu.detection.qeval --net_type qssd --dataset synthetic
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..nn import QAT, QAT_FROZEN, INT8
from ..utils.logging import MetricLogger
from .anchors import make_priors
from .data import COCODetection, SyntheticDetection, VOCDetection
from .train import select_config
from .evaluate import evaluate_map
from .models import build_ssd
from .tdsod import build_tdsod


def evaluator(net_type="qssd", dataset="synthetic", data_root="./data/VOCdevkit",
              num_classes=None, batch_size=4, max_batches=None,
              feat_vars=None, head_vars=None, modes=("qat", "int8"),
              export_int8_path=None):
    """Programmatic entry (the reference's `evaluator(...)` call from the
    train loop, qtrainval.py:306-319). Pass trained (feat_vars, head_vars)
    or get randomly-initialized nets for smoke runs. ``num_classes`` defaults
    from the dataset's anchor config (21 voc / 201 coco), like train.py."""
    logger = MetricLogger(None, name="det-eval")
    det_cfg = select_config(net_type, dataset)
    priors = make_priors(det_cfg)
    if num_classes is None:
        num_classes = det_cfg["num_classes"]
    build = build_tdsod if net_type == "qtdsod" else build_ssd
    feat, head = build(num_classes=num_classes)

    if dataset == "synthetic":
        ds = SyntheticDetection(num_classes - 1, 300, batch_size * 2, batch_size, 1)
    elif dataset == "coco":
        ds = COCODetection(data_root, split="val2017",
                           batch_size=batch_size, train=False)
    else:
        ds = VOCDetection(data_root, image_sets=(("2007", "test"),),
                          batch_size=batch_size, train=False)

    if feat_vars is None:
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((batch_size, 300, 300, 3))
        feat_vars = jax.jit(lambda r, x: feat.init(r, x, mode=QAT, train=True))(rng, sample)
        sources = jax.eval_shape(lambda v, x: feat.apply(v, x, mode=QAT_FROZEN),
                                 feat_vars, sample)
        head_vars = jax.jit(lambda r, s: head.init(r, s))(
            rng, [jnp.zeros(s.shape, s.dtype) for s in sources])

    if export_int8_path:
        from ..quant import export_int8
        fb = export_int8(feat_vars, export_int8_path + "_feat")
        hb = export_int8(head_vars, export_int8_path + "_head")
        logger.info(f"INT8 artifacts written: {export_int8_path}_feat/_head "
                    f"({(fb + hb)/1e6:.2f} MB)")

    results = {}
    mode_map = {"qat": QAT_FROZEN, "int8": INT8}
    for name in modes:
        r = evaluate_map(feat, head, feat_vars, head_vars, ds, priors,
                         mode_map[name], num_classes, max_batches=max_batches)
        logger.info(f"mAP({name}) = {r['mAP']:.4f}")
        results[name] = r
    return results


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--net_type", default="qssd", choices=["qssd", "qtdsod"])
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_root", default="./data/VOCdevkit")
    p.add_argument("--num_classes", type=int, default=None,
                   help="defaults from the dataset config (21 voc / 201 coco)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--export_int8", default=None, metavar="PATH",
                   help="write converted INT8 deployment artifacts (PATH_feat/_head .npz)")
    a = p.parse_args()
    evaluator(a.net_type, a.dataset, a.data_root, a.num_classes, a.batch_size,
              a.max_batches, export_int8_path=a.export_int8)


if __name__ == "__main__":
    cli()

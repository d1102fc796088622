"""VOC mAP evaluator oracle test: identical synthetic detections + ground
truth through our match/AP core (detection/evaluate.py) and the reference's
file-based voc_eval (qeval_convert.py:211-345) must give equal per-class AP.

Boxes/scores are generated on dyadic grids (k/64, k/1024) so the reference's
text-file round trip parses bit-identical floats.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from frostnet_tpu.detection.evaluate import (
    aps_from_records,
    match_detections,
    voc_ap,
)

NUM_CLASSES = 5   # background + 4
IMAGES = 10
TOPK = 16


def _load_reference_qeval(voc_root):
    name = "ref_qeval_convert"
    if name in sys.modules:
        return sys.modules[name]
    data = types.ModuleType("data")
    data.VOC_ROOT = voc_root
    data.VOCAnnotationTransform = data.VOCDetection = data.BaseTransform = object
    data.VOC_CLASSES = [f"cls{i}" for i in range(NUM_CLASSES - 1)]
    ssd = types.ModuleType("ssd_qmv2")
    ssd.build_ssd = lambda *a, **k: None
    tdsod = types.ModuleType("qtdsod")
    tdsod.build_tdsod = lambda *a, **k: None
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x, **kw: x
    sys.modules.update({"data": data, "ssd_qmv2": ssd, "qtdsod": tdsod,
                        "tqdm": tqdm_mod})
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/Object_Detection/qeval_convert.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the reference never imports ET (parse_rec crashes as shipped — one of
    # its latent breakages, like the dangling `from qeval import evaluator`)
    import xml.etree.ElementTree
    mod.ET = xml.etree.ElementTree
    sys.modules[name] = mod
    return mod


def _dyadic(rng, lo, hi, denom):
    return np.floor(rng.uniform(lo, hi) * denom) / denom


def _make_scenario(seed=0):
    """Random GT + detections. Returns per-image dicts."""
    rng = np.random.RandomState(seed)
    images = []
    for i in range(IMAGES):
        n_gt = rng.randint(0, 5)
        gts = []
        for _ in range(n_gt):
            x1 = int(rng.randint(0, 200))
            y1 = int(rng.randint(0, 200))
            gts.append((rng.randint(0, NUM_CLASSES - 1),  # 0-based class
                        (x1, y1, x1 + int(rng.randint(20, 90)),
                         y1 + int(rng.randint(20, 90)))))
        dets = []
        for cls, (x1, y1, x2, y2) in gts:
            if rng.rand() < 0.85:  # near-hit detection
                jit = lambda v: _dyadic(rng, v - 9, v + 9, 64)
                dets.append((cls, round(rng.randint(1, 1023) / 1024, 10),
                             (jit(x1), jit(y1), jit(x2), jit(y2))))
        for _ in range(rng.randint(0, 4)):  # false positives
            x1 = _dyadic(rng, 0, 220, 64)
            y1 = _dyadic(rng, 0, 220, 64)
            dets.append((rng.randint(0, NUM_CLASSES - 1),
                         round(rng.randint(1, 1023) / 1024, 10),
                         (x1, y1, x1 + _dyadic(rng, 15, 80, 64),
                          y1 + _dyadic(rng, 15, 80, 64))))
        images.append({"name": f"img{i:03d}", "gt": gts, "det": dets})
    return images


def _ours(images):
    dets = [[] for _ in range(NUM_CLASSES)]
    npos = np.zeros(NUM_CLASSES, np.int64)
    for im in images:
        out = np.zeros((NUM_CLASSES, TOPK, 5), np.float64)
        for c in range(1, NUM_CLASSES):
            rows = sorted((d for d in im["det"] if d[0] == c - 1),
                          key=lambda d: -d[1])
            for k, (_, score, bb) in enumerate(rows):
                out[c, k] = (score, *bb)
        gt_boxes = np.array([g[1] for g in im["gt"]], np.float64).reshape(-1, 4)
        gt_labels = np.array([g[0] for g in im["gt"]], np.int64)
        match_detections(dets, npos, out, gt_boxes, gt_labels, NUM_CLASSES)
    return aps_from_records(dets, npos, NUM_CLASSES), npos


def _reference(images, tmp_path):
    # VOC layout: annotations + image set + per-class detection files
    ann = tmp_path / "ann"
    ann.mkdir()
    for im in images:
        objs = "".join(
            f"<object><name>cls{c}</name><pose>x</pose><truncated>0</truncated>"
            f"<difficult>0</difficult><bndbox><xmin>{b[0]+1}</xmin>"
            f"<ymin>{b[1]+1}</ymin><xmax>{b[2]+1}</xmax><ymax>{b[3]+1}</ymax>"
            f"</bndbox></object>"
            for c, b in im["gt"])
        (ann / f"{im['name']}.xml").write_text(
            f"<annotation>{objs}</annotation>")
    imageset = tmp_path / "test.txt"
    imageset.write_text("".join(im["name"] + "\n" for im in images))
    for c in range(NUM_CLASSES - 1):
        lines = []
        for im in images:
            for cls, score, bb in im["det"]:
                if cls == c:
                    lines.append(
                        f"{im['name']} {score:.10f} "
                        f"{bb[0]:.6f} {bb[1]:.6f} {bb[2]:.6f} {bb[3]:.6f}\n")
        (tmp_path / f"det_cls{c}.txt").write_text("".join(lines))

    ref = _load_reference_qeval(str(tmp_path))
    had_bool = hasattr(np, "bool")
    if not had_bool:
        np.bool = bool  # numpy 2 removed the alias the 2020-era code uses
    try:
        aps = np.zeros(NUM_CLASSES, np.float64)
        for c in range(NUM_CLASSES - 1):
            cache = str(tmp_path / f"cache{c}")
            _, _, ap = ref.voc_eval(
                str(tmp_path / "det_cls{}.txt").format(c),
                str(ann / "%s.xml"), str(imageset), f"cls{c}", cache,
                ovthresh=0.5, use_07_metric=True)
            aps[c + 1] = ap
    finally:
        if not had_bool:
            del np.bool
    return aps


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_matches_reference_voc_eval(seed, tmp_path):
    images = _make_scenario(seed)
    ours, npos = _ours(images)
    ref_aps = _reference(images, tmp_path)
    for c in range(1, NUM_CLASSES):
        if npos[c] == 0:
            continue  # reference returns -1 for classes without detections
        assert ref_aps[c] >= 0
        np.testing.assert_allclose(ours[c], ref_aps[c], atol=1e-6,
                                   err_msg=f"class {c}")


def test_voc_ap_11pt_formula():
    rec = np.array([0.1, 0.4, 0.4, 0.9])
    prec = np.array([1.0, 0.8, 0.6, 0.5])
    # hand-computed 11-point interpolation
    want = (1.0 * 2 + 0.8 * 3 + 0.5 * 5 + 0.0) / 11.0
    np.testing.assert_allclose(voc_ap(rec, prec), want, rtol=1e-6)

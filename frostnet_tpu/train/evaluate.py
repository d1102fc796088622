"""Standalone classification evaluator (reference Classification/evaluate.py).

Loads a QAT checkpoint, runs a 1-batch calibration pass (train_one_iter,
helper_functions.py:166-230), then reports the dual-accuracy contract:
Accuracy(QAT sim) vs Accuracy(INT8 frozen) — plus frozen INT8 model size
(print_size_of_model, evaluate.py:117-120).

Run: python -m frostnet_tpu.train.evaluate --model frostnet_quant_small_0_35 \
       --checkpoint runs/classification/best --dataset synthetic
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import SyntheticClassification, FolderClassification, prefetch_to_device
from ..models import create_model
from ..nn import QAT, QAT_FROZEN, INT8
from ..optim import get_optimizer
from ..parallel import make_mesh
from ..utils.checkpoint import restore_model_variables
from ..utils.logging import MetricLogger
from .classification import evaluate
from .state import create_train_state, make_train_step, recalibrate


def int8_model_size_bytes(model, state) -> int:
    """Size of the frozen INT8 parameter set: int8 weights + f32 scales/bias
    (the qnnpack state-dict equivalent saved at evaluate.py:140-143)."""
    total = 0
    for p in jax.tree.leaves(state.params):
        if p.ndim == 4:  # conv kernels freeze to int8
            total += int(np.prod(p.shape))
        else:            # biases/BN fold into f32 per-channel terms
            total += int(np.prod(p.shape)) * 4
    return total


def main(args):
    logger = MetricLogger(None, name="evaluate")
    mesh = make_mesh()
    model = create_model(args.model, num_classes=args.num_classes)
    tx = get_optimizer("QSGD", 1e-3)

    if args.dataset == "synthetic":
        ds = SyntheticClassification(args.num_classes, args.image_size,
                                     args.batch_size * 4, args.batch_size, 1)
    else:
        ds = FolderClassification(os.path.join(args.data_dir, args.dataset, "val"),
                                  args.image_size, args.batch_size, train=False)

    sample = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               init_kwargs={"mode": QAT, "train": True})
    if args.checkpoint:
        state = restore_model_variables(args.checkpoint, state)
    else:
        # calibration: one train iteration (evaluate.py:108-110)
        step = make_train_step(model, QAT, num_classes=args.num_classes, donate=False)
        batch = next(iter(prefetch_to_device(iter(ds), mesh)))
        state, _ = step(state, batch)
    use_ema = bool(getattr(args, "use_ema", False))
    if use_ema and getattr(state, "ema", None) is None:
        logger.info("--use_ema requested but the checkpoint has no EMA "
                    "params; evaluating the raw weights")
        use_ema = False
    if use_ema:
        # calibration and eval must see the SAME weights: swap the EMA
        # params in BEFORE recalibration so batch_stats/observers (and the
        # INT8 conversion) describe the weights actually evaluated
        state = state.replace(params=state.ema)
        use_ema = False  # params already swapped; eval uses them directly
    if args.calib_batches:
        # forward-only BN/observer re-estimation (no optimizer mutation) —
        # converges the momentum-0.1 running stats to the checkpoint weights'
        # activation statistics before the frozen/INT8 eval. ~50 batches
        # leaves <1% EMA residual.
        batches = []
        for i, b in enumerate(prefetch_to_device(iter(ds), mesh)):
            if i >= args.calib_batches:
                break
            batches.append(b)
        state = recalibrate(model, state, batches)

    qat = evaluate(model, state, ds, mesh, QAT_FROZEN, args.num_classes)
    int8 = evaluate(model, state, ds, mesh, INT8, args.num_classes)
    logger.info(f"Accuracy(QAT sim): top1={qat.get('top1', 0):.4f} "
                f"top5={qat.get('top5', 0):.4f}")
    logger.info(f"Accuracy(INT8 frozen): top1={int8.get('top1', 0):.4f} "
                f"top5={int8.get('top5', 0):.4f}")
    size_mb = int8_model_size_bytes(model, state) / 1e6
    logger.info(f"INT8 model size: {size_mb:.2f} MB")
    if args.layer_report:
        # per-layer INT8-vs-QAT_FROZEN divergence (the numeric suite): when
        # the dual accuracies disagree, this names the layer responsible
        from ..quant.numeric_suite import compare_modes, format_report
        batch = next(iter(prefetch_to_device(iter(ds), mesh)))
        rows = compare_modes(model, state.model_variables, batch["image"])
        logger.info("per-layer INT8 vs QAT_FROZEN (worst first):\n"
                    + format_report(rows, args.layer_report))
    if args.export_int8:
        from ..quant import export_int8
        nbytes = export_int8(state.model_variables, args.export_int8)
        logger.info(f"INT8 artifact written: {args.export_int8} ({nbytes/1e6:.2f} MB)")
    return {"qat": qat, "int8": int8, "int8_size_mb": size_mb}


_JSON_ALIASES = {"Model": "model", "weight_name": "checkpoint",
                 "dataset_name": "dataset"}


def _json_defaults(path):
    """Map the reference's setting/evaluate.json (nested test_config/
    data_config, Model/weight_name spellings — evaluate.py:28) onto our
    argparse defaults; explicit CLI flags still win. Uses the trainer's
    shared reference-layout flattener."""
    import json

    from .classification import flatten_reference_json
    with open(path) as f:
        raw = json.load(f)
    out = flatten_reference_json(raw, _JSON_ALIASES)
    if not out.get("checkpoint"):
        out.pop("checkpoint", None)  # weight_name "" means no checkpoint
    return out


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("-c", "--config", default=None,
                     help="reference-style evaluate.json (setting/*.json "
                          "layout accepted verbatim)")
    cfg_args, rest = pre.parse_known_args()
    p = argparse.ArgumentParser(description=__doc__, parents=[pre])
    p.add_argument("--model", default="frostnet_quant_large_1_0")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA weights (the published recipe "
                        "validates model-ema, training_commands.txt)")
    p.add_argument("--calib_batches", type=int, default=0,
                   help="forward-only BN/observer recalibration batches before eval")
    p.add_argument("--export_int8", default=None, metavar="PATH",
                   help="write the converted INT8 deployment artifact (.npz)")
    p.add_argument("--layer_report", type=int, default=0, metavar="N",
                   help="print the worst-N-layers INT8-vs-QAT numeric-suite "
                        "report (quant/numeric_suite.py)")
    if cfg_args.config:
        known = {a.dest for a in p._actions}
        p.set_defaults(**{k: v for k, v in _json_defaults(cfg_args.config).items()
                          if k in known})
    main(p.parse_args())


if __name__ == "__main__":
    cli()

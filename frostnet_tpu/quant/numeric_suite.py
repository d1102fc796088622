"""Per-layer quantization error reporting (a torch.ao.ns Numeric Suite
equivalent for this stack).

The reference's QC is the whole-model dual-accuracy print (QAT-sim vs
converted INT8, Classification/evaluate.py:129-138) — when the two diverge
it gives no clue WHERE. torch users reach for
``torch.ao.ns._numeric_suite.compare_model_outputs``; this module is that
tool for the TPU stack: run the same variables through two modes with flax
``capture_intermediates``, align the module tree, and report per-layer
signal-to-quantization-noise (SQNR) and worst-case error in output quanta,
sorted worst-first.

Usage (programmatic)::

    from frostnet_tpu.quant.numeric_suite import compare_modes
    rows = compare_modes(model, variables, x)      # QAT_FROZEN vs INT8
    for r in rows[:5]:
        print(r.path, r.sqnr_db, r.max_quanta)

or the CLI::

    python -m frostnet_tpu.quant.numeric_suite --model frostnet_quant_small_1_0 \
        --checkpoint runs/classification/best

A healthy INT8 conversion shows SQNR well above ~30 dB and worst-case error
of a few quanta on every layer; a layer at <20 dB (or tens of quanta) is
where the INT8 path diverges — typically a join missing its observer or a
saturated activation range (docs/QAT_RECIPE.md failure table).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.mode import INT8, QAT_FROZEN, QuantMode
from .qtensor import QTensor


@dataclasses.dataclass
class LayerReport:
    path: str             # module path, e.g. layer4_1/conv2
    shape: tuple
    sqnr_db: float        # 10*log10(|ref|^2 / |ref-test|^2); inf if exact
    max_abs: float        # worst absolute error (dequantized units)
    max_quanta: Optional[float]  # worst error / output scale (INT8 side)
    scale: Optional[float]       # test-side output scale, if quantized


def _flatten_outputs(intermediates) -> dict:
    """{module/path: array} for every captured __call__ output. Modules
    invoked more than once in a forward keep EVERY invocation, suffixed
    ``#i`` — collapsing them would let a divergent first call hide behind a
    healthy last one."""
    out = {}

    def walk(node, prefix):
        if isinstance(node, QTensor):  # NamedTuple — must precede the
            out[prefix or "<output>"] = node  # tuple branch
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix if k == "__call__" else f"{prefix}/{k}"
                     if prefix else k)
        elif isinstance(node, (tuple, list)):
            many = len(node) > 1
            for i, v in enumerate(node):
                walk(v, f"{prefix}#{i}" if many else prefix)
        elif isinstance(node, QTensor) or hasattr(node, "shape"):
            out[prefix or "<output>"] = node

    walk(intermediates, "")
    return out


def _dequant(v):
    if isinstance(v, QTensor):
        return np.asarray(v.dequantize(), np.float32), float(np.asarray(v.scale).max())
    return np.asarray(v, np.float32), None


def compare_modes(model, variables, x,
                  ref_mode: QuantMode = QAT_FROZEN,
                  test_mode: QuantMode = INT8) -> List[LayerReport]:
    """Per-layer outputs of ``test_mode`` vs ``ref_mode``, worst SQNR first.

    Both passes run under jit on the same variables; INT8-side QTensor
    outputs are dequantized onto the float grid, so an exact conversion
    reports sqnr_db=inf / max_quanta=0 on every layer.
    """

    def run(mode):
        _, st = jax.jit(
            lambda v, i: model.apply(v, i, mode=mode,
                                     capture_intermediates=True,
                                     mutable=["intermediates"]),
        )(variables, x)
        return _flatten_outputs(st["intermediates"])

    ref, test = run(ref_mode), run(test_mode)
    unmatched = sorted(set(ref) ^ set(test))
    rows = []
    skipped = []
    for name in sorted(set(ref) & set(test)):
        r, _ = _dequant(ref[name])
        t, scale = _dequant(test[name])
        if r.shape != t.shape:
            skipped.append(name)
            continue
        err = r - t
        num = float((r.astype(np.float64) ** 2).sum())
        den = float((err.astype(np.float64) ** 2).sum())
        sqnr = float("inf") if den == 0 else 10.0 * np.log10(max(num, 1e-30) / den)
        max_abs = float(np.abs(err).max())
        rows.append(LayerReport(
            path=name, shape=tuple(t.shape), sqnr_db=sqnr, max_abs=max_abs,
            max_quanta=(max_abs / scale) if scale else None, scale=scale))
    if unmatched or skipped:
        # silent coverage loss would read as "everything healthy"
        import warnings
        warnings.warn(
            f"numeric_suite: {len(unmatched)} layer(s) present in only one "
            f"mode {unmatched[:5]}, {len(skipped)} shape-mismatched "
            f"{skipped[:5]} — excluded from the report")
    rows.sort(key=lambda r: r.sqnr_db)
    return rows


def format_report(rows: List[LayerReport], top: Optional[int] = None) -> str:
    lines = [f"{'layer':40s} {'shape':>18s} {'SQNR dB':>8s} "
             f"{'max|err|':>10s} {'quanta':>7s}"]
    for r in rows[:top]:
        q = f"{r.max_quanta:.1f}" if r.max_quanta is not None else "-"
        s = f"{r.sqnr_db:.1f}" if np.isfinite(r.sqnr_db) else "inf"
        lines.append(f"{r.path:40s} {str(r.shape):>18s} {s:>8s} "
                     f"{r.max_abs:>10.4g} {q:>7s}")
    return "\n".join(lines)


def cli():
    import argparse

    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()  # also enables the persistent compile cache

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="frostnet_quant_small_1_0")
    p.add_argument("--checkpoint", default=None,
                   help="trainer checkpoint dir; random init + synthetic "
                        "calibration when omitted")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--calib_batches", type=int, default=2)
    p.add_argument("--top", type=int, default=None, help="print worst N only")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from ..models import create_model
    from ..nn import QAT

    model = create_model(args.model, num_classes=args.num_classes)
    key = jax.random.PRNGKey(args.seed)
    shape = (args.batch_size, args.image_size, args.image_size, 3)
    x = jax.random.normal(key, shape)
    variables = jax.jit(
        lambda k, i: model.init(k, i, mode=QAT, train=True))(key, x)

    if args.checkpoint:
        from ..utils.checkpoint import restore_model_variables
        variables = restore_model_variables(args.checkpoint, variables)
    else:
        # calibrate observers so the INT8 grids are meaningful
        calib = jax.jit(lambda v, i: model.apply(
            v, i, mode=QAT, train=True, mutable=["batch_stats", "quant"],
            rngs={"dropout": key}))
        for i in range(args.calib_batches):
            xb = jax.random.normal(jax.random.fold_in(key, i), shape)
            _, upd = calib(variables, xb)
            variables = {**variables, **upd}

    rows = compare_modes(model, variables, x)
    print(format_report(rows, args.top))


if __name__ == "__main__":
    cli()

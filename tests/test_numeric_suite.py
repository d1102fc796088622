"""Per-layer quantization error reporting (quant/numeric_suite.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.models import create_model
from frostnet_tpu.nn import FP32, INT8, QAT, QAT_FROZEN
from frostnet_tpu.quant.numeric_suite import compare_modes, format_report


@pytest.fixture(scope="module")
def calibrated():
    model = create_model("frostnet_quant_small_0_35", num_classes=10)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 32, 32, 3))
    v = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(key, x)
    calib = jax.jit(lambda vv, i: model.apply(
        vv, i, mode=QAT, train=True, mutable=["batch_stats", "quant"],
        rngs={"dropout": key}))
    for i in range(2):
        _, upd = calib(v, jax.random.normal(jax.random.fold_in(key, i),
                                            (4, 32, 32, 3)))
        v = {**v, **upd}
    return model, v, x


def test_int8_matches_qat_frozen_per_layer(calibrated):
    """The repo's numerics contract, per layer: every INT8 module output
    dequantizes exactly onto the QAT_FROZEN grid (0 quanta of error) —
    the layer-resolved version of the evaluator's dual-accuracy check."""
    model, v, x = calibrated
    rows = compare_modes(model, v, x, ref_mode=QAT_FROZEN, test_mode=INT8)
    assert len(rows) > 30  # every block + stem/head captured
    worst = max(r.max_abs for r in rows)
    assert worst == 0.0, format_report(rows, 5)


def test_fp32_vs_int8_shows_quantization_error(calibrated):
    """Against the FP32 reference the tool must report real, finite error
    (rounding-level: ~half an output quantum per layer), worst-first."""
    model, v, x = calibrated
    rows = compare_modes(model, v, x, ref_mode=FP32, test_mode=INT8)
    quantized = [r for r in rows if r.max_quanta is not None]
    assert quantized, "no quantized layers captured"
    assert all(np.isfinite(r.sqnr_db) for r in quantized)
    assert any(r.max_abs > 0 for r in quantized)
    # against a healthy calibration the first conv stays in a sane band:
    # its error is input+weight quantization only (a few quanta, >20 dB),
    # not a blow-up. Deeper layers legitimately accumulate drift —
    # surfacing that growth is the tool's purpose.
    first = next(r for r in rows if r.path == "conv1")
    assert first.sqnr_db > 20.0 and first.max_quanta < 20.0
    # sorted worst-first
    sq = [r.sqnr_db for r in rows]
    assert sq == sorted(sq)
    txt = format_report(rows, 3)
    assert "SQNR" in txt and len(txt.splitlines()) == 4

"""scripts/plot_metrics.py renders metrics.jsonl run logs to PNG/HTML.

Closes the observability delta vs the reference's visdom/TF-1 dashboards
(Classification/utils/Tensor_logger.py:18-40, Style_Transfer/util/
visualizer.py:49+): curves come from the jsonl files every trainer writes.
"""
import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "plot_metrics",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "plot_metrics.py"))
plot_metrics = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(plot_metrics)


def _write_run(tmp_path, name, n=20, keys=("loss", "acc")):
    d = tmp_path / name
    d.mkdir()
    with open(d / "metrics.jsonl", "w") as f:
        for i in range(n):
            rec = {"step": i, "time": 1000.0 + i}
            for j, k in enumerate(keys):
                rec[k] = 1.0 / (i + 1) + j
            f.write(json.dumps(rec) + "\n")
        f.write('{"torn')  # live-run torn tail must be tolerated
    return str(d)


def test_load_metrics_parses_series(tmp_path):
    run = _write_run(tmp_path, "exp1")
    series = plot_metrics.load_metrics(run)
    assert set(series) == {"loss", "acc"}
    xs, ys = series["loss"]
    assert xs[0] == 0 and xs[-1] == 19 and len(ys) == 20
    assert ys[0] == pytest.approx(1.0)


def test_png_output(tmp_path):
    pytest.importorskip("matplotlib")
    run = _write_run(tmp_path, "exp1")
    out = str(tmp_path / "curves.png")
    plot_metrics.main([run, "-o", out])
    assert os.path.getsize(out) > 1000
    with open(out, "rb") as f:
        assert f.read(8)[1:4] == b"PNG"


def test_html_overlay_two_runs(tmp_path):
    r1 = _write_run(tmp_path, "base")
    r2 = _write_run(tmp_path, "tuned", keys=("loss",))
    out = str(tmp_path / "ab.html")
    plot_metrics.main([r1, r2, "-o", out, "--format", "html"])
    html = open(out).read()
    assert "<svg" in html and "polyline" in html
    assert "base" in html and "tuned" in html
    # 'acc' exists only in run 1 — still rendered; 'loss' overlays both
    assert html.count("<svg") == 2


def test_keys_filter(tmp_path):
    run = _write_run(tmp_path, "exp1")
    out = str(tmp_path / "one.html")
    plot_metrics.main([run, "-o", out, "--keys", "loss"])
    html = open(out).read()
    assert html.count("<svg") == 1

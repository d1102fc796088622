#!/usr/bin/env python
"""Plot training curves from metrics.jsonl run logs.

The TPU-native replacement for the reference's live dashboards (visdom line
plots in Style_Transfer/util/visualizer.py:49+ and the TF-1 summary writer in
Classification/utils/Tensor_logger.py:18-40): every trainer here appends
scalar records to ``<logdir>/metrics.jsonl`` via
``frostnet_tpu.utils.logging.MetricLogger``; this script renders those files
to PNG (matplotlib) or a dependency-free standalone SVG+HTML page.

    python scripts/plot_metrics.py runs/exp1 [runs/exp2 ...] -o curves.png
    python scripts/plot_metrics.py runs/exp1/metrics.jsonl --format html

Multiple run dirs overlay per-metric (labelled by run name) for A/B reads.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
from typing import Dict, List, Tuple

Series = Dict[str, Tuple[List[float], List[float]]]  # key -> (steps, values)


def load_metrics(path: str) -> Series:
    """Read one metrics.jsonl (or a run dir containing it) into per-key series."""
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    series: Series = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn tail write from a live run
            step = rec.get("step", 0)
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, (int, float)):
                    continue
                if isinstance(v, float) and math.isnan(v):
                    continue
                xs, ys = series.setdefault(k, ([], []))
                xs.append(float(step))
                ys.append(float(v))
    return series


def _run_label(path: str) -> str:
    p = path[:-len("metrics.jsonl")].rstrip("/") if path.endswith("metrics.jsonl") else path
    return os.path.basename(p.rstrip("/")) or p


def plot_png(runs: Dict[str, Series], out: str, dpi: int = 120):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted({k for s in runs.values() for k in s})
    if not keys:
        raise SystemExit("no scalar series found")
    ncols = min(3, len(keys))
    nrows = (len(keys) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3.2 * nrows),
                             squeeze=False)
    for i, key in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        for run, series in runs.items():
            if key in series:
                xs, ys = series[key]
                ax.plot(xs, ys, label=run, linewidth=1.2)
        ax.set_title(key)
        ax.set_xlabel("step")
        ax.grid(True, alpha=0.3)
        if len(runs) > 1:
            ax.legend(fontsize=8)
    for j in range(len(keys), nrows * ncols):
        axes[j // ncols][j % ncols].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=dpi)
    plt.close(fig)


def _svg_chart(key: str, runs: Dict[str, Series], w: int = 460, h: int = 280) -> str:
    """One inline SVG line chart (no dependencies)."""
    pad_l, pad_r, pad_t, pad_b = 52, 10, 24, 30
    pts_all = [(x, y) for s in runs.values() if key in s
               for x, y in zip(*s[key])]
    if not pts_all:
        return ""
    xs = [p[0] for p in pts_all]
    ys = [p[1] for p in pts_all]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    if x1 == x0:
        x1 = x0 + 1
    if y1 == y0:
        y1 = y0 + (abs(y0) or 1) * 1e-3
    def sx(x):
        return pad_l + (x - x0) / (x1 - x0) * (w - pad_l - pad_r)
    def sy(y):
        return h - pad_b - (y - y0) / (y1 - y0) * (h - pad_t - pad_b)
    colors = ["#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#ff7f0e", "#8c564b"]
    parts = [f'<svg width="{w}" height="{h}" xmlns="http://www.w3.org/2000/svg" '
             f'style="background:#fff;border:1px solid #ddd;margin:4px">',
             f'<text x="{w/2}" y="15" text-anchor="middle" '
             f'font-size="13" font-family="sans-serif">{key}</text>']
    for frac in (0.0, 0.5, 1.0):
        yv = y0 + frac * (y1 - y0)
        yy = sy(yv)
        parts.append(f'<line x1="{pad_l}" y1="{yy}" x2="{w-pad_r}" y2="{yy}" '
                     'stroke="#eee"/>')
        parts.append(f'<text x="{pad_l-4}" y="{yy+4}" text-anchor="end" '
                     f'font-size="10" font-family="sans-serif">{yv:.4g}</text>')
    for xv in (x0, x1):
        parts.append(f'<text x="{sx(xv)}" y="{h-10}" text-anchor="middle" '
                     f'font-size="10" font-family="sans-serif">{xv:.5g}</text>')
    for ci, (run, series) in enumerate(runs.items()):
        if key not in series:
            continue
        rx, ry = series[key]
        d = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(rx, ry))
        c = colors[ci % len(colors)]
        parts.append(f'<polyline points="{d}" fill="none" stroke="{c}" '
                     'stroke-width="1.4"/>')
        if len(runs) > 1:
            parts.append(f'<text x="{pad_l+6}" y="{pad_t + 12*ci + 8}" '
                         f'font-size="10" fill="{c}" '
                         f'font-family="sans-serif">{run}</text>')
    parts.append("</svg>")
    return "".join(parts)


def plot_html(runs: Dict[str, Series], out: str):
    keys = sorted({k for s in runs.values() for k in s})
    if not keys:
        raise SystemExit("no scalar series found")
    body = "\n".join(_svg_chart(k, runs) for k in keys)
    title = " vs ".join(runs)
    with open(out, "w") as f:
        f.write(f"<!doctype html><html><head><meta charset='utf-8'>"
                f"<title>{title}</title></head><body>"
                f"<h3 style='font-family:sans-serif'>{title}</h3>"
                f"{body}</body></html>")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("runs", nargs="+",
                   help="run dirs (containing metrics.jsonl) or jsonl paths")
    p.add_argument("-o", "--out", default=None,
                   help="output file (default: curves.png/html next to run 1)")
    p.add_argument("--format", choices=("png", "html"), default=None,
                   help="inferred from --out extension when omitted")
    p.add_argument("--keys", default=None,
                   help="comma-separated metric subset (default: all)")
    args = p.parse_args(argv)

    runs = {}
    for r in args.runs:
        label = _run_label(r)
        if label in runs:  # same basename from different dirs: disambiguate
            label = r.rstrip("/")
        runs[label] = load_metrics(r)
    if args.keys:
        keep = set(args.keys.split(","))
        runs = {r: {k: v for k, v in s.items() if k in keep}
                for r, s in runs.items()}

    fmt = args.format
    out = args.out
    if fmt is None:
        fmt = (out or "x.png").rsplit(".", 1)[-1]
        fmt = fmt if fmt in ("png", "html") else "png"
    if out is None:
        base = args.runs[0]
        base = base if os.path.isdir(base) else os.path.dirname(base) or "."
        out = os.path.join(base, f"curves.{fmt}")

    if fmt == "png":
        try:
            plot_png(runs, out)
        except ImportError:
            print("matplotlib unavailable; writing HTML instead", file=sys.stderr)
            out = out.rsplit(".", 1)[0] + ".html"
            plot_html(runs, out)
    else:
        plot_html(runs, out)
    print(out)
    return out


if __name__ == "__main__":
    main()

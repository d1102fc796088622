"""Training visuals: image grids + self-contained HTML gallery.

Replaces Style_Transfer/util/visualizer.py + html.py (visdom + dominate
dependencies) with a dependency-free writer: PNG dumps per epoch and a
static index.html the reference's web-gallery workflow maps onto.
"""
from __future__ import annotations

import html
import os
from typing import Dict

import numpy as np


def tensor2im(x: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 HWC (first batch element)."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    return ((np.clip(x, -1, 1) + 1) / 2 * 255).astype(np.uint8)


class HTMLGallery:
    """Static gallery writer (util/html.py equivalent)."""

    def __init__(self, web_dir: str, title: str = "frostnet_tpu GAN"):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.title = title
        self.rows = []

    def add_images(self, visuals: Dict[str, np.ndarray], prefix: str):
        from PIL import Image

        cells = []
        for name, img in visuals.items():
            fname = f"{prefix}_{name}.png"
            Image.fromarray(tensor2im(img)).save(os.path.join(self.img_dir, fname))
            cells.append((name, f"images/{fname}"))
        self.rows.append((prefix, cells))
        self._write()

    def _write(self):
        parts = [f"<html><head><title>{html.escape(self.title)}</title></head><body>",
                 f"<h1>{html.escape(self.title)}</h1>"]
        for prefix, cells in reversed(self.rows):
            parts.append(f"<h3>{html.escape(prefix)}</h3><table><tr>")
            for name, rel in cells:
                parts.append(
                    f"<td style='text-align:center'><img src='{rel}' "
                    f"style='max-width:256px'><br>{html.escape(name)}</td>")
            parts.append("</tr></table>")
        parts.append("</body></html>")
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write("\n".join(parts))


class Visualizer:
    """Loss logging + periodic image snapshots (util/visualizer.py)."""

    def __init__(self, save_dir: str, name: str = "experiment"):
        self.gallery = HTMLGallery(os.path.join(save_dir, "web"), name)
        self.loss_log = os.path.join(save_dir, "loss_log.txt")
        os.makedirs(save_dir, exist_ok=True)

    def display_current_results(self, visuals: Dict[str, np.ndarray], epoch: int):
        self.gallery.add_images(visuals, f"epoch{epoch:03d}")

    def print_current_losses(self, epoch: int, iters: int, losses: Dict[str, float]):
        msg = f"(epoch: {epoch}, iters: {iters}) " + " ".join(
            f"{k}: {v:.3f}" for k, v in losses.items())
        print(msg, flush=True)
        with open(self.loss_log, "a") as f:
            f.write(msg + "\n")

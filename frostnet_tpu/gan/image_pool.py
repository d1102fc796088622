"""Fake-image history buffer (Style_Transfer/util/image_pool.py:5-54).

Host-side state by design (the reference queries/updates it between
optimizer steps); kept in numpy with a seeded RNG.
"""
from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self.rng = np.random.RandomState(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        """50/50 return new images or swap with a random buffered one."""
        if self.pool_size == 0:
            return images
        out = []
        for img in np.asarray(images):
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.rand() > 0.5:
                i = self.rng.randint(0, self.pool_size)
                out.append(self.images[i].copy())
                self.images[i] = img.copy()
            else:
                out.append(img)
        return np.stack(out)

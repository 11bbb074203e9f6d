"""Synthetic TGS-like tile generator — for tests, benchmarks, and smoke
training runs when the Kaggle dataset is not on disk. (The reference has no
equivalent; its debug story is partial-dataset truncation, infer.py:207-210.)
"""

from __future__ import annotations

import numpy as np


def synthetic_tiles(n: int, size: int = 101, seed: int = 0):
    """Generate (images, masks) with salt-like blobby masks.

    images: (N, 1, size, size) float32 in [0, 1]
    masks:  (N, 1, size, size) float32 in {0, 1}
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    images = np.empty((n, 1, size, size), np.float32)
    masks = np.empty((n, 1, size, size), np.float32)
    for i in range(n):
        k = rng.integers(0, 4)
        m = np.zeros((size, size), np.float32)
        for _ in range(k):
            cx, cy = rng.random(2)
            rx, ry = 0.08 + 0.3 * rng.random(2)
            th = rng.random() * np.pi
            dx, dy = xx - cx, yy - cy
            u = dx * np.cos(th) + dy * np.sin(th)
            v = -dx * np.sin(th) + dy * np.cos(th)
            m = np.maximum(m, ((u / rx) ** 2 + (v / ry) ** 2 < 1).astype(np.float32))
        tex = rng.normal(0.5, 0.15, (size, size)).astype(np.float32)
        img = np.clip(tex + 0.25 * m + 0.1 * np.sin(8 * np.pi * (yy + 0.3 * xx)), 0, 1)
        images[i, 0] = img
        masks[i, 0] = m
    return images, masks


def synthetic_split(n_train: int = 32, n_val: int = 8, size: int = 101, seed: int = 0):
    """(x_train, x_valid, y_train, y_valid) in the reference's NCHW contract."""
    x, y = synthetic_tiles(n_train + n_val, size=size, seed=seed)
    return x[:n_train], x[n_train:], y[:n_train], y[n_train:]

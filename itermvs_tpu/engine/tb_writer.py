"""TensorBoard logging (reference: utils.py:70-100, train.py:78).

Thin wrapper over tf.summary with the reference's tag convention
(`{mode}/{key}`); degrades to a no-op if tensorflow is unavailable.
"""
from __future__ import annotations

import numpy as np


class SummaryWriter:
    def __init__(self, logdir: str):
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = None
            self._writer = None

    def save_scalars(self, mode: str, scalars: dict, global_step: int):
        if self._writer is None:
            return
        with self._writer.as_default(step=global_step):
            for key, value in scalars.items():
                self._tf.summary.scalar(f"{mode}/{key}", float(value))
        self._writer.flush()

    def save_images(self, mode: str, images: dict, global_step: int):
        """images: dict of [B, H, W, C] or [B, H, W] arrays; logs first item."""
        if self._writer is None:
            return
        with self._writer.as_default(step=global_step):
            for key, value in images.items():
                img = np.asarray(value)
                if img.ndim == 3:
                    img = img[..., None]
                img = img[:1].astype(np.float32)
                lo, hi = img.min(), img.max()
                if hi > lo:
                    img = (img - lo) / (hi - lo)
                self._tf.summary.image(f"{mode}/{key}", img)
        self._writer.flush()

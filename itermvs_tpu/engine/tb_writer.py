"""TensorBoard logging (reference: utils.py:70-100, train.py:78).

Thin wrapper with the reference's tag convention (`{mode}/{key}`).
Backend preference: torch.utils.tensorboard (present wherever torch
is), then tf.summary; degrades to a no-op if neither is available.
"""
from __future__ import annotations

import numpy as np


class SummaryWriter:
    def __init__(self, logdir: str):
        self._torch_writer = None
        self._tf = None
        self._tf_writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TorchWriter

            self._torch_writer = TorchWriter(log_dir=logdir)
            return
        except Exception:
            pass
        try:
            import tensorflow as tf

            self._tf = tf
            self._tf_writer = tf.summary.create_file_writer(logdir)
        except Exception:
            pass

    def save_scalars(self, mode: str, scalars: dict, global_step: int):
        if self._torch_writer is not None:
            for key, value in scalars.items():
                self._torch_writer.add_scalar(f"{mode}/{key}", float(value),
                                              global_step)
            self._torch_writer.flush()
        elif self._tf_writer is not None:
            with self._tf_writer.as_default(step=global_step):
                for key, value in scalars.items():
                    self._tf.summary.scalar(f"{mode}/{key}", float(value))
            self._tf_writer.flush()

    def save_images(self, mode: str, images: dict, global_step: int):
        """images: dict of [B, H, W, C] or [B, H, W] arrays; logs first item,
        min-max normalized (the reference normalizes too, utils.py:90-96)."""
        prepared = {}
        for key, value in images.items():
            img = np.asarray(value).astype(np.float32)
            if img.ndim == 3:
                img = img[..., None]
            img = img[0]
            lo, hi = float(img.min()), float(img.max())
            if hi > lo:
                img = (img - lo) / (hi - lo)
            prepared[key] = img                             # [H, W, C]

        if self._torch_writer is not None:
            for key, img in prepared.items():
                self._torch_writer.add_image(f"{mode}/{key}", img, global_step,
                                             dataformats="HWC")
            self._torch_writer.flush()
        elif self._tf_writer is not None:
            with self._tf_writer.as_default(step=global_step):
                for key, img in prepared.items():
                    self._tf.summary.image(f"{mode}/{key}", img[None])
            self._tf_writer.flush()

"""Experiment loggers: TensorBoard events, CSV, optional wandb.

Observability parity with the reference trainer's logger set
(/root/reference/launch.py:148-157 builds TensorBoardLogger + CSVLogger;
threestudio/utils/saving.py:56-75 adds optional wandb image/video
upload). Here loggers are tiny host-side objects the train loop fans
out to; everything degrades gracefully in headless/zero-egress
environments (wandb absent -> disabled with a warning, never an error).
"""
from __future__ import annotations

import csv
import os
from typing import Sequence

import numpy as np


class TensorBoardLogger:
    """Scalar/image event writer (tensorboardX)."""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        self.writer = SummaryWriter(log_dir)

    def log_scalars(self, step: int, scalars: dict):
        for k, v in scalars.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def log_image(self, step: int, tag: str, img):
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        self.writer.add_image(tag, arr, step, dataformats="HWC")

    def close(self):
        self.writer.close()


class CSVLogger:
    """Append-only metrics.csv (the reference's CSVLogger analogue)."""

    def __init__(self, path: str):
        self.path = path
        self._keys: list[str] | None = None
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log_scalars(self, step: int, scalars: dict):
        row = {"step": step, **{k: float(v) for k, v in scalars.items()
                                if np.isscalar(v) or np.ndim(v) == 0}}
        new_file = self._keys is None and not os.path.exists(self.path)
        if self._keys is None:
            self._keys = list(row)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys, extrasaction="ignore")
            if new_file:
                w.writeheader()
            w.writerow(row)

    def log_image(self, step: int, tag: str, img):
        pass

    def close(self):
        pass


class WandbLogger:
    """Optional wandb logging; disabled (with one warning) when the
    package is unavailable — zero-egress environments stay clean."""

    def __init__(self, project: str, name: str, config: dict | None = None):
        try:
            import wandb

            self._run = wandb.init(
                project=project, name=name, config=config or {}
            )
            self._wandb = wandb
        except Exception as e:  # module missing or offline init failure
            print(f"[loggers] wandb disabled: {e}")
            self._run = None
            self._wandb = None

    def log_scalars(self, step: int, scalars: dict):
        if self._run is not None:
            self._wandb.log(dict(scalars), step=step)

    def log_image(self, step: int, tag: str, img):
        if self._run is not None:
            self._wandb.log(
                {tag: self._wandb.Image(np.asarray(img))}, step=step
            )

    def close(self):
        if self._run is not None:
            self._run.finish()


class MultiLogger:
    """Fan-out to a set of loggers."""

    def __init__(self, loggers: Sequence):
        self.loggers = list(loggers)

    def log_scalars(self, step: int, scalars: dict):
        for lg in self.loggers:
            lg.log_scalars(step, scalars)

    def log_image(self, step: int, tag: str, img):
        for lg in self.loggers:
            lg.log_image(step, tag, img)

    def close(self):
        for lg in self.loggers:
            lg.close()

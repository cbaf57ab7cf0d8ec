"""Integration callback sinks (reference utils/callbacks/{tensorboard,...}).

Available sinks are registered onto a CallbackList; each degrades to a no-op
when its backend is missing (the reference gates on SETTINGS + import).
- TensorBoardSink: scalar curves via tf.summary (tensorboard ships with the
  baked-in tensorflow).
- CSVSink: results.csv mirror (the facade writes its own; this is for
  external consumers of the callback contract).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from fce_yolo_tpu.utils.callbacks import CallbackList

__all__ = ["TensorBoardSink", "CSVSink", "add_integration_callbacks"]


class TensorBoardSink:
    """Logs per-epoch scalars to runs/<name>/tb (reference callbacks/tensorboard.py)."""

    def __init__(self, log_dir: str):
        self.log_dir = str(log_dir)
        self._writer = None

    def _w(self):
        if self._writer is None:
            import tensorflow as tf

            self._writer = tf.summary.create_file_writer(self.log_dir)
        return self._writer

    def on_fit_epoch_end(self, trainer: Any = None, epoch: int = 0, metrics: dict | None = None, **kw):
        import tensorflow as tf

        with self._w().as_default():
            for k, v in (metrics or {}).items():
                if isinstance(v, (int, float)):
                    tf.summary.scalar(k, v, step=epoch)
            self._w().flush()

    def register(self, cbs: CallbackList):
        cbs.add("on_fit_epoch_end", self.on_fit_epoch_end)


class CSVSink:
    def __init__(self, path: str):
        self.path = Path(path)
        self._keys: list[str] | None = None

    def on_fit_epoch_end(self, trainer: Any = None, epoch: int = 0, metrics: dict | None = None, **kw):
        import csv

        metrics = {"epoch": epoch, **(metrics or {})}
        new = not self.path.exists()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(metrics.keys()))
            if new:
                w.writeheader()
            w.writerow({k: v for k, v in metrics.items()})

    def register(self, cbs: CallbackList):
        cbs.add("on_fit_epoch_end", self.on_fit_epoch_end)


def add_integration_callbacks(cbs: CallbackList, save_dir: str, tensorboard: bool = True) -> CallbackList:
    """Attach available sinks (reference add_integration_callbacks, callbacks/base.py:193)."""
    if tensorboard:
        try:
            import tensorflow  # noqa: F401

            TensorBoardSink(str(Path(save_dir) / "tb")).register(cbs)
        except ImportError:
            pass
    return cbs

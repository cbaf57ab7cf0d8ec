"""Presence heatmap over tracked detections (reference solutions/heatmap.py)."""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.solutions.base import BaseSolution

__all__ = ["Heatmap"]


class Heatmap(BaseSolution):
    def __init__(self, decay: float = 0.99, alpha: float = 0.5, **kw):
        super().__init__(**kw)
        self.decay = decay
        self.alpha = alpha
        self.acc: np.ndarray | None = None

    def process(self, result, tracks: np.ndarray):
        import cv2

        h, w = result.orig_shape
        if self.acc is None or self.acc.shape != (h, w):
            self.acc = np.zeros((h, w), np.float32)
        self.acc *= self.decay
        for row in tracks:
            x1, y1, x2, y2 = (int(v) for v in row[:4])
            self.acc[max(y1, 0) : min(y2, h), max(x1, 0) : min(x2, w)] += 1.0
        norm = self.acc / (self.acc.max() + 1e-6)
        heat = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        img = cv2.addWeighted(result.orig_img, 1 - self.alpha, heat, self.alpha, 0)
        return img, {"max_heat": float(self.acc.max())}

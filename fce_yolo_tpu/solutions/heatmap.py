"""Presence heatmap over tracked detections (reference solutions/heatmap.py).

Composite like the reference: Heatmap EXTENDS ObjectCounter, so a counting
line/region can be overlaid on the decaying heat accumulation
(reference heatmap.py:14 `class Heatmap(ObjectCounter)`), and each box
contributes +2 inside its inscribed circle rather than a flat rectangle
(reference heatmap_effect, heatmap.py:54-73).
"""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.solutions.base import SolutionResults
from fce_yolo_tpu.solutions.counter import ObjectCounter

__all__ = ["Heatmap"]


class Heatmap(ObjectCounter):
    def __init__(self, colormap: int | None = None, alpha: float = 0.5,
                 region: list[tuple[float, float]] | None = None, **kw):
        import cv2

        self.count_enabled = region is not None
        super().__init__(region=region, **kw)
        self.colormap = cv2.COLORMAP_JET if colormap is None else colormap
        self.alpha = alpha
        self.acc: np.ndarray | None = None

    def heatmap_effect(self, box) -> None:
        """+2 inside the box's inscribed circle (reference heatmap.py:54)."""
        h, w = self.acc.shape
        x0, y0, x1, y1 = (int(v) for v in box[:4])
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, w), min(y1, h)
        if x1 <= x0 or y1 <= y0:
            return
        radius_sq = (min(x1 - x0, y1 - y0) // 2) ** 2
        xv, yv = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        dist_sq = (xv - (x0 + x1) // 2) ** 2 + (yv - (y0 + y1) // 2) ** 2
        self.acc[y0:y1, x0:x1][dist_sq <= radius_sq] += 2.0

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        import cv2

        h, w = result.orig_shape
        if self.acc is None or self.acc.shape != (h, w):
            self.acc = np.zeros((h, w), np.float32)
        for row in tracks:
            self.heatmap_effect(row)

        if self.count_enabled:
            res = super().process(result, tracks)
            img = res.plot_im
        else:
            # reference returns the full counter field set even without a
            # region (heatmap.py:120-125): zero in/out + classwise counts
            classwise: dict[str, int] = {}
            for row in tracks:
                name = self.names.get(int(row[6]), str(int(row[6])))
                classwise[name] = classwise.get(name, 0) + 1
            res = SolutionResults(total_tracks=len(tracks), in_count=0,
                                  out_count=0, classwise_count=classwise)
            img = result.orig_img.copy()

        if self.acc.max() > 0:
            norm = cv2.normalize(self.acc, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
            heat = cv2.applyColorMap(norm, self.colormap)
            img = cv2.addWeighted(img, 1 - self.alpha, heat, self.alpha, 0)
        res.plot_im = img
        res.total_tracks = len(tracks)
        res.max_heat = float(self.acc.max())
        return res

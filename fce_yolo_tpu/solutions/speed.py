"""Speed estimation from track displacement (reference solutions/speed_estimation.py).

Pixel displacement per frame x meters-per-pixel x fps => km/h, averaged over
a short window per track id.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np

from fce_yolo_tpu.solutions.base import BaseSolution, SolutionResults

__all__ = ["SpeedEstimator"]


class SpeedEstimator(BaseSolution):
    def __init__(self, meters_per_pixel: float = 0.05, fps: float = 30.0, window: int = 5, **kw):
        super().__init__(**kw)
        self.mpp = meters_per_pixel
        self.fps = fps
        self.hist: dict[int, deque] = defaultdict(lambda: deque(maxlen=window))
        self.speeds: dict[int, float] = {}

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        ann = self.annotator(result.plot())
        for row in tracks:
            tid = int(row[4])
            c = np.array([(row[0] + row[2]) / 2, (row[1] + row[3]) / 2])
            self.hist[tid].append(c)
            pts = self.hist[tid]
            if len(pts) >= 2:
                dist_px = float(np.linalg.norm(pts[-1] - pts[0])) / (len(pts) - 1)
                self.speeds[tid] = dist_px * self.mpp * self.fps * 3.6  # km/h
                ann.adaptive_label(row[:4], f"{self.speeds[tid]:.1f} km/h",
                                   color=(104, 31, 17))
        return SolutionResults(plot_im=ann.result(),
                               speed_dict=dict(self.speeds),
                               total_tracks=len(tracks))

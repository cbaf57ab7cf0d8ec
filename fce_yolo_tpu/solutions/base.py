"""BaseSolution: shared model/tracker plumbing for vision apps
(reference solutions/solutions.py BaseSolution)."""

from __future__ import annotations

import numpy as np

__all__ = ["BaseSolution"]


class BaseSolution:
    """Owns a YOLO model + tracker; subclasses implement process(frame, tracks).

    Usage:
        sol = ObjectCounter(model="yolo11n.yaml", region=[(0, 300), (640, 300)])
        for frame_out in sol("video.mp4"):
            ...
    """

    def __init__(
        self,
        model: str = "yolo11n.yaml",
        tracker: str = "bytetrack.yaml",
        conf: float = 0.25,
        iou: float = 0.7,
        imgsz: int = 640,
        classes: list[int] | None = None,
        show: bool = False,
    ):
        from fce_yolo_tpu.api import YOLO

        self.model = model if not isinstance(model, str) else YOLO(model)
        self.tracker_cfg = tracker
        self.conf = conf
        self.iou = iou
        self.imgsz = imgsz
        self.classes = classes
        self.names = self.model.names

    def __call__(self, source, **kw):
        """Stream (annotated_frame, info dict) per frame."""
        from fce_yolo_tpu.trackers.track import track_stream

        for result, tracks in track_stream(
            self.model, source, tracker=self.tracker_cfg,
            conf=self.conf, iou=self.iou, imgsz=self.imgsz, **kw,
        ):
            if self.classes is not None and len(tracks):
                tracks = tracks[np.isin(tracks[:, 6].astype(int), self.classes)]
            yield self.process(result, tracks)

    def process(self, result, tracks: np.ndarray):
        raise NotImplementedError

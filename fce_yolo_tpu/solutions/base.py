"""Solutions core: BaseSolution + SolutionResults
(reference solutions/solutions.py BaseSolution:1-259, SolutionResults:763-828).
"""

from __future__ import annotations

import time

import numpy as np

from fce_yolo_tpu.solutions.config import SolutionConfig

__all__ = ["BaseSolution", "SolutionResults"]


class SolutionResults:
    """Typed result object every solution returns per frame
    (reference solutions.py:763-828): the annotated frame plus the metric
    fields each app fills in; unknown kwargs become extra attributes so
    solutions can carry app-specific extras (e.g. ``max_heat``)."""

    def __init__(self, **kwargs):
        self.plot_im: np.ndarray | None = None
        self.in_count = 0
        self.out_count = 0
        self.classwise_count: dict = {}
        self.queue_count = 0
        self.workout_count = 0
        self.workout_angle = 0.0
        self.workout_stage = None
        self.pixels_distance = 0.0
        self.available_slots = 0
        self.filled_slots = 0
        self.email_sent = False
        self.total_tracks = 0
        self.region_counts: dict = {}
        self.speed_dict: dict = {}
        self.total_crop_objects = 0
        self.speed: dict = {}
        self.__dict__.update(kwargs)

    def __str__(self) -> str:
        """Non-default fields only (reference solutions.py:818-828)."""
        attrs = {
            k: v for k, v in self.__dict__.items()
            if k != "plot_im" and not (v is None or v == {} or v == 0
                                       or v == 0.0 or v is False)
        }
        return ", ".join(f"{k}={v}" for k, v in attrs.items())


class BaseSolution:
    """Owns a YOLO model + tracker; subclasses implement
    ``process(result, tracks) -> SolutionResults``.

    Configuration flows through :class:`SolutionConfig` (reference
    solutions.py:60-150): every keyword is validated against the config
    surface, so unknown arguments raise instead of being dropped.

    Usage:
        sol = ObjectCounter(model="yolo11n.yaml", region=[(0, 300), (640, 300)])
        for result in sol("video.mp4"):
            result.plot_im, result.in_count, ...
    """

    def __init__(self, model: str = "yolo11n.yaml", **kwargs):
        from fce_yolo_tpu.api import YOLO

        self.CFG = SolutionConfig(model=model if isinstance(model, str)
                                  else None).update(**kwargs)
        self.model = model if not isinstance(model, str) else YOLO(model)
        self.tracker_cfg = self.CFG.tracker
        self.conf = self.CFG.conf
        self.iou = self.CFG.iou
        self.imgsz = 640
        self.classes = self.CFG.classes
        self.line_width = self.CFG.line_width
        self.names = self.model.names
        self.profilers = {"track": 0.0, "solution": 0.0}

    def annotator(self, img: np.ndarray):
        """A SolutionAnnotator over ``img`` at the configured line width."""
        from fce_yolo_tpu.solutions.annotator import SolutionAnnotator

        return SolutionAnnotator(np.ascontiguousarray(img),
                                 getattr(self, "line_width", 2))

    def __call__(self, source, **kw):
        """Stream one SolutionResults per frame, with per-stage timing in
        ``result.speed`` (reference solutions.py:231-259 profilers)."""
        from fce_yolo_tpu.trackers.track import track_stream

        t0 = time.perf_counter()
        for result, tracks in track_stream(
            self.model, source, tracker=self.tracker_cfg,
            conf=self.conf, iou=self.iou, imgsz=self.imgsz, **kw,
        ):
            t1 = time.perf_counter()
            if self.classes is not None and len(tracks):
                tracks = tracks[np.isin(tracks[:, 6].astype(int), self.classes)]
            out = self.process(result, tracks)
            t2 = time.perf_counter()
            out.speed = {"track": (t1 - t0) * 1e3, "solution": (t2 - t1) * 1e3}
            yield out
            t0 = time.perf_counter()

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        raise NotImplementedError

"""Vision solutions built on predict/track (reference solutions/ subset).

The reference ships 19 apps sharing BaseSolution (solutions/solutions.py).
Here: the base class + the most used ones — ObjectCounter (line/region
crossing counts) and Heatmap (accumulated presence) — running on the
framework's track_stream. More apps stack on the same base.
"""

from fce_yolo_tpu.solutions.base import BaseSolution
from fce_yolo_tpu.solutions.counter import ObjectCounter
from fce_yolo_tpu.solutions.heatmap import Heatmap
from fce_yolo_tpu.solutions.region_counter import RegionCounter
from fce_yolo_tpu.solutions.speed import SpeedEstimator

__all__ = ["BaseSolution", "Heatmap", "ObjectCounter", "RegionCounter", "SpeedEstimator"]

"""Vision solutions built on predict/track (reference solutions/, 19 apps
sharing BaseSolution in solutions/solutions.py).

All reference apps have an analog here, running on the framework's
track_stream: counting, heatmap, regions, speed, zones, queues, parking,
visual overlays, crops/blur, analytics charts, distance, alarms, workouts,
similarity search, and a headless batch-inference app. Environment
re-scopes are documented per class (no GUI/SMTP/CLIP offline).
"""

from fce_yolo_tpu.solutions.analytics import AIGym, Analytics, DistanceCalculation, SecurityAlarm
from fce_yolo_tpu.solutions.annotator import SolutionAnnotator
from fce_yolo_tpu.solutions.base import BaseSolution, SolutionResults
from fce_yolo_tpu.solutions.config import SolutionConfig
from fce_yolo_tpu.solutions.counter import ObjectCounter
from fce_yolo_tpu.solutions.heatmap import Heatmap
from fce_yolo_tpu.solutions.region_counter import RegionCounter
from fce_yolo_tpu.solutions.search import Inference, VisualAISearch
from fce_yolo_tpu.solutions.speed import SpeedEstimator
from fce_yolo_tpu.solutions.visuals import (
    InstanceSegmentation,
    ObjectBlurrer,
    ObjectCropper,
    VisionEye,
)
from fce_yolo_tpu.solutions.zone import ParkingManagement, QueueManager, TrackZone

__all__ = [
    "AIGym",
    "Analytics",
    "BaseSolution",
    "DistanceCalculation",
    "Heatmap",
    "Inference",
    "InstanceSegmentation",
    "ObjectBlurrer",
    "ObjectCropper",
    "ObjectCounter",
    "ParkingManagement",
    "QueueManager",
    "RegionCounter",
    "SecurityAlarm",
    "SolutionAnnotator",
    "SolutionConfig",
    "SolutionResults",
    "SpeedEstimator",
    "TrackZone",
    "VisionEye",
    "VisualAISearch",
]

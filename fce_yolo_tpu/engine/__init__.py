"""Engine layer: predictor, validator, results containers.

TPU-native analog of the reference's ultralytics/engine/ (BaseTrainer /
BaseValidator / BasePredictor / Results); the trainer lives in
fce_yolo_tpu/train/ and the user facade in fce_yolo_tpu/api.py.
"""

from fce_yolo_tpu.engine.predictor import DetectionPredictor, load_source
from fce_yolo_tpu.engine.results import Boxes, Results
from fce_yolo_tpu.engine.validator import DetectionValidator

__all__ = ["Boxes", "DetectionPredictor", "DetectionValidator", "Results", "load_source"]

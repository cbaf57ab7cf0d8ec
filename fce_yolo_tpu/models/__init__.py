"""Model-family facades beyond plain YOLO (reference models/ layer)."""

from fce_yolo_tpu.models.fastsam import FastSAM
from fce_yolo_tpu.models.nas import NAS
from fce_yolo_tpu.models.rtdetr import RTDETR
from fce_yolo_tpu.models.sam import SAM
from fce_yolo_tpu.models.sam2 import SAM2, SAM2VideoPredictor
from fce_yolo_tpu.models.sam3 import SAM3
from fce_yolo_tpu.models.world import YOLOWorld, YOLOWorldTrainable
from fce_yolo_tpu.models.yoloe import YOLOE

__all__ = ["FastSAM", "NAS", "RTDETR", "SAM", "SAM2", "SAM2VideoPredictor",
           "SAM3", "YOLOE", "YOLOWorld", "YOLOWorldTrainable"]

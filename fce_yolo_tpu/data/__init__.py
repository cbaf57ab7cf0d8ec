"""Data pipeline: datasets, host-side augmentation, prefetching loaders.

TPU-native equivalent of the reference's ultralytics/data/ layer
(BaseDataset/YOLODataset/v8_transforms/build_dataloader): cv2-thread
augmentation on the host, static padded shapes on the device.
"""

from fce_yolo_tpu.data.augment import AugmentCfg, letterbox, train_augment, val_transform
from fce_yolo_tpu.data.dataset import (
    YOLODataset,
    check_det_dataset,
    collate,
    polygon2mask,
    polygons2masks,
    polygons2masks_overlap,
)
from fce_yolo_tpu.data.instance import Bboxes, Instances
from fce_yolo_tpu.data.loader import DataLoader, build_dataloader
from fce_yolo_tpu.data.multimodal import (
    GroundingDataset,
    YOLOConcatDataset,
    YOLOMultiModalDataset,
    random_load_text,
)

__all__ = [
    "AugmentCfg",
    "Bboxes",
    "DataLoader",
    "GroundingDataset",
    "Instances",
    "YOLOConcatDataset",
    "YOLOMultiModalDataset",
    "random_load_text",
    "YOLODataset",
    "build_dataloader",
    "check_det_dataset",
    "collate",
    "letterbox",
    "train_augment",
    "val_transform",
]

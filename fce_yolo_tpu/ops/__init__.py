"""Numerics kernel layer: box geometry, IoU family, anchors, NMS, preprocessing.

Pure-jnp building blocks with static shapes throughout — every function here
is jittable and vmappable. Behavioral contracts follow the reference's
utils/{ops,metrics,tal,nms}.py but the implementations are vectorized
XLA-first designs (no data-dependent shapes, no host sync).
"""

from fce_yolo_tpu.ops.boxes import (
    box_area,
    clip_boxes,
    ltwh2xywh,
    ltwh2xyxy,
    make_divisible,
    scale_boxes,
    xywh2ltwh,
    xywh2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
)
from fce_yolo_tpu.ops.iou import bbox_iou, bbox_wiou, box_iou_pairwise
from fce_yolo_tpu.ops.anchors import (
    bbox2dist,
    dfl_expectation,
    dist2bbox,
    make_anchors,
)
from fce_yolo_tpu.ops.nms import batched_nms, single_image_nms
from fce_yolo_tpu.ops.geometry import (
    clean_str,
    clip_coords,
    masks2segments,
    regularize_rboxes,
    resample_segments,
    scale_coords,
    segment2box,
    segments2boxes,
    xywhn2xyxy,
    xywhr2xyxyxyxy,
    xyxy2xywhn,
    xyxyxyxy2xywhr,
)

__all__ = [
    "bbox2dist",
    "bbox_iou",
    "bbox_wiou",
    "batched_nms",
    "box_area",
    "box_iou_pairwise",
    "clip_boxes",
    "dfl_expectation",
    "dist2bbox",
    "ltwh2xywh",
    "ltwh2xyxy",
    "make_anchors",
    "make_divisible",
    "scale_boxes",
    "single_image_nms",
    "xywh2ltwh",
    "xywh2xyxy",
    "xyxy2ltwh",
    "xyxy2xywh",
]

"""SAHI-style sliced inference for small objects in large images.

Deploy-example analog of the reference's
examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py (which wraps the `sahi`
package): slice the image into overlapping tiles, run the detector on every
tile PLUS the full frame, shift tile detections back into the source frame,
and merge with class-aware NMS.

TPU notes: all tiles share one static shape, so the whole tile stack runs
through the predictor's single jitted program as a batch — slicing costs one
extra program execution, not one compile per tile. The window grid reuses
the framework's DOTA splitter (`fce_yolo_tpu.data.split_dota.get_windows`).

Usage:
    python tiled_predict.py --source big.jpg --model yolo11n.yaml \
        --tile 640 --overlap 0.25 --conf 0.25
"""

from __future__ import annotations

import argparse

import numpy as np

from fce_yolo_tpu.data.split_dota import get_windows
from fce_yolo_tpu.engine.results import Results
from fce_yolo_tpu.utils.metrics import box_iou_np

__all__ = ["tiled_predict"]


def _class_aware_nms(boxes: np.ndarray, scores: np.ndarray, cls: np.ndarray,
                     iou_thres: float) -> np.ndarray:
    """Greedy NMS with the reference's class-offset trick
    (ops.non_max_suppression max_wh): boxes of different classes never
    suppress each other."""
    if not len(boxes):
        return np.zeros((0,), np.int64)
    offset = cls[:, None] * 7680.0
    b = boxes + offset
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        iou = box_iou_np(b[i : i + 1], b[rest])[0]
        order = rest[iou <= iou_thres]
    return np.asarray(keep, np.int64)


def tiled_predict(
    model,
    img: np.ndarray,
    tile: int = 640,
    overlap: float = 0.25,
    conf: float = 0.25,
    iou: float = 0.7,
    max_det: int = 300,
    full_frame: bool = True,
) -> Results:
    """Detect over overlapping ``tile``-sized slices of ``img`` (BGR HWC).

    Returns one merged :class:`Results` in the source frame. ``full_frame``
    adds a whole-image pass so large objects spanning multiple tiles are
    still detected at their full extent (the SAHI "standard prediction").
    """
    h, w = img.shape[:2]
    gap = int(tile * overlap)
    windows = get_windows((h, w), crop_sizes=(tile,), gaps=(gap,))

    crops, origins = [], []
    for x1, y1, x2, y2 in windows:
        x1c, y1c = max(0, int(x1)), max(0, int(y1))
        crop = img[y1c : int(y2), x1c : int(x2)]
        if crop.shape[0] < 8 or crop.shape[1] < 8:
            continue
        # pad edge tiles to the static tile shape so every crop shares one
        # compiled program (padding is neutral 114-gray, the letterbox value)
        if crop.shape[:2] != (tile, tile):
            padded = np.full((tile, tile, 3), 114, img.dtype)
            padded[: crop.shape[0], : crop.shape[1]] = crop
            crop = padded
        crops.append(crop)
        origins.append((x1c, y1c))

    all_boxes = []
    results = model.predict(crops, conf=conf, iou=iou, imgsz=tile,
                            max_det=max_det, batch=len(crops) or 1)
    for r, (ox, oy) in zip(results, origins):
        d = np.asarray(r.boxes.data, np.float32)
        if len(d):
            d = d.copy()
            d[:, [0, 2]] += ox
            d[:, [1, 3]] += oy
            all_boxes.append(d)
    if full_frame:
        for r in model.predict(img, conf=conf, iou=iou,
                               imgsz=tile, max_det=max_det):
            d = np.asarray(r.boxes.data, np.float32)
            if len(d):
                all_boxes.append(d)

    merged = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 6), np.float32)
    merged[:, [0, 2]] = merged[:, [0, 2]].clip(0, w)
    merged[:, [1, 3]] = merged[:, [1, 3]].clip(0, h)
    keep = _class_aware_nms(merged[:, :4], merged[:, 4], merged[:, 5], iou)[:max_det]
    return Results(img, path="tiled", names=model.names, boxes=merged[keep])


def main() -> None:
    import cv2

    from fce_yolo_tpu import YOLO

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--model", default="yolo11n.yaml")
    ap.add_argument("--tile", type=int, default=640)
    ap.add_argument("--overlap", type=float, default=0.25)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.7)
    ap.add_argument("--out", default="tiled_out.jpg")
    args = ap.parse_args()

    img = cv2.imread(args.source)
    assert img is not None, f"cannot read {args.source}"
    res = tiled_predict(YOLO(args.model), img, tile=args.tile,
                        overlap=args.overlap, conf=args.conf, iou=args.iou)
    print(res.verbose())
    cv2.imwrite(args.out, res.plot())
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

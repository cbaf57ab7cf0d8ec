"""Standalone TFLite consumer — zero framework imports.

Deploy-example analog of the reference's examples/YOLOv8-TFLite-Python/main.py:
run a `.tflite` exported by `export_model(y, fmt="tflite")` with nothing but
numpy + cv2 + the TF Lite interpreter. Everything the runtime needs
(letterbox geometry, decode, NMS) is re-stated here in ~100 lines of numpy so
an edge deployment does not have to ship jax or fce_yolo_tpu.

The exporter writes a `<stem>.json` metadata sidecar next to the artifact
(imgsz, names, whether NMS was baked in); this script reads it when present.

Usage:
    python main.py --model yolo11n_640.tflite --source bus.jpg --conf 0.25
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import cv2
import numpy as np


def letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Resize + center-pad to (size, size); returns (image, ratio, (dw, dh))."""
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = round(h * r), round(w * r)
    dw, dh = (size - nw) // 2, (size - nh) // 2
    out = np.full((size, size, 3), 114, img.dtype)
    out[dh : dh + nh, dw : dw + nw] = cv2.resize(img, (nw, nh))
    return out, r, (dw, dh)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> list[int]:
    order = np.argsort(-scores)
    keep: list[int] = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        lt = np.maximum(boxes[i, :2], boxes[rest, :2])
        rb = np.minimum(boxes[i, 2:], boxes[rest, 2:])
        inter = np.clip(rb - lt, 0, None).prod(-1)
        area_i = np.clip(boxes[i, 2:] - boxes[i, :2], 0, None).prod(-1)
        area_r = np.clip(boxes[rest, 2:] - boxes[rest, :2], 0, None).prod(-1)
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_thres]
    return keep


def decode(preds: np.ndarray, conf_thres: float, iou_thres: float,
           max_det: int) -> np.ndarray:
    """(1, A, 4+nc) raw detect output -> (M, 6) xyxy/conf/cls (single-label,
    class-offset NMS — matches the framework's predict defaults)."""
    p = preds[0]
    xywh, scores = p[:, :4], p[:, 4:]
    cls = scores.argmax(-1)
    conf = scores.max(-1)
    m = conf >= conf_thres
    xywh, conf, cls = xywh[m], conf[m], cls[m]
    boxes = np.concatenate([xywh[:, :2] - xywh[:, 2:] / 2,
                            xywh[:, :2] + xywh[:, 2:] / 2], -1)
    keep = nms(boxes + cls[:, None] * 7680.0, conf, iou_thres)[:max_det]
    return np.concatenate([boxes[keep], conf[keep, None], cls[keep, None]], -1)


def main() -> None:
    from tensorflow import lite  # the only non-numpy runtime dependency

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.7)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--out", default="tflite_out.jpg")
    args = ap.parse_args()

    meta_path = Path(args.model).with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    size = int(meta.get("imgsz", 640))
    names = {int(k): v for k, v in meta.get("names", {}).items()}

    interp = lite.Interpreter(model_path=args.model)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]

    img = cv2.imread(args.source)
    assert img is not None, f"cannot read {args.source}"
    lb, r, (dw, dh) = letterbox(img, size)
    x = lb[..., ::-1].astype(np.float32)[None] / 255.0  # BGR->RGB, NHWC
    if inp["dtype"] == np.int8:  # int8 PTQ artifact
        s, zp = inp["quantization"]
        x = (x / s + zp).round().astype(np.int8)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y = interp.get_tensor(out["index"]).astype(np.float32)
    if out["dtype"] == np.int8:
        s, zp = out["quantization"]
        y = (y - zp) * s

    det = decode(y, args.conf, args.iou, args.max_det)
    det[:, [0, 2]] = (det[:, [0, 2]] - dw) / r
    det[:, [1, 3]] = (det[:, [1, 3]] - dh) / r
    for x1, y1, x2, y2, c, k in det:
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 2)
        cv2.putText(img, f"{names.get(int(k), int(k))} {c:.2f}",
                    (int(x1), int(y1) - 4), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 255, 0), 1)
    cv2.imwrite(args.out, img)
    print(f"{len(det)} detections -> {args.out}")


if __name__ == "__main__":
    main()

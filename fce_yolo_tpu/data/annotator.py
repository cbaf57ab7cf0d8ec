"""Auto-labeling: run a model over an image folder and write YOLO labels.

Behavioral parity target: reference data/annotator.py:10-66 (auto_annotate —
YOLO detector proposes boxes, SAM turns them into polygons, labels land as
one .txt per image). Pass ``sam_model`` (a ``fce_yolo_tpu.models.SAM``) and
the reference's exact two-stage pipeline runs: detector boxes prompt SAM,
the largest contour of each returned mask becomes the polygon row. Without
``sam_model``: a *-seg model writes polygons from its own mask contours and
a detect model writes normalized xywh box labels (both are valid YOLO-format
label trees this framework trains from).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

__all__ = ["auto_annotate"]


def _poly_line(c: int, poly: np.ndarray) -> str:
    return f"{c} " + " ".join(f"{v:.6g}" for v in poly.reshape(-1))


def _largest_contour(mask_u8: np.ndarray) -> np.ndarray | None:
    contours, _ = cv2.findContours(mask_u8, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    poly = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float64)
    return poly if len(poly) >= 3 else None


def auto_annotate(
    data: str | Path,
    model,
    sam_model=None,
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes: list[int] | None = None,
    output_dir: str | Path | None = None,
) -> Path:
    """Annotate every image under ``data`` with ``model`` (a fce_yolo_tpu
    ``YOLO`` facade or anything exposing ``.predict(source)`` -> Results).

    Returns the output label directory. With ``sam_model`` (a
    ``fce_yolo_tpu.models.SAM`` or anything exposing
    ``.predict(img, bboxes=...)`` -> masks in the original frame), detector
    boxes prompt SAM and polygon rows come from SAM's masks — the reference
    pipeline (data/annotator.py:50-62). Otherwise detect models produce
    ``cls cx cy w h`` rows and segment models produce ``cls x1 y1 x2 y2 ...``
    polygon rows from their own mask contours.
    """
    data = Path(data)
    out = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)

    results = model.predict(str(data), conf=conf, iou=iou, imgsz=imgsz, max_det=max_det)
    for r in results:
        h, w = r.orig_shape
        cls_ids = [int(c) for c in r.boxes.cls]
        if classes is not None:
            keep = [i for i, c in enumerate(cls_ids) if c in classes]
        else:
            keep = list(range(len(cls_ids)))
        if not keep:
            continue
        lines = []
        if sam_model is not None:
            # reference two-stage path: detector boxes -> SAM box prompts ->
            # polygons in the ORIGINAL frame (masks already original-sized)
            bboxes = np.asarray(r.boxes.xyxy, np.float32)[keep]
            sam_out = sam_model.predict(r.orig_img, bboxes=bboxes)
            for c, m in zip((cls_ids[i] for i in keep), np.asarray(sam_out.masks, np.uint8)):
                poly = _largest_contour(m)
                if poly is None:
                    continue
                poly[:, 0] /= w
                poly[:, 1] /= h
                lines.append(_poly_line(c, poly))
        else:
            masks = getattr(r, "masks", None)
            for i in keep:
                c = cls_ids[i]
                if masks is not None and masks.data is not None:
                    m = np.asarray(masks.data[i], np.uint8)
                    poly = _largest_contour(m)
                    if poly is None:
                        continue
                    # mask plane is model-input sized; normalize by its own shape
                    poly[:, 0] /= m.shape[1]
                    poly[:, 1] /= m.shape[0]
                    lines.append(_poly_line(c, poly))
                else:
                    x1, y1, x2, y2 = np.asarray(r.boxes.xyxy[i], np.float64)
                    cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                    bw, bh = (x2 - x1) / w, (y2 - y1) / h
                    lines.append(f"{c} {cx:.6g} {cy:.6g} {bw:.6g} {bh:.6g}")
        if lines:
            stem = Path(str(r.path)).stem or "image"
            (out / f"{stem}.txt").write_text("\n".join(lines) + "\n")
    return out

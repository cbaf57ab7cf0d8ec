"""Auto-labeling: run a model over an image folder and write YOLO labels.

Behavioral parity target: reference data/annotator.py:10-66 (auto_annotate —
YOLO detector proposes boxes, SAM turns them into polygons, labels land as
one .txt per image). The SAM family needs pretrained promptable weights that
cannot exist in this zero-egress environment, so the segmentation stage here
is the in-house segment task head: pass a *-seg model and polygon labels are
written from its mask contours; pass a detect model and normalized xywh box
labels are written (both are valid YOLO-format label trees this framework
trains from).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

__all__ = ["auto_annotate"]


def auto_annotate(
    data: str | Path,
    model,
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes: list[int] | None = None,
    output_dir: str | Path | None = None,
) -> Path:
    """Annotate every image under ``data`` with ``model`` (a fce_yolo_tpu
    ``YOLO`` facade or anything exposing ``.predict(source)`` -> Results).

    Returns the output label directory. Detect models produce
    ``cls cx cy w h`` rows; segment models produce ``cls x1 y1 x2 y2 ...``
    polygon rows from the largest mask contour (the reference's SAM stage
    analog).
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
        masks = getattr(r, "masks", None)
        for i in keep:
            c = cls_ids[i]
            if masks is not None and masks.data is not None:
                m = np.asarray(masks.data[i], np.uint8)
                contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                if not contours:
                    continue
                poly = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float64)
                # mask plane is model-input sized; normalize by its own shape
                poly[:, 0] /= m.shape[1]
                poly[:, 1] /= m.shape[0]
                if len(poly) < 3:
                    continue
                lines.append(f"{c} " + " ".join(f"{v:.6g}" for v in poly.reshape(-1)))
            else:
                x1, y1, x2, y2 = np.asarray(r.boxes.xyxy[i], np.float64)
                cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                bw, bh = (x2 - x1) / w, (y2 - y1) / h
                lines.append(f"{c} {cx:.6g} {cy:.6g} {bw:.6g} {bh:.6g}")
        if lines:
            stem = Path(str(r.path)).stem or "image"
            (out / f"{stem}.txt").write_text("\n".join(lines) + "\n")
    return out

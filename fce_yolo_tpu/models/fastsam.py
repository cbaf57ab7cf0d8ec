"""FastSAM: prompt-filtered full-image segmentation.

Behavioral parity target: reference models/fastsam/ (FastSAM model.py:14-69,
FastSAMPredictor.prompt predict.py:75-147). FastSAM is a single-class
YOLO-seg model segmenting *everything*, with prompts (boxes / points /
labels) selecting masks AFTER inference — no promptable transformer needed.
Text prompts require a CLIP text encoder and are rejected in this
zero-egress build (reference _clip_inference, predict.py:148-166).

No pretrained FastSAM weights can be downloaded here; construction from a
seg YAML (train-your-own) or any in-framework checkpoint works the same.
"""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.api import YOLO

__all__ = ["FastSAM"]


class FastSAM(YOLO):
    """Single-class segment-everything facade with prompt selection."""

    def __init__(self, model: str = "yolov8-seg.yaml", **kw):
        kw.setdefault("nc", 1)
        super().__init__(model, **kw)
        assert self.task == "segment", "FastSAM requires a segmentation model"

    def predict(self, source, bboxes=None, points=None, labels=None, texts=None,
                conf: float = 0.4, iou: float = 0.9, **kw):
        """Segment everything, then keep the prompt-selected instances."""
        if texts is not None:
            raise NotImplementedError(
                "text prompts need a CLIP text encoder, which has no offline "
                "weights in this environment (reference predict.py:148)"
            )
        results = super().predict(source, conf=conf, iou=iou, **kw)
        return self.prompt(results, bboxes=bboxes, points=points, labels=labels)

    @staticmethod
    def prompt(results, bboxes=None, points=None, labels=None):
        """Select masks by prompt (reference FastSAMPredictor.prompt,
        predict.py:75-147): a box keeps the mask maximizing IoU(box, mask);
        a foreground point keeps every mask containing it; background
        points (label 0) remove masks."""
        if bboxes is None and points is None:
            return results
        out = []
        for r in results if isinstance(results, list) else [results]:
            masks = getattr(r, "masks", None)
            n = len(r.boxes.cls) if r.boxes is not None else 0
            if n == 0 or masks is None or masks.data is None:
                out.append(r)
                continue
            m = np.asarray(masks.data) > 0.5  # (N, H, W) at model scale
            mh, mw = m.shape[1:]
            oh, ow = r.orig_shape
            sx, sy = mw / ow, mh / oh
            idx = np.zeros(n, bool)
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.float64))
                for b in bb:
                    x1, y1, x2, y2 = b
                    # to mask-plane coords
                    mx1, my1 = int(x1 * sx), int(y1 * sy)
                    mx2, my2 = int(x2 * sx), int(y2 * sy)
                    box_area = max(mx2 - mx1, 0) * max(my2 - my1, 0)
                    inter = m[:, my1:my2, mx1:mx2].sum(axis=(1, 2))
                    full = m.sum(axis=(1, 2))
                    union = box_area + full - inter
                    iou = inter / np.maximum(union, 1e-9)
                    idx[int(np.argmax(iou))] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.int64))
                lab = np.ones(len(pts), np.int64) if labels is None else np.asarray(labels, np.int64)
                assert len(lab) == len(pts), "labels must match points"
                point_idx = np.ones(n, bool) if lab.sum() == 0 else np.zeros(n, bool)
                for (px, py), l in zip(pts, lab):
                    hits = m[:, int(py * sy), int(px * sx)]
                    point_idx[hits] = bool(l)
                idx |= point_idx
            out.append(r[idx] if hasattr(r, "__getitem__") else _subset(r, idx))
        return out


def _subset(r, idx: np.ndarray):
    """Filter a Results object by boolean index (fallback when Results has
    no __getitem__)."""
    import copy

    rr = copy.copy(r)
    keep = np.nonzero(idx)[0]
    rr.boxes = r.boxes[keep] if hasattr(r.boxes, "__getitem__") else r.boxes
    if getattr(r, "masks", None) is not None and r.masks.data is not None:
        mm = copy.copy(r.masks)
        mm.data = np.asarray(r.masks.data)[keep]
        rr.masks = mm
    return rr

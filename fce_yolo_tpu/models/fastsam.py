"""FastSAM: prompt-filtered full-image segmentation.

Behavioral parity target: reference models/fastsam/ (FastSAM model.py:14-69,
FastSAMPredictor.prompt predict.py:75-147). FastSAM is a single-class
YOLO-seg model segmenting *everything*, with prompts (boxes / points /
labels) selecting masks AFTER inference — no promptable transformer needed.
Text prompts run the reference's `_clip_inference` selection
(predict.py:148-166) over the in-repo CLIP pair (nn/text_model.py +
nn/clip_vision.py): each detected region crop is embedded by the vision
tower, the query by the text tower, and the max-similarity region is kept.
Semantic quality needs a local CLIP checkpoint (`clip_weights=`); without
one the towers are random init (architecture-parity-tested, not semantic).

No pretrained FastSAM weights can be downloaded here; construction from a
seg YAML (train-your-own) or any in-framework checkpoint works the same.
"""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.api import YOLO

__all__ = ["FastSAM"]


class FastSAM(YOLO):
    """Single-class segment-everything facade with prompt selection."""

    def __init__(self, model: str = "yolov8-seg.yaml",
                 clip_weights: str | None = None, **kw):
        kw.setdefault("nc", 1)
        super().__init__(model, **kw)
        assert self.task == "segment", "FastSAM requires a segmentation model"
        self.clip_weights = clip_weights
        self._clip = None  # (text_encoder, image_encoder), built lazily

    def predict(self, source, bboxes=None, points=None, labels=None, texts=None,
                conf: float = 0.4, iou: float = 0.9, **kw):
        """Segment everything, then keep the prompt-selected instances."""
        results = super().predict(source, conf=conf, iou=iou, **kw)
        results = self.prompt(results, bboxes=bboxes, points=points, labels=labels)
        if texts is not None:
            results = [self._text_prompt(r, texts) for r in results]
        return results

    def _text_prompt(self, r, texts):
        """Reference `_clip_inference` (predict.py:148-166): crop each
        detected region, embed crops + texts with CLIP, keep the
        max-similarity region per text."""
        n = len(r.boxes.cls) if r.boxes is not None else 0
        if n == 0:
            return r
        if self._clip is None:
            from fce_yolo_tpu.nn.clip_vision import CLIPImageEncoder
            from fce_yolo_tpu.nn.text_model import CLIPTextEncoder

            self._clip = (CLIPTextEncoder(weights=self.clip_weights),
                          CLIPImageEncoder(weights=self.clip_weights))
        tenc, venc = self._clip
        texts = [texts] if isinstance(texts, str) else list(texts)
        h, w = r.orig_shape
        crops = []
        for x1, y1, x2, y2 in np.asarray(r.boxes.xyxy):
            x1, y1 = max(int(x1), 0), max(int(y1), 0)
            x2 = min(max(int(x2), x1 + 2), w)
            y2 = min(max(int(y2), y1 + 2), h)
            crops.append(r.orig_img[y1:y2, x1:x2])
        sim = venc.encode_image(crops) @ tenc.encode_text(texts).T  # (N, T)
        idx = np.zeros(n, bool)
        idx[np.argmax(sim, axis=0)] = True
        return r[idx] if hasattr(r, "__getitem__") else _subset(r, idx)

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

"""Tracking entrypoint: stream a source through predict + tracker
(reference trackers/track.py predictor-hook, re-expressed as a generator)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

from fce_yolo_tpu.trackers.bot_sort import BOTSORT
from fce_yolo_tpu.trackers.byte_tracker import BYTETracker, TrackerArgs

__all__ = ["build_tracker", "track_stream"]

TRACKER_DIR = Path(__file__).parent / "cfg"


def build_tracker(tracker: str = "bytetrack.yaml", frame_rate: int = 30,
                  encoder=None):
    """tracker: yaml name/path or 'bytetrack'/'botsort'. ``encoder`` is the
    optional ReID appearance callable (img, xyxy) -> (N, D) features used by
    BoT-SORT when with_reid is set."""
    name = str(tracker)
    cfg: dict = {}
    p = Path(name)
    if p.suffix == ".yaml":
        for cand in (p, TRACKER_DIR / p.name):
            if cand.exists():
                cfg = yaml.safe_load(cand.read_text()) or {}
                break
        else:
            name = p.stem  # fall through to defaults by name
    args = TrackerArgs(**{k: v for k, v in cfg.items() if k in TrackerArgs.__dataclass_fields__})
    ttype = cfg.get("tracker_type", "botsort" if "botsort" in name else "bytetrack")
    if ttype == "botsort":
        return BOTSORT(args, frame_rate, encoder=encoder)
    return BYTETracker(args, frame_rate)


def _crop_embed_encoder(model, imgsz: int = 128):
    """ReID encoder from the detector itself (the reference's with_reid
    model="auto" mode, bot_sort.py:189): each detection crop is embedded by
    YOLO.embed -> pooled deep features."""

    def encoder(img: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        crops = []
        for x1, y1, x2, y2 in boxes.astype(int):
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(max(x2, x1 + 2), w), min(max(y2, y1 + 2), h)
            crops.append(img[y1:y2, x1:x2])
        return np.stack(model.embed(crops, imgsz=imgsz)) if crops else np.zeros((0, 1))

    return encoder


def track_stream(model, source, tracker: str = "bytetrack.yaml", persist: bool = False, **predict_kw):
    """Yield (Results, tracks (M,7) [x1,y1,x2,y2,id,score,cls]) per frame."""
    tk = build_tracker(tracker, encoder=_crop_embed_encoder(model)
                       if hasattr(model, "embed") else None)
    for result in model.predict(source, stream=True, **predict_kw):
        b = result.boxes
        tracks = tk.update(b.xyxy, b.conf, b.cls, img=result.orig_img)
        yield result, tracks

"""Visual-output solutions: VisionEye, ObjectBlurrer, ObjectCropper,
InstanceSegmentation (reference solutions/{vision_eye,object_blurrer,
object_cropper,instance_segmentation}.py).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from fce_yolo_tpu.solutions.base import BaseSolution, SolutionResults

__all__ = ["VisionEye", "ObjectBlurrer", "ObjectCropper", "InstanceSegmentation"]


class VisionEye(BaseSolution):
    """Draw vision-mapping lines from a fixed eye point to every tracked
    object's centroid (reference vision_eye.py:20-67)."""

    def __init__(self, vision_point: tuple[int, int] = (20, 20), **kw):
        super().__init__(**kw)
        self.vision_point = tuple(int(v) for v in vision_point)

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        ann = self.annotator(result.plot())
        for row in tracks:
            ann.visioneye(row[:4], self.vision_point)
        return SolutionResults(plot_im=ann.result(), total_tracks=len(tracks))


class ObjectBlurrer(BaseSolution):
    """Gaussian-blur every detected region (reference object_blurrer.py:
    privacy masking; blur_ratio controls kernel size)."""

    def __init__(self, blur_ratio: float = 0.5, **kw):
        super().__init__(**kw)
        self.k = max(3, int(blur_ratio * 50) | 1)  # odd kernel

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        import cv2

        img = result.orig_img.copy()
        h, w = img.shape[:2]
        for row in tracks:
            x1, y1 = max(int(row[0]), 0), max(int(row[1]), 0)
            x2, y2 = min(int(row[2]), w), min(int(row[3]), h)
            if x2 > x1 and y2 > y1:
                img[y1:y2, x1:x2] = cv2.GaussianBlur(img[y1:y2, x1:x2], (self.k, self.k), 0)
        return SolutionResults(plot_im=img, total_tracks=len(tracks))


class ObjectCropper(BaseSolution):
    """Save a crop per detection (reference object_cropper.py)."""

    def __init__(self, crop_dir: str = "cropped-detections", **kw):
        super().__init__(**kw)
        self.crop_dir = Path(crop_dir)
        self.crop_dir.mkdir(parents=True, exist_ok=True)
        self.crop_idx = 0

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        import cv2

        img = result.orig_img
        h, w = img.shape[:2]
        for row in tracks:
            x1, y1 = max(int(row[0]), 0), max(int(row[1]), 0)
            x2, y2 = min(int(row[2]), w), min(int(row[3]), h)
            if x2 > x1 and y2 > y1:
                self.crop_idx += 1
                name = self.names.get(int(row[6]), str(int(row[6])))
                cv2.imwrite(str(self.crop_dir / f"{name}_{self.crop_idx}.jpg"), img[y1:y2, x1:x2])
        return SolutionResults(plot_im=result.plot(),
                               total_crop_objects=self.crop_idx,
                               total_tracks=len(tracks))


class InstanceSegmentation(BaseSolution):
    """Overlay instance masks from a segmentation model (reference
    instance_segmentation.py). Requires a -seg model; falls back to boxes
    when the result carries no masks."""

    def __init__(self, alpha: float = 0.5, **kw):
        kw.setdefault("model", "yolo11n-seg.yaml")
        super().__init__(**kw)
        self.alpha = alpha

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        img = result.plot()  # Results.plot overlays masks when present
        n_masks = 0 if result.masks is None else len(result.masks)
        return SolutionResults(plot_im=img, total_tracks=len(tracks),
                               masks=n_masks)

"""Classification dataset: torchvision-style class-folder tree
(reference data/dataset.py:690 ClassificationDataset).

Layout: root/<split>/<class_name>/*.jpg; class ids are the sorted folder
order. Train augment: random resized crop (scale 0.08-1.0 like the
reference's classify tf) + horizontal flip + HSV; val: resize + center crop.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from fce_yolo_tpu.data.dataset import IMG_FORMATS
from fce_yolo_tpu.utils.patches import imread

__all__ = ["ClassificationDataset", "classify_collate"]


class ClassificationDataset:
    def __init__(self, root: str, imgsz: int = 224, mode: str = "train", seed: int = 0,
                 fliplr: float = 0.5, hsv_v: float = 0.4, scale: tuple[float, float] = (0.08, 1.0)):
        self.root = Path(root)
        self.imgsz = imgsz
        self.mode = mode
        self.fliplr = fliplr
        self.hsv_v = hsv_v
        self.scale = scale
        classes = sorted(p.name for p in self.root.iterdir() if p.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.names = dict(enumerate(classes))
        self.samples: list[tuple[str, int]] = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix[1:].lower() in IMG_FORMATS:
                    self.samples.append((str(f), ci))
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.samples)

    def set_epoch(self, epoch: int, **kw):
        self._rng = np.random.default_rng(hash((epoch, len(self))) & 0x7FFFFFFF)

    def __getitem__(self, i: int) -> dict:
        path, label = self.samples[i]
        img = imread(path)
        if img is None:
            raise FileNotFoundError(path)
        s = self.imgsz
        h, w = img.shape[:2]
        if self.mode == "train":
            # random resized crop
            area = h * w
            for _ in range(10):
                target = self._rng.uniform(*self.scale) * area
                ar = self._rng.uniform(3 / 4, 4 / 3)
                cw = int(round(np.sqrt(target * ar)))
                ch = int(round(np.sqrt(target / ar)))
                if cw <= w and ch <= h:
                    x0 = int(self._rng.integers(0, w - cw + 1))
                    y0 = int(self._rng.integers(0, h - ch + 1))
                    img = img[y0 : y0 + ch, x0 : x0 + cw]
                    break
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
            if self.fliplr and self._rng.random() < self.fliplr:
                img = np.fliplr(img)
            if self.hsv_v:
                gain = 1 + self._rng.uniform(-1, 1) * self.hsv_v
                img = np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)
        else:
            img = val_transform(img, s)
        # BGR -> RGB at the pipeline exit (model consumes RGB, reference
        # classification tf works on PIL/RGB)
        return {"img": np.ascontiguousarray(img[..., ::-1]), "label": label}


def val_transform(img: np.ndarray, s: int) -> np.ndarray:
    """Resize shorter side to ``s`` then center crop s x s (reference
    classify val tf, data/augment.py:2447+). Color space untouched."""
    h, w = img.shape[:2]
    r = s / min(h, w)
    img = cv2.resize(img, (max(s, int(round(w * r))), max(s, int(round(h * r)))))
    hh, ww = img.shape[:2]
    y0, x0 = (hh - s) // 2, (ww - s) // 2
    return img[y0 : y0 + s, x0 : x0 + s]


def classify_collate(samples: list[dict]) -> dict:
    return {
        "img": np.stack([x["img"] for x in samples], 0),
        "label": np.asarray([x["label"] for x in samples], np.int32),
    }

"""Inference result containers (host-side numpy).

Analog of the reference's engine/results.py Results/Boxes (results.py:176,
:815) without the device-chaining machinery — in this framework everything
that reaches a Results object has already left the TPU as one fixed-shape
NMS dict, so the container is plain numpy with plotting/saving helpers.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["Boxes", "Results"]


class Boxes:
    """Final detection boxes for one image.

    Wraps (n, 6) [x1, y1, x2, y2, conf, cls] in original-image pixels.
    """

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data, np.float32).reshape(-1, 6)
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i) -> "Boxes":
        return Boxes(self.data[i], self.orig_shape)

    @property
    def xyxy(self) -> np.ndarray:
        return self.data[:, :4]

    @property
    def conf(self) -> np.ndarray:
        return self.data[:, 4]

    @property
    def cls(self) -> np.ndarray:
        return self.data[:, 5]

    @property
    def xywh(self) -> np.ndarray:
        b = self.data[:, :4]
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1
        )

    @property
    def xyxyn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.data[:, :4] / np.array([w, h, w, h], np.float32)

    @property
    def xywhn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h], np.float32)


class Masks:
    """Per-detection binary masks (n, H, W) at original-image resolution
    (reference results.py:1010)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data, bool)
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    @property
    def xy(self) -> list[np.ndarray]:
        """Mask contours as pixel polygons (reference masks2segments, ops.py:607)."""
        import cv2

        out = []
        for m in self.data.astype(np.uint8):
            cnts, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32) if cnts else np.zeros((0, 2), np.float32))
        return out


class Keypoints:
    """Per-detection keypoints (n, nkpt, 2|3) in original-image pixels
    (reference results.py:1096)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data, np.float32)
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    @property
    def xy(self) -> np.ndarray:
        return self.data[..., :2]

    @property
    def conf(self) -> np.ndarray | None:
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs:
    """Classification probabilities for one image (reference results.py:1205)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32).reshape(-1)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top5(self) -> list[int]:
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(self.data.max())

    @property
    def top5conf(self) -> np.ndarray:
        return self.data[self.top5]


class OBB:
    """Oriented boxes (reference Results OBB container, engine/results.py:1322).

    data rows: [cx, cy, w, h, angle(rad), conf, cls] in original-image pixels.
    """

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data, np.float32)
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i) -> "OBB":
        return OBB(self.data[i if isinstance(i, (slice, list, np.ndarray)) else [i]], self.orig_shape)

    @property
    def xywhr(self) -> np.ndarray:
        return self.data[:, :5]

    @property
    def conf(self) -> np.ndarray:
        return self.data[:, 5]

    @property
    def cls(self) -> np.ndarray:
        return self.data[:, 6]

    @property
    def xyxyxyxy(self) -> np.ndarray:
        """(N, 4, 2) corner polygons (reference ops.xywhr2xyxyxyxy)."""
        cx, cy, w, h, a = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(a), np.sin(a)
        dx1, dy1 = w / 2 * cos, w / 2 * sin
        dx2, dy2 = -h / 2 * sin, h / 2 * cos
        pts = np.stack([
            np.stack([cx + dx1 + dx2, cy + dy1 + dy2], -1),
            np.stack([cx + dx1 - dx2, cy + dy1 - dy2], -1),
            np.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1),
            np.stack([cx - dx1 + dx2, cy - dy1 + dy2], -1),
        ], 1)
        return pts.astype(np.float32)

    @property
    def xyxy(self) -> np.ndarray:
        """Axis-aligned hull of each rotated box (reference OBB.xyxy)."""
        p = self.xyxyxyxy
        return np.concatenate([p.min(1), p.max(1)], -1)


class Results:
    """One image's predictions + helpers (plot/save_txt/to-dict)."""

    def __init__(
        self,
        orig_img: np.ndarray,
        path: str,
        names: dict[int, str],
        boxes: np.ndarray | None = None,
        masks: np.ndarray | None = None,
        keypoints: np.ndarray | None = None,
        probs: np.ndarray | None = None,
        obb: np.ndarray | None = None,
        speed: dict | None = None,
    ):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.obb = OBB(obb, self.orig_shape) if obb is not None else None
        if boxes is None and obb is not None:
            # axis-aligned hulls keep .boxes usable for OBB results
            ob = self.obb
            boxes = np.concatenate([ob.xyxy, ob.conf[:, None], ob.cls[:, None]], 1)
        self.boxes = Boxes(boxes if boxes is not None else np.zeros((0, 6)), self.orig_shape)
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.speed = speed or {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}

    def __len__(self) -> int:
        return len(self.obb) if self.obb is not None else len(self.boxes)

    def __repr__(self) -> str:
        return f"Results(path={self.path!r}, n={len(self)}, shape={self.orig_shape})"

    def verbose(self) -> str:
        """Per-image log string (reference Results.verbose, engine/results.py):
        '2 persons, 1 bus, ' for detection tasks, top-5 probs for classify."""
        if self.probs is not None:
            return ", ".join(
                f"{self.names.get(i, str(i))} {self.probs.data[i]:.2f}" for i in self.probs.top5
            )
        if len(self) == 0:
            return "(no detections), "
        counts: dict[int, int] = {}
        for row in self.boxes.data:
            c = int(row[5])
            counts[c] = counts.get(c, 0) + 1
        return "".join(
            f"{n} {self.names.get(c, str(c))}{'s' if n > 1 else ''}, "
            for c, n in sorted(counts.items())
        )

    def summary(self, normalize: bool = False, decimals: int = 5) -> list[dict]:
        """Per-detection dicts incl. segments/keypoints when present
        (reference Results.summary, engine/results.py:749)."""
        h, w = (self.orig_shape if normalize else (1, 1))
        seg_xy = None
        if self.masks is not None and self.masks.data is not None:
            from fce_yolo_tpu.ops.geometry import masks2segments

            seg_xy = masks2segments(np.asarray(self.masks.data, np.uint8))
        out = []
        for i, row in enumerate(self.boxes.data):
            c = int(row[5])
            item = {
                "name": self.names.get(c, str(c)),
                "class": c,
                "confidence": round(float(row[4]), decimals),
                "box": {
                    k: round(float(v) / (w if k in ("x1", "x2") else h), decimals)
                    for k, v in zip(("x1", "y1", "x2", "y2"), row[:4])
                },
            }
            if seg_xy is not None and i < len(seg_xy) and len(seg_xy[i]):
                # segment coords are in the mask plane; normalize by it
                mh, mw = np.asarray(self.masks.data).shape[1:3]
                sx, sy = ((mw, mh) if normalize else (1, 1))
                item["segments"] = {
                    "x": [round(float(v) / sx, decimals) for v in seg_xy[i][:, 0]],
                    "y": [round(float(v) / sy, decimals) for v in seg_xy[i][:, 1]],
                }
            if self.keypoints is not None and i < len(self.keypoints.data):
                kp = np.asarray(self.keypoints.data[i])
                item["keypoints"] = {
                    "x": [round(float(v) / w, decimals) for v in kp[:, 0]],
                    "y": [round(float(v) / h, decimals) for v in kp[:, 1]],
                    "visible": [round(float(v), decimals) for v in
                                (kp[:, 2] if kp.shape[1] > 2 else np.ones(len(kp)))],
                }
            out.append(item)
        return out

    def to_json(self) -> str:
        import json

        return json.dumps(self.summary(), indent=2)

    def plot(self, line_width: int | None = None, font_scale: float = 0.5) -> np.ndarray:
        """Draw boxes (+ masks/keypoints when present) on a copy of the image."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(self.orig_shape) / 2 * 0.003), 2)
        if self.masks is not None:
            overlay = img.copy()
            for m, row in zip(self.masks.data, self.boxes.data):
                overlay[m] = _class_color(int(row[5]))
            img = cv2.addWeighted(img, 0.6, overlay, 0.4, 0)
        if self.keypoints is not None:
            for kpts in self.keypoints.data:
                for kp in kpts:
                    if kp.shape[-1] < 3 or kp[2] > 0.5:
                        cv2.circle(img, (int(kp[0]), int(kp[1])), max(lw, 2), (0, 255, 0), -1)
        if self.obb is not None:
            for poly, row in zip(self.obb.xyxyxyxy, self.obb.data):
                c = int(row[6])
                color = _class_color(c)
                cv2.polylines(img, [poly.astype(np.int32)], True, color, lw)
                x1, y1 = poly.min(0)
                label = f"{self.names.get(c, c)} {row[5]:.2f}"
                cv2.putText(img, label, (int(x1), int(y1) - 2),
                            cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
            return img
        for row in self.boxes.data:
            x1, y1, x2, y2, conf, c = row
            c = int(c)
            color = _class_color(c)
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
            label = f"{self.names.get(c, c)} {conf:.2f}"
            (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, font_scale, 1)
            cv2.rectangle(img, (int(x1), int(y1) - th - 4), (int(x1) + tw, int(y1)), color, -1)
            cv2.putText(
                img, label, (int(x1), int(y1) - 2), cv2.FONT_HERSHEY_SIMPLEX, font_scale, (255, 255, 255), 1
            )
        return img

    def save(self, filename: str) -> str:
        import cv2

        cv2.imwrite(filename, self.plot())
        return filename

    def save_txt(self, txt_file: str, save_conf: bool = False) -> str:
        """One `cls cx cy w h [conf]` normalized row per detection; OBB
        results write `cls x1 y1 ... x4 y4 [conf]` corner rows (reference
        Results.save_txt obb branch)."""
        lines = []
        if self.obb is not None:
            h, w = self.orig_shape
            norm = np.array([w, h] * 4, np.float32)
            for poly, row in zip(self.obb.xyxyxyxy, self.obb.data):
                vals = [int(row[6]), *(poly.reshape(8) / norm)]
                if save_conf:
                    vals.append(row[5])
                lines.append(" ".join(
                    f"{v:.6g}" if i else str(v) for i, v in enumerate(vals)))
            Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
            Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
            return txt_file
        for xywhn, row in zip(self.boxes.xywhn, self.boxes.data):
            vals = [int(row[5]), *xywhn]
            if save_conf:
                vals.append(row[4])
            lines.append(" ".join(f"{v:.6g}" if i else str(v) for i, v in enumerate(vals)))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))
        return txt_file

    def save_crop(self, save_dir: str, file_name: str = "im.jpg") -> None:
        """Save one crop per detection under save_dir/<class-name>/
        (reference Results.save_crop, engine/results.py:714)."""
        from fce_yolo_tpu.utils.annotator import save_one_box

        stem, suffix = Path(file_name).stem, Path(file_name).suffix or ".jpg"
        for i, row in enumerate(self.boxes.data):
            c = int(row[5])
            name = self.names.get(c, str(c))
            save_one_box(
                row[:4], self.orig_img,
                file=Path(save_dir) / name / f"{stem}{i}{suffix}", square=False,
            )

    def __getitem__(self, idx) -> "Results":
        """Index/slice detections into a new Results (reference
        Results.__getitem__)."""
        sel = np.atleast_1d(np.arange(len(self))[idx])
        pick = lambda c: None if c is None else np.asarray(c.data)[sel]
        return Results(
            self.orig_img, self.path, self.names,
            boxes=pick(self.boxes) if self.obb is None else None,
            masks=pick(self.masks),
            keypoints=pick(self.keypoints),
            probs=self.probs.data if self.probs is not None else None,
            obb=pick(self.obb),
            speed=self.speed,
        )


def _class_color(c: int) -> tuple[int, int, int]:
    """Deterministic per-class BGR color."""
    rng = np.random.RandomState(c + 7)
    return tuple(int(v) for v in rng.randint(64, 255, 3))

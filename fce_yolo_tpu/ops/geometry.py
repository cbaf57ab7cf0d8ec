"""Host-side geometry utilities completing the reference ops surface.

Parity targets: reference utils/ops.py — segment2box:73, clip_coords:180,
xywhn2xyxy:243, xyxy2xywhn:268, xyxyxyxy2xywhr:339, xywhr2xyxyxyxy:361,
segments2boxes:406, resample_segments:422, scale_coords:554,
regularize_rboxes:589, masks2segments:607, clean_str:650. These are the
label-pipeline / postprocess helpers that run on host (numpy) — the jittable
device-side ops live in ops/boxes.py, ops/masks.py, ops/nms.py.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "segment2box", "clip_coords", "xywhn2xyxy", "xyxy2xywhn",
    "xyxyxyxy2xywhr", "xywhr2xyxyxyxy", "segments2boxes",
    "resample_segments", "scale_coords", "regularize_rboxes",
    "masks2segments", "clean_str",
]


def segment2box(segment: np.ndarray, width: int = 640, height: int = 640) -> np.ndarray:
    """(n, 2) polygon -> xyxy box over the inside-image points (reference
    ops.py:73; empty if no point lies inside)."""
    s = np.asarray(segment, np.float32)
    x, y = s[:, 0], s[:, 1]
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    if not len(x):
        return np.zeros(4, np.float32)
    return np.array([x.min(), y.min(), x.max(), y.max()], np.float32)


def clip_coords(coords: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Clip (..., 2) points to image bounds (h, w) (reference ops.py:180)."""
    out = np.asarray(coords, np.float32).copy()
    out[..., 0] = out[..., 0].clip(0, shape[1])
    out[..., 1] = out[..., 1].clip(0, shape[0])
    return out


def xywhn2xyxy(x: np.ndarray, w: int = 640, h: int = 640,
               padw: float = 0, padh: float = 0) -> np.ndarray:
    """Normalized xywh -> pixel xyxy (+ mosaic pad offset) (ops.py:243)."""
    x = np.asarray(x, np.float32)
    y = np.empty_like(x)
    xc, yc, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    y[..., 0] = w * (xc - bw / 2) + padw
    y[..., 1] = h * (yc - bh / 2) + padh
    y[..., 2] = w * (xc + bw / 2) + padw
    y[..., 3] = h * (yc + bh / 2) + padh
    return y


def xyxy2xywhn(x: np.ndarray, w: int = 640, h: int = 640, clip: bool = False,
               eps: float = 0.0) -> np.ndarray:
    """Pixel xyxy -> normalized xywh (ops.py:268)."""
    x = np.asarray(x, np.float32)
    if clip:
        x = x.copy()
        x[..., 0::2] = x[..., 0::2].clip(0, w - eps)
        x[..., 1::2] = x[..., 1::2].clip(0, h - eps)
    y = np.empty_like(x)
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2 / w
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2 / h
    y[..., 2] = (x[..., 2] - x[..., 0]) / w
    y[..., 3] = (x[..., 3] - x[..., 1]) / h
    return y


def xyxyxyxy2xywhr(x: np.ndarray) -> np.ndarray:
    """(N, 4, 2) or (N, 8) corner polygons -> (N, 5) cx cy w h rad via
    cv2.minAreaRect (reference ops.py:339: raw minAreaRect values, angle in
    (0, pi/2]; call :func:`regularize_rboxes` separately to canonicalize)."""
    import cv2

    pts = np.asarray(x, np.float32).reshape(-1, 4, 2)
    out = np.empty((len(pts), 5), np.float32)
    for i, p in enumerate(pts):
        (cx, cy), (w, h), a = cv2.minAreaRect(p)
        out[i] = [cx, cy, w, h, np.deg2rad(a)]
    return out


def xywhr2xyxyxyxy(x: np.ndarray) -> np.ndarray:
    """(N, 5) cx cy w h rad -> (N, 4, 2) corner polygons (ops.py:361)."""
    x = np.asarray(x, np.float32)
    cx, cy, w, h, a = (x[:, i] for i in range(5))
    cos, sin = np.cos(a), np.sin(a)
    dx1, dy1 = w / 2 * cos, w / 2 * sin
    dx2, dy2 = -h / 2 * sin, h / 2 * cos
    return np.stack([
        np.stack([cx + dx1 + dx2, cy + dy1 + dy2], -1),
        np.stack([cx + dx1 - dx2, cy + dy1 - dy2], -1),
        np.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1),
        np.stack([cx - dx1 + dx2, cy - dy1 + dy2], -1),
    ], 1).astype(np.float32)


def segments2boxes(segments: list[np.ndarray]) -> np.ndarray:
    """Polygon list -> (N, 4) normalized-frame xywh boxes (ops.py:406)."""
    boxes = []
    for s in segments:
        s = np.asarray(s, np.float32)
        boxes.append([s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()])
    b = np.asarray(boxes, np.float32).reshape(-1, 4)
    y = np.empty_like(b)
    y[:, 0] = (b[:, 0] + b[:, 2]) / 2
    y[:, 1] = (b[:, 1] + b[:, 3]) / 2
    y[:, 2] = b[:, 2] - b[:, 0]
    y[:, 3] = b[:, 3] - b[:, 1]
    return y


def resample_segments(segments: list[np.ndarray], n: int = 1000) -> list[np.ndarray]:
    """Up/down-sample each closed polygon to exactly n points by linear
    interpolation along the closed outline (ops.py:422). Upsampling keeps
    every original vertex and inserts the extra points between them;
    downsampling samples the outline uniformly."""
    out = []
    for s in segments:
        s = np.asarray(s, np.float32)
        if len(s) == n:
            out.append(s)
            continue
        closed = np.concatenate([s, s[:1]], 0)
        xp = np.arange(len(closed))
        if len(closed) < n:
            t = np.linspace(0, len(closed) - 1, n - len(closed))
            t = np.insert(t, np.searchsorted(t, xp), xp)
        else:
            t = np.linspace(0, len(closed) - 1, n)
        out.append(np.stack([np.interp(t, xp, closed[:, 0]),
                             np.interp(t, xp, closed[:, 1])], -1).astype(np.float32))
    return out


def scale_coords(img1_shape: tuple[int, int], coords: np.ndarray,
                 img0_shape: tuple[int, int], ratio_pad=None,
                 normalize: bool = False, padding: bool = True) -> np.ndarray:
    """Rescale (..., 2+) point coords from a letterboxed frame img1 back to
    the original frame img0 (reference ops.py:554; used for keypoints)."""
    coords = np.asarray(coords, np.float32).copy()
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0], ratio_pad[1]
    if padding:
        coords[..., 0] -= pad[0]
        coords[..., 1] -= pad[1]
    coords[..., 0] /= gain
    coords[..., 1] /= gain
    coords = clip_coords(coords, img0_shape)
    if normalize:
        coords[..., 0] /= img0_shape[1]
        coords[..., 1] /= img0_shape[0]
    return coords


def regularize_rboxes(rboxes: np.ndarray) -> np.ndarray:
    """Canonical rotated boxes: swap w/h so w >= h and keep angle in
    [0, pi/2) (reference ops.py:589)."""
    r = np.asarray(rboxes, np.float32).copy()
    w, h, a = r[..., 2].copy(), r[..., 3].copy(), r[..., 4].copy()
    swap = w < h
    r[..., 2] = np.where(swap, h, w)
    r[..., 3] = np.where(swap, w, h)
    r[..., 4] = np.where(swap, a + np.pi / 2, a) % np.pi
    return r


def masks2segments(masks: np.ndarray, strategy: str = "all") -> list[np.ndarray]:
    """(N, H, W) binary masks -> polygon per mask (reference ops.py:607).
    strategy 'all': nearest-point-splice every contour into one traversable
    outline (via merge_multi_segment, like the reference); 'largest': the
    contour with the most points."""
    import cv2

    from fce_yolo_tpu.data.converter import merge_multi_segment

    out = []
    for m in np.asarray(masks, np.uint8):
        contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            out.append(np.zeros((0, 2), np.float32))
            continue
        if strategy == "largest":
            c = max(contours, key=len).reshape(-1, 2)
        elif len(contours) > 1:  # 'all': one spliced outline
            c = np.concatenate(
                merge_multi_segment([x.reshape(-1, 2) for x in contours])
            )
        else:
            c = contours[0].reshape(-1, 2)
        out.append(c.astype(np.float32))
    return out


def clean_str(s: str) -> str:
    """Replace special characters with underscores (reference ops.py:650)."""
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)

"""Host-side training augmentations (numpy/cv2) with static-shape outputs.

TPU-first split of the reference pipeline (ultralytics/data/augment.py:2372
`v8_transforms`): everything random/raggedy (mosaic, affine, HSV, flips)
runs on the host in loader workers and always emits a fixed (imgsz, imgsz, 3)
uint8 image plus pixel-xyxy boxes; padding to a static max-label count and
the /255 normalization happen at collate/device time so each train step is
ONE fixed-shape host->device transfer feeding a single jit.

Each transform is a pure function of (sample, rng) — no hidden `random`
module state (the reference uses global random; we thread numpy Generators
for reproducibility across worker threads).

Sample contract: {"img": (H, W, 3) uint8 BGR-or-RGB (pipeline-agnostic),
"cls": (n,) float, "bboxes": (n, 4) float pixel xyxy}.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import cv2
import numpy as np

__all__ = [
    "AugmentCfg",
    "letterbox",
    "mosaic4",
    "random_perspective",
    "random_hsv",
    "random_flip",
    "mixup",
    "cutmix",
    "train_augment",
    "val_transform",
]


@dataclass(frozen=True)
class AugmentCfg:
    """Hyperparameters, defaults matching reference cfg/default.yaml:108-125."""

    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0
    mosaic9: float = 0.0  # fraction of mosaic draws that use the 9-grid
    mixup: float = 0.0
    cutmix: float = 0.0
    copy_paste: float = 0.0


def letterbox(
    img: np.ndarray,
    new_shape: int | tuple[int, int] = 640,
    color: int = 114,
    scaleup: bool = True,
    center: bool = True,
    stride: int = 32,
    rect: bool = False,
) -> tuple[np.ndarray, float, tuple[float, float]]:
    """Aspect-preserving resize + pad to ``new_shape`` (reference augment.py:1509-1675).

    Returns (padded image, scale ratio, (padw, padh)). Boxes map as
    ``new = old * ratio + pad``.
    """
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    h0, w0 = img.shape[:2]
    r = min(new_shape[0] / h0, new_shape[1] / w0)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(w0 * r), round(h0 * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if rect:  # minimal stride-aligned padding instead of full square
        dw, dh = dw % stride, dh % stride
    if center:
        dw /= 2
        dh /= 2
    if (w0, h0) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(color,) * 3)
    return img, r, (left, top)


def _apply_letterbox_boxes(bboxes: np.ndarray, r: float, pad: tuple[float, float]) -> np.ndarray:
    if bboxes.size == 0:
        return bboxes
    out = bboxes * r
    out[:, [0, 2]] += pad[0]
    out[:, [1, 3]] += pad[1]
    return out


def box_candidates(
    before: np.ndarray,
    after: np.ndarray,
    wh_thr: float = 2.0,
    ar_thr: float = 100.0,
    area_thr: float = 0.1,
    eps: float = 1e-16,
) -> np.ndarray:
    """Keep boxes that survive an affine warp (reference augment.py box_candidates)."""
    w1, h1 = before[:, 2] - before[:, 0], before[:, 3] - before[:, 1]
    w2, h2 = after[:, 2] - after[:, 0], after[:, 3] - after[:, 1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(
    sample: dict,
    rng: np.random.Generator,
    cfg: AugmentCfg,
    border: tuple[int, int] = (0, 0),
    pre_letterbox: int | None = None,
) -> dict:
    """Random affine (rotate/scale/shear/translate/perspective) on image + boxes.

    Geometry matches reference augment.py:1080-1160: M = T@S@R@P@C about the
    image center, warp to size = input + 2*border, borderValue 114.
    """
    img, cls, bboxes = sample["img"], sample["cls"], sample["bboxes"]
    segments = sample.get("segments")
    keypoints = sample.get("keypoints")
    if pre_letterbox is not None:
        img, r, pad = letterbox(img, pre_letterbox)
        bboxes = _apply_letterbox_boxes(bboxes, r, pad)
        if segments is not None:
            segments = [s * r + np.array(pad, np.float32) for s in segments]
        if keypoints is not None:
            off = np.array([*pad, 0], np.float32)
            keypoints = [k * np.array([r, r, 1], np.float32) + off for k in keypoints]
    h, w = img.shape[:2]
    out_w, out_h = w + border[0] * 2, h + border[1] * 2

    C = np.eye(3, dtype=np.float32)
    C[0, 2], C[1, 2] = -w / 2, -h / 2
    P = np.eye(3, dtype=np.float32)
    P[2, 0] = rng.uniform(-cfg.perspective, cfg.perspective)
    P[2, 1] = rng.uniform(-cfg.perspective, cfg.perspective)
    R = np.eye(3, dtype=np.float32)
    a = rng.uniform(-cfg.degrees, cfg.degrees)
    s = rng.uniform(1 - cfg.scale, 1 + cfg.scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3, dtype=np.float32)
    S[0, 1] = math.tan(rng.uniform(-cfg.shear, cfg.shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-cfg.shear, cfg.shear) * math.pi / 180)
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = rng.uniform(0.5 - cfg.translate, 0.5 + cfg.translate) * out_w
    T[1, 2] = rng.uniform(0.5 - cfg.translate, 0.5 + cfg.translate) * out_h
    M = T @ S @ R @ P @ C

    if cfg.perspective:
        img = cv2.warpPerspective(img, M, dsize=(out_w, out_h), borderValue=(114, 114, 114))
    else:
        img = cv2.warpAffine(img, M[:2], dsize=(out_w, out_h), borderValue=(114, 114, 114))

    if len(bboxes):
        n = len(bboxes)
        pts = np.ones((n * 4, 3), np.float32)
        pts[:, :2] = bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        pts = pts @ M.T
        xy = (pts[:, :2] / pts[:, 2:3] if cfg.perspective else pts[:, :2]).reshape(n, 8)
        x, y = xy[:, 0::2], xy[:, 1::2]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], 1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, out_w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, out_h)
        keep = box_candidates(bboxes * s, new, area_thr=0.1)
        bboxes, cls = new[keep], cls[keep]
        if segments is not None:
            warped = []
            for seg in segments:
                p = np.concatenate([seg, np.ones((len(seg), 1), np.float32)], 1) @ M.T
                q = p[:, :2] / p[:, 2:3] if cfg.perspective else p[:, :2]
                q[:, 0] = q[:, 0].clip(0, out_w)
                q[:, 1] = q[:, 1].clip(0, out_h)
                warped.append(q.astype(np.float32))
            segments = [warped[i] for i in np.nonzero(keep)[0]]
        if keypoints is not None:
            warped_k = []
            for kp in keypoints:
                p = np.concatenate([kp[:, :2], np.ones((len(kp), 1), np.float32)], 1) @ M.T
                q = p[:, :2] / p[:, 2:3] if cfg.perspective else p[:, :2]
                vis = kp[:, 2].copy()
                oob = (q[:, 0] < 0) | (q[:, 0] > out_w) | (q[:, 1] < 0) | (q[:, 1] > out_h)
                vis[oob] = 0.0
                warped_k.append(np.concatenate([q, vis[:, None]], 1).astype(np.float32))
            keypoints = [warped_k[i] for i in np.nonzero(keep)[0]]
    out = {"img": img, "cls": cls, "bboxes": bboxes}
    if segments is not None:
        out["segments"] = segments
    if keypoints is not None:
        out["keypoints"] = keypoints
    return out


def mosaic4(samples: list[dict], imgsz: int, rng: np.random.Generator) -> dict:
    """Combine 4 samples into a (2*imgsz)^2 canvas around a random center.

    Matches reference augment.py:458-646 _mosaic4: center in
    [imgsz/2, 3*imgsz/2), quadrant placement with 114 fill. The caller
    follows with random_perspective(border=(-imgsz//2,)*2) to crop back.
    """
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
    all_cls, all_boxes = [], []
    all_segs: list | None = [] if any("segments" in x for x in samples[:4]) else None
    all_kpts: list | None = [] if any("keypoints" in x for x in samples[:4]) else None
    for i, sample in enumerate(samples[:4]):
        img = sample["img"]
        # pre-scale long side to imgsz (reference load_image does this)
        h0, w0 = img.shape[:2]
        r = s / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (min(round(w0 * r), s), min(round(h0 * r), s)), interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(sample["bboxes"]):
            b = sample["bboxes"] * r
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(sample["cls"])
            if all_segs is not None:
                off = np.array([padw, padh], np.float32)
                segs = sample.get("segments") or [
                    np.array([[bb[0], bb[1]], [bb[2], bb[1]], [bb[2], bb[3]], [bb[0], bb[3]]], np.float32)
                    for bb in sample["bboxes"]
                ]
                all_segs.extend([sg * r + off for sg in segs])
            if all_kpts is not None:
                offk = np.array([padw, padh, 0], np.float32)
                for kp in sample.get("keypoints", []):
                    all_kpts.append(kp * np.array([r, r, 1], np.float32) + offk)
    if all_boxes:
        boxes = np.concatenate(all_boxes, 0)
        cls = np.concatenate(all_cls, 0)
        boxes = boxes.clip(0, 2 * s)
        wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, cls = boxes[wh_ok], cls[wh_ok]
        if all_segs is not None:
            all_segs = [np.clip(sg, 0, 2 * s) for sg, ok in zip(all_segs, wh_ok) if ok]
        if all_kpts is not None:
            all_kpts = [kp for kp, ok in zip(all_kpts, wh_ok) if ok]
    else:
        boxes, cls = np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        all_segs = [] if all_segs is not None else None
        all_kpts = [] if all_kpts is not None else None
    out = {"img": canvas, "cls": cls, "bboxes": boxes}
    if all_segs is not None:
        out["segments"] = all_segs
    if all_kpts is not None:
        out["keypoints"] = all_kpts
    return out


def random_hsv(img: np.ndarray, rng: np.random.Generator, cfg: AugmentCfg) -> np.ndarray:
    """LUT-based random HSV jitter (reference augment.py:1346-1421)."""
    if not (cfg.hsv_h or cfg.hsv_s or cfg.hsv_v):
        return img
    r = rng.uniform(-1, 1, 3) * [cfg.hsv_h, cfg.hsv_s, cfg.hsv_v] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(256, dtype=r.dtype)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
    hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def random_flip(sample: dict, rng: np.random.Generator, cfg: AugmentCfg) -> dict:
    """Horizontal/vertical flips with box (+polygon) updates (reference augment.py:1422-1508)."""
    img, bboxes = sample["img"], sample["bboxes"]
    segments = sample.get("segments")
    keypoints = sample.get("keypoints")
    h, w = img.shape[:2]
    if cfg.flipud and rng.random() < cfg.flipud:
        img = np.flipud(img)
        if len(bboxes):
            bboxes = bboxes.copy()
            bboxes[:, [1, 3]] = h - bboxes[:, [3, 1]]
        if segments is not None:
            segments = [np.stack([s[:, 0], h - s[:, 1]], 1) for s in segments]
        if keypoints is not None:
            keypoints = [np.stack([k[:, 0], h - k[:, 1], k[:, 2]], 1) for k in keypoints]
    if cfg.fliplr and rng.random() < cfg.fliplr:
        img = np.fliplr(img)
        if len(bboxes):
            bboxes = bboxes.copy()
            bboxes[:, [0, 2]] = w - bboxes[:, [2, 0]]
        if segments is not None:
            segments = [np.stack([w - s[:, 0], s[:, 1]], 1) for s in segments]
        if keypoints is not None:
            keypoints = [np.stack([w - k[:, 0], k[:, 1], k[:, 2]], 1) for k in keypoints]
    out = {"img": np.ascontiguousarray(img), "cls": sample["cls"], "bboxes": bboxes}
    if segments is not None:
        out["segments"] = segments
    if keypoints is not None:
        out["keypoints"] = keypoints
    return out


def mixup(a: dict, b: dict, rng: np.random.Generator) -> dict:
    """Beta(32, 32) image blend, label union (reference augment.py:820-877)."""
    lam = rng.beta(32.0, 32.0)
    img = (a["img"].astype(np.float32) * lam + b["img"].astype(np.float32) * (1 - lam)).astype(np.uint8)
    return {
        "img": img,
        "cls": np.concatenate([a["cls"], b["cls"]], 0),
        "bboxes": np.concatenate([a["bboxes"], b["bboxes"]], 0),
    }


def cutmix(a: dict, b: dict, rng: np.random.Generator, beta: float = 1.0) -> dict:
    """Paste a random rectangle of b into a; keep b labels inside it
    (reference augment.py:878-991, simplified box-overlap filter)."""
    h, w = a["img"].shape[:2]
    lam = rng.beta(beta, beta)
    cut = math.sqrt(1 - lam)
    cw, ch = int(w * cut), int(h * cut)
    cx, cy = rng.integers(0, max(w - cw, 1)), rng.integers(0, max(h - ch, 1))
    img = a["img"].copy()
    bh, bw = b["img"].shape[:2]
    patch = cv2.resize(b["img"], (w, h)) if (bh, bw) != (h, w) else b["img"]
    img[cy : cy + ch, cx : cx + cw] = patch[cy : cy + ch, cx : cx + cw]
    # b labels whose centers fall inside the pasted window
    sx, sy = w / bw, h / bh
    bb = b["bboxes"] * np.array([sx, sy, sx, sy]) if len(b["bboxes"]) else b["bboxes"]
    if len(bb):
        cx_c = (bb[:, 0] + bb[:, 2]) / 2
        cy_c = (bb[:, 1] + bb[:, 3]) / 2
        inside = (cx_c >= cx) & (cx_c < cx + cw) & (cy_c >= cy) & (cy_c < cy + ch)
        bb, bcls = bb[inside], b["cls"][inside]
    else:
        bcls = b["cls"]
    return {
        "img": img,
        "cls": np.concatenate([a["cls"], bcls], 0),
        "bboxes": np.concatenate([a["bboxes"], bb], 0) if len(bb) else a["bboxes"],
    }


def copy_paste(a: dict, b: dict, rng: np.random.Generator, p: float = 0.5) -> dict:
    """Paste a fraction of b's segment instances into a (reference
    augment.py:1676-1774 'flip' CopyPaste mode pastes within-image; this is
    the cross-image variant used when a donor sample is available).

    Requires polygon segments; pixels inside each chosen polygon are copied
    with their label. No-op for box-only samples.
    """
    import cv2

    if "segments" not in b or not len(b.get("cls", [])):
        return a
    h, w = a["img"].shape[:2]
    bh, bw = b["img"].shape[:2]
    img = a["img"].copy()
    new_cls = list(a["cls"])
    new_boxes = list(a["bboxes"])
    new_segs = list(a.get("segments", [])) if "segments" in a else None
    sx, sy = w / bw, h / bh
    for cls_v, seg in zip(b["cls"], b["segments"]):
        if rng.random() > p:
            continue
        pts = (seg * np.array([sx, sy], np.float32)).astype(np.float32)
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        if mask.sum() < 16:
            continue
        donor = cv2.resize(b["img"], (w, h)) if (bh, bw) != (h, w) else b["img"]
        img[mask > 0] = donor[mask > 0]
        lo, hi = pts.min(0), pts.max(0)
        new_cls.append(float(cls_v))
        new_boxes.append(np.array([lo[0], lo[1], hi[0], hi[1]], np.float32))
        if new_segs is not None:
            new_segs.append(pts)
    out = {
        "img": img,
        "cls": np.asarray(new_cls, np.float32),
        "bboxes": np.asarray(new_boxes, np.float32).reshape(-1, 4),
    }
    if new_segs is not None:
        out["segments"] = new_segs
    return out


def mosaic9(samples: list[dict], imgsz: int, rng: np.random.Generator) -> dict:
    """Combine 9 samples in a 3x3 ring around a center tile, cropped to a
    (2*imgsz)^2 canvas (reference augment.py:648-745 _mosaic9). Downstream is
    identical to mosaic4: random_perspective(border=(-imgsz//2,)*2).
    """
    s = imgsz
    canvas = np.full((3 * s, 3 * s, 3), 114, np.uint8)
    all_cls, all_boxes = [], []
    all_segs: list | None = [] if any("segments" in x for x in samples[:9]) else None
    all_kpts: list | None = [] if any("keypoints" in x for x in samples[:9]) else None
    hp = wp = h0 = w0 = 0
    for i, sample in enumerate(samples[:9]):
        img = sample["img"]
        ih, iw = img.shape[:2]
        r = s / max(ih, iw)
        if r != 1:
            img = cv2.resize(img, (min(round(iw * r), s), min(round(ih * r), s)),
                             interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = s, s, s + w, s + h
        elif i == 1:  # top
            c = s, s - h, s + w, s
        elif i == 2:  # top right
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:  # bottom
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:  # bottom left
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:  # left
            c = s - w, s + h0 - h, s, s + h0
        else:  # top left
            c = s - w, s + h0 - hp - h, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        x2, y2 = min(x2, 3 * s), min(y2, 3 * s)
        canvas[y1:y2, x1:x2] = img[y1 - padh : y2 - padh, x1 - padw : x2 - padw]
        hp, wp = h, w
        # labels shift by the tile origin minus the final s//2 ring crop
        offx, offy = padw - s // 2, padh - s // 2
        if len(sample["bboxes"]):
            b = sample["bboxes"] * r
            b[:, [0, 2]] += offx
            b[:, [1, 3]] += offy
            all_boxes.append(b)
            all_cls.append(sample["cls"])
            if all_segs is not None:
                off = np.array([offx, offy], np.float32)
                segs = sample.get("segments") or [
                    np.array([[bb[0], bb[1]], [bb[2], bb[1]], [bb[2], bb[3]], [bb[0], bb[3]]],
                             np.float32)
                    for bb in sample["bboxes"]
                ]
                all_segs.extend([sg * r + off for sg in segs])
            if all_kpts is not None:
                offk = np.array([offx, offy, 0], np.float32)
                for kp in sample.get("keypoints", []):
                    all_kpts.append(kp * np.array([r, r, 1], np.float32) + offk)
    crop = canvas[s // 2 : s // 2 + 2 * s, s // 2 : s // 2 + 2 * s]
    if all_boxes:
        boxes = np.concatenate(all_boxes, 0).clip(0, 2 * s)
        cls = np.concatenate(all_cls, 0)
        wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, cls = boxes[wh_ok], cls[wh_ok]
        if all_segs is not None:
            all_segs = [np.clip(sg, 0, 2 * s) for sg, ok in zip(all_segs, wh_ok) if ok]
        if all_kpts is not None:
            all_kpts = [kp for kp, ok in zip(all_kpts, wh_ok) if ok]
    else:
        boxes, cls = np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        all_segs = [] if all_segs is not None else None
        all_kpts = [] if all_kpts is not None else None
    out = {"img": crop, "cls": cls, "bboxes": boxes}
    if all_segs is not None:
        out["segments"] = all_segs
    if all_kpts is not None:
        out["keypoints"] = all_kpts
    return out


class Albumentations:
    """Optional pixel-level augmentation bridge (reference data/augment.py:1775).

    When the `albumentations` package is installed, applies the reference's
    pixel transform set (Blur / MedianBlur / ToGray / CLAHE at small probs)
    to the image only — box-safe by construction. When absent (the normal
    case in this environment) it is a logged no-op; the pipeline is
    unchanged. Randomness is seeded from the dataset's explicit RNG so runs
    stay reproducible.
    """

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A

            self.transform = A.Compose([
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
            ])
        except ImportError:
            pass
        except Exception as e:  # pragma: no cover - version drift
            from fce_yolo_tpu.utils.logger import LOGGER

            LOGGER.warning(f"Albumentations bridge disabled: {e}")

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        if self.transform is None or rng.random() >= self.p:
            return sample
        import random as _random

        _random.seed(int(rng.integers(0, 2**31)))
        sample["img"] = self.transform(image=sample["img"])["image"]
        return sample


_ALBUMENTATIONS: Albumentations | None = None


def _albumentations() -> Albumentations:
    global _ALBUMENTATIONS
    if _ALBUMENTATIONS is None:
        _ALBUMENTATIONS = Albumentations()
    return _ALBUMENTATIONS


def train_augment(
    get_sample,
    index: int,
    n_total: int,
    imgsz: int,
    cfg: AugmentCfg,
    rng: np.random.Generator,
    mosaic_enabled: bool = True,
) -> dict:
    """Full train-time pipeline for one output sample (reference v8_transforms).

    get_sample(i) must return a fresh {"img", "cls", "bboxes"} dict.
    """
    use_mosaic = mosaic_enabled and cfg.mosaic > 0 and rng.random() < cfg.mosaic
    if use_mosaic:
        nine = cfg.mosaic9 > 0 and rng.random() < cfg.mosaic9
        n_extra = 8 if nine else 3
        idxs = [index] + [int(rng.integers(0, n_total)) for _ in range(n_extra)]
        fn = mosaic9 if nine else mosaic4
        sample = fn([get_sample(i) for i in idxs], imgsz, rng)
        border = (-imgsz // 2, -imgsz // 2)
        sample = random_perspective(sample, rng, cfg, border=border)
    else:
        sample = random_perspective(get_sample(index), rng, cfg, pre_letterbox=imgsz)
    if cfg.copy_paste > 0 and rng.random() < cfg.copy_paste:
        donor = train_augment(
            get_sample, int(rng.integers(0, n_total)), n_total, imgsz, _no_mix(cfg), rng, mosaic_enabled
        )
        sample = copy_paste(sample, donor, rng, p=0.5)
    if cfg.mixup > 0 and rng.random() < cfg.mixup:
        other = train_augment(
            get_sample, int(rng.integers(0, n_total)), n_total, imgsz, _no_mix(cfg), rng, mosaic_enabled
        )
        sample = mixup(sample, other, rng)
    if cfg.cutmix > 0 and rng.random() < cfg.cutmix:
        other = train_augment(
            get_sample, int(rng.integers(0, n_total)), n_total, imgsz, _no_mix(cfg), rng, mosaic_enabled
        )
        sample = cutmix(sample, other, rng)
    sample = _albumentations()(sample, rng)
    sample["img"] = random_hsv(sample["img"], rng, cfg)
    sample = random_flip(sample, rng, cfg)
    return sample


def _no_mix(cfg: AugmentCfg) -> AugmentCfg:
    from dataclasses import replace

    return replace(cfg, mixup=0.0, cutmix=0.0, copy_paste=0.0)


def val_transform(sample: dict, imgsz: int) -> dict:
    """Val/predict path: letterbox only; records ratio/pad for box scale-back."""
    img, r, pad = letterbox(sample["img"], imgsz, scaleup=False)
    out = {
        "img": img,
        "cls": sample["cls"],
        "bboxes": _apply_letterbox_boxes(sample["bboxes"].copy(), r, pad),
        "ratio": r,
        "pad": pad,
        "orig_shape": sample["img"].shape[:2],
    }
    if "segments" in sample:
        out["segments"] = [s * r + np.array(pad, np.float32) for s in sample["segments"]]
    if "keypoints" in sample:
        out["keypoints"] = [
            k * np.array([r, r, 1], np.float32) + np.array([*pad, 0], np.float32)
            for k in sample["keypoints"]
        ]
    return out

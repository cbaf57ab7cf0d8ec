"""DOTA high-resolution image window-splitting for OBB training.

Behavioral parity target: reference data/split_dota.py:20-344 (get_windows
grid math, IoF >= 0.7 object assignment, ``name__size__x___y`` patch naming,
normalized label rewrite). The polygon/window intersection area is computed
with a dependency-free Sutherland-Hodgman clip against the axis-aligned
window instead of the reference's shapely requirement — exact for the convex
quad labels DOTA uses.

Directory contract (same as reference):
    data_root/images/{split}/*.jpg|png, data_root/labels/{split}/*.txt
    (label rows: cls x1 y1 x2 y2 x3 y3 x4 y4, normalized corners)
"""

from __future__ import annotations

import itertools
from math import ceil
from pathlib import Path

import cv2
import numpy as np

__all__ = [
    "bbox_iof",
    "load_yolo_dota",
    "get_windows",
    "get_window_obj",
    "crop_and_save",
    "split_images_and_labels",
    "split_trainval",
    "split_test",
]


def _clip_poly_area(poly: np.ndarray, rect: np.ndarray) -> float:
    """Area of a polygon clipped to an axis-aligned rect [x1, y1, x2, y2]."""
    pts = [tuple(p) for p in poly]
    for edge in range(4):  # left, top, right, bottom half-planes
        if not pts:
            return 0.0
        out = []
        for i, cur in enumerate(pts):
            prev = pts[i - 1]
            if edge == 0:
                ins_c, ins_p = cur[0] >= rect[0], prev[0] >= rect[0]
                axis, bound = 0, rect[0]
            elif edge == 1:
                ins_c, ins_p = cur[1] >= rect[1], prev[1] >= rect[1]
                axis, bound = 1, rect[1]
            elif edge == 2:
                ins_c, ins_p = cur[0] <= rect[2], prev[0] <= rect[2]
                axis, bound = 0, rect[2]
            else:
                ins_c, ins_p = cur[1] <= rect[3], prev[1] <= rect[3]
                axis, bound = 1, rect[3]
            if ins_c != ins_p:
                d = cur[axis] - prev[axis]
                t = (bound - prev[axis]) / d if d else 0.0
                out.append(
                    (prev[0] + t * (cur[0] - prev[0]), prev[1] + t * (cur[1] - prev[1]))
                )
            if ins_c:
                out.append(cur)
        pts = out
    if len(pts) < 3:
        return 0.0
    arr = np.array(pts)
    x, y = arr[:, 0], arr[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def bbox_iof(polygon1: np.ndarray, bbox2: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Intersection-over-foreground of quads (N, 8) vs rect windows (M, 4)."""
    polys = polygon1.reshape(-1, 4, 2).astype(np.float64)
    n, m = len(polys), len(bbox2)
    # AABB prefilter (reference h_overlaps fast path)
    lt = polys.min(axis=1)
    rb = polys.max(axis=1)
    inter_lt = np.maximum(lt[:, None], bbox2[None, :, :2])
    inter_rb = np.minimum(rb[:, None], bbox2[None, :, 2:])
    wh = np.clip(inter_rb - inter_lt, 0, None)
    coarse = wh[..., 0] * wh[..., 1]

    areas = np.array([_clip_poly_area(p, [-1e18, -1e18, 1e18, 1e18]) for p in polys])
    out = np.zeros((n, m))
    for i, j in zip(*np.nonzero(coarse)):
        out[i, j] = _clip_poly_area(polys[i], bbox2[j])
    return out / np.clip(areas[:, None], eps, None)


def load_yolo_dota(data_root: str, split: str = "train") -> list[dict]:
    """Collect {filepath, label (N, 9 normalized), ori_size} per image."""
    im_dir = Path(data_root) / "images" / split
    lb_dir = Path(data_root) / "labels" / split
    assert im_dir.is_dir(), f"missing {im_dir}"
    annos = []
    for f in sorted(im_dir.iterdir()):
        if f.suffix.lower() not in {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}:
            continue
        img = cv2.imread(str(f))
        if img is None:
            continue
        h, w = img.shape[:2]
        lp = lb_dir / (f.stem + ".txt")
        rows = []
        if lp.exists():
            rows = [r.split() for r in lp.read_text().splitlines() if r.strip()]
        label = np.array(rows, np.float32) if rows else np.zeros((0, 9), np.float32)
        annos.append({"filepath": str(f), "label": label, "ori_size": (h, w)})
    return annos


def get_windows(
    im_size: tuple[int, int],
    crop_sizes: tuple[int, ...] = (1024,),
    gaps: tuple[int, ...] = (200,),
    im_rate_thr: float = 0.6,
    eps: float = 0.01,
) -> np.ndarray:
    """Sliding-window grid (reference split_dota.py:101-151): step =
    crop - gap, last window snapped to the image edge, windows keeping less
    than ``im_rate_thr`` real-image area dropped (best kept if all drop)."""
    h, w = im_size
    windows = []
    for crop_size, gap in zip(crop_sizes, gaps):
        assert crop_size > gap, f"invalid crop_size gap pair [{crop_size} {gap}]"
        step = crop_size - gap
        xn = 1 if w <= crop_size else ceil((w - crop_size) / step + 1)
        xs = [step * i for i in range(xn)]
        if len(xs) > 1 and xs[-1] + crop_size > w:
            xs[-1] = w - crop_size
        yn = 1 if h <= crop_size else ceil((h - crop_size) / step + 1)
        ys = [step * i for i in range(yn)]
        if len(ys) > 1 and ys[-1] + crop_size > h:
            ys[-1] = h - crop_size
        start = np.array(list(itertools.product(xs, ys)), dtype=np.int64)
        stop = start + crop_size
        windows.append(np.concatenate([start, stop], axis=1))
    win = np.concatenate(windows, axis=0)

    clipped = win.copy()
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    im_areas = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    win_areas = (win[:, 2] - win[:, 0]) * (win[:, 3] - win[:, 1])
    im_rates = im_areas / win_areas
    if not (im_rates > im_rate_thr).any():
        im_rates[abs(im_rates - im_rates.max()) < eps] = 1
    return win[im_rates > im_rate_thr]


def get_window_obj(anno: dict, windows: np.ndarray, iof_thr: float = 0.7) -> list[np.ndarray]:
    """Assign denormalized labels to each window at IoF >= threshold."""
    h, w = anno["ori_size"]
    label = anno["label"].copy()
    if not len(label):
        return [np.zeros((0, 9), np.float32) for _ in range(len(windows))]
    label[:, 1::2] *= w
    label[:, 2::2] *= h
    iofs = bbox_iof(label[:, 1:], windows.astype(np.float64))
    return [label[iofs[:, i] >= iof_thr] for i in range(len(windows))]


def crop_and_save(
    anno: dict,
    windows: np.ndarray,
    window_objs: list[np.ndarray],
    im_dir: str,
    lb_dir: str,
    allow_background_images: bool = True,
) -> None:
    """Write each window patch + its re-normalized labels (reference naming
    ``{stem}__{size}__{x}___{y}``)."""
    im = cv2.imread(anno["filepath"])
    name = Path(anno["filepath"]).stem
    for i, window in enumerate(windows):
        x_start, y_start, x_stop, y_stop = window.tolist()
        new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
        patch = im[y_start:y_stop, x_start:x_stop]
        ph, pw = patch.shape[:2]
        label = window_objs[i].copy()
        if len(label) or allow_background_images:
            cv2.imwrite(str(Path(im_dir) / f"{new_name}.jpg"), patch)
        if len(label):
            label[:, 1::2] -= x_start
            label[:, 2::2] -= y_start
            label[:, 1::2] /= pw
            label[:, 2::2] /= ph
            with open(Path(lb_dir) / f"{new_name}.txt", "w") as f:
                for lb in label:
                    coords = " ".join(f"{c:.6g}" for c in lb[1:])
                    f.write(f"{int(lb[0])} {coords}\n")


def split_images_and_labels(
    data_root: str,
    save_dir: str,
    split: str = "train",
    crop_sizes: tuple[int, ...] = (1024,),
    gaps: tuple[int, ...] = (200,),
) -> None:
    im_dir = Path(save_dir) / "images" / split
    lb_dir = Path(save_dir) / "labels" / split
    im_dir.mkdir(parents=True, exist_ok=True)
    lb_dir.mkdir(parents=True, exist_ok=True)
    for anno in load_yolo_dota(data_root, split=split):
        windows = get_windows(anno["ori_size"], crop_sizes, gaps)
        window_objs = get_window_obj(anno, windows)
        crop_and_save(anno, windows, window_objs, str(im_dir), str(lb_dir))


def split_trainval(
    data_root: str,
    save_dir: str,
    crop_size: int = 1024,
    gap: int = 200,
    rates: tuple[float, ...] = (1.0,),
) -> None:
    """Split train and val sets, optionally at multiple scale rates."""
    crop_sizes, gaps = [], []
    for r in rates:
        crop_sizes.append(int(crop_size / r))
        gaps.append(int(gap / r))
    for split in ("train", "val"):
        split_images_and_labels(data_root, save_dir, split, tuple(crop_sizes), tuple(gaps))


def split_test(
    data_root: str,
    save_dir: str,
    crop_size: int = 1024,
    gap: int = 200,
    rates: tuple[float, ...] = (1.0,),
) -> None:
    """Split the (label-free) test set into windows."""
    crop_sizes, gaps = [], []
    for r in rates:
        crop_sizes.append(int(crop_size / r))
        gaps.append(int(gap / r))
    im_dir = Path(data_root) / "images" / "test"
    out_dir = Path(save_dir) / "images" / "test"
    out_dir.mkdir(parents=True, exist_ok=True)
    for f in sorted(im_dir.iterdir()) if im_dir.is_dir() else []:
        im = cv2.imread(str(f))
        if im is None:
            continue
        h, w = im.shape[:2]
        for window in get_windows((h, w), tuple(crop_sizes), tuple(gaps)):
            x_start, y_start, x_stop, y_stop = window.tolist()
            new_name = f"{f.stem}__{x_stop - x_start}__{x_start}___{y_start}"
            cv2.imwrite(str(out_dir / f"{new_name}.jpg"), im[y_start:y_stop, x_start:x_stop])

"""Dataset converters (reference data/converter.py): COCO JSON -> YOLO txt,
the 80<->91 COCO class-id maps, per-pixel mask -> polygon labels, DOTA ->
YOLO-OBB, and box-labels -> segment-labels via SAM."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

__all__ = [
    "convert_coco",
    "coco91_to_coco80_class",
    "coco80_to_coco91_class",
    "min_index",
    "merge_multi_segment",
    "convert_segment_masks_to_yolo_seg",
    "convert_dota_to_yolo_obb",
    "yolo_bbox2segment",
    "convert_to_multispectral",
]


def coco91_to_coco80_class() -> list[int | None]:
    """Paper-91 -> contiguous-80 class index map (reference converter.py:23)."""
    out: list[int | None] = [None] * 91
    idx = 0
    missing = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}  # ids absent from the 80-set (0-based)
    for i in range(91):
        if i in missing:
            continue
        out[i] = idx
        idx += 1
    return out


def coco80_to_coco91_class() -> list[int]:
    """Contiguous-80 -> paper-91 (1-based) class ids (reference
    converter.py:125); inverse of :func:`coco91_to_coco80_class`."""
    fwd = coco91_to_coco80_class()
    return [i + 1 for i, v in enumerate(fwd) if v is not None]


def min_index(arr1: np.ndarray, arr2: np.ndarray) -> tuple[int, int]:
    """Index pair with the shortest distance between two (N, 2)/(M, 2) point
    sets (reference converter.py:514)."""
    dis = ((arr1[:, None, :] - arr2[None, :, :]) ** 2).sum(-1)
    return tuple(np.unravel_index(np.argmin(dis, axis=None), dis.shape))  # type: ignore[return-value]


def merge_multi_segment(segments: list[list[float]]) -> list[np.ndarray]:
    """Connect a multi-polygon COCO segmentation into one traversable point
    list by splicing each part in at its nearest-point link (behavioral
    analog of reference converter.py:529 merge_multi_segment — the contract
    is a single connected polygon containing every part's points).
    """
    parts = [np.asarray(s, np.float64).reshape(-1, 2) for s in segments]
    merged = parts[0]
    for nxt in parts[1:]:
        i, j = min_index(merged, nxt)
        # splice nxt (rotated so its closest point comes first) after
        # merged's closest point, then return to the splice point so the
        # outline stays a closed traversal
        nxt_rot = np.roll(nxt, -j, axis=0)
        merged = np.concatenate(
            [merged[: i + 1], nxt_rot, nxt_rot[:1], merged[i : i + 1], merged[i + 1 :]]
        )
    return [merged]


def convert_coco(
    annotations_json: str | Path,
    save_dir: str | Path,
    use_segments: bool = False,
    cls91to80: bool = True,
) -> Path:
    """COCO instances JSON -> YOLO labels/<image_stem>.txt.

    Writes one `cls cx cy w h` (or polygon) row per annotation, normalized;
    returns the labels dir. Mirrors reference convert_coco semantics (skips
    iscrowd, clamps boxes, merges multi-part segmentations).
    """
    data = json.loads(Path(annotations_json).read_text())
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    images = {im["id"]: im for im in data["images"]}
    id_map = coco91_to_coco80_class() if cls91to80 else None

    # COCO category ids are arbitrary; build contiguous map when not 91->80
    if not cls91to80:
        cats = sorted(c["id"] for c in data.get("categories", []))
        cat_map = {cid: i for i, cid in enumerate(cats)}

    per_image: dict[int, list[str]] = defaultdict(list)
    for ann in data["annotations"]:
        if ann.get("iscrowd"):
            continue
        im = images[ann["image_id"]]
        w, h = im["width"], im["height"]
        if cls91to80:
            mapped = id_map[ann["category_id"] - 1]
            if mapped is None:
                continue
            cls_id = mapped
        else:
            cls_id = cat_map[ann["category_id"]]
        if use_segments and ann.get("segmentation"):
            seg = ann["segmentation"]
            if isinstance(seg, list) and seg:
                pts = (
                    merge_multi_segment(seg)[0].reshape(-1)
                    if len(seg) > 1
                    else np.asarray(seg[0], np.float64)
                )
                norm = [f"{x / (w if i % 2 == 0 else h):.6f}" for i, x in enumerate(pts)]
                per_image[ann["image_id"]].append(f"{cls_id} " + " ".join(norm))
                continue
        x, y, bw, bh = ann["bbox"]  # COCO ltwh pixels
        cx = min(max((x + bw / 2) / w, 0), 1)
        cy = min(max((y + bh / 2) / h, 0), 1)
        per_image[ann["image_id"]].append(
            f"{cls_id} {cx:.6f} {cy:.6f} {min(bw / w, 1):.6f} {min(bh / h, 1):.6f}"
        )

    for img_id, lines in per_image.items():
        stem = Path(images[img_id]["file_name"]).stem
        (save_dir / f"{stem}.txt").write_text("\n".join(lines) + "\n")
    return save_dir


def convert_segment_masks_to_yolo_seg(
    masks_dir: str | Path, output_dir: str | Path, classes: int
) -> Path:
    """Per-pixel class-id mask images -> YOLO polygon labels (reference
    converter.py:347): pixel value v in [1, classes] is class v-1; each
    connected region's external contour becomes one polygon row."""
    import cv2

    masks_dir, output_dir = Path(masks_dir), Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    for p in sorted(masks_dir.iterdir()):
        if p.suffix.lower() not in (".png", ".jpg", ".bmp", ".tiff", ".tif"):
            continue
        mask = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        if mask is None:
            continue
        h, w = mask.shape[:2]
        lines = []
        for v in np.unique(mask):
            if v == 0 or v > classes:  # 0 = background
                continue
            binary = (mask == v).astype(np.uint8)
            contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            for c in contours:
                if len(c) < 3:
                    continue
                poly = c.reshape(-1, 2).astype(np.float64)
                poly[:, 0] /= w
                poly[:, 1] /= h
                lines.append(f"{int(v) - 1} " + " ".join(f"{x:.6g}" for x in poly.reshape(-1)))
        (output_dir / f"{p.stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
    return output_dir


# DOTA v2.0 category names -> indices (reference converter.py:455-474)
DOTA_CLASSES = {
    "plane": 0, "ship": 1, "storage-tank": 2, "baseball-diamond": 3,
    "tennis-court": 4, "basketball-court": 5, "ground-track-field": 6,
    "harbor": 7, "bridge": 8, "large-vehicle": 9, "small-vehicle": 10,
    "helicopter": 11, "roundabout": 12, "soccer-ball-field": 13,
    "swimming-pool": 14, "container-crane": 15, "airport": 16, "helipad": 17,
}


def convert_dota_to_yolo_obb(dota_root_path: str | Path) -> None:
    """DOTA original annotations -> normalized YOLO-OBB labels (reference
    converter.py:422). Expects images/{train,val} + labels/{phase}_original;
    writes labels/{phase}/<stem>.txt rows `cls x1 y1 x2 y2 x3 y3 x4 y4`."""
    import cv2

    root = Path(dota_root_path)
    for phase in ("train", "val"):
        image_dir = root / "images" / phase
        orig_dir = root / "labels" / f"{phase}_original"
        save_dir = root / "labels" / phase
        if not image_dir.is_dir():
            continue
        save_dir.mkdir(parents=True, exist_ok=True)
        for ip in sorted(image_dir.iterdir()):
            if ip.suffix.lower() not in (".png", ".jpg"):
                continue
            img = cv2.imread(str(ip))
            if img is None:
                continue
            h, w = img.shape[:2]
            src = orig_dir / f"{ip.stem}.txt"
            if not src.exists():
                continue
            lines = []
            for line in src.read_text().splitlines():
                parts = line.split()
                if len(parts) < 9 or parts[8] not in DOTA_CLASSES:
                    continue
                coords = np.asarray(parts[:8], np.float64)
                coords[0::2] /= w
                coords[1::2] /= h
                lines.append(
                    f"{DOTA_CLASSES[parts[8]]} " + " ".join(f"{c:.6g}" for c in coords)
                )
            (save_dir / f"{ip.stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))


def yolo_bbox2segment(
    im_dir: str | Path,
    save_dir: str | Path | None = None,
    sam_model=None,
) -> Path:
    """Upgrade a detect dataset's box labels to segment polygon labels with
    SAM (reference converter.py:580): each label box prompts the promptable
    predictor, the largest mask contour replaces the box row.

    ``im_dir`` follows YOLO layout: images in im_dir, labels in the sibling
    ``labels`` tree (im_dir path with /images/ -> /labels/). ``sam_model``
    is a :class:`fce_yolo_tpu.models.SAM` (or anything exposing
    ``.predict(img, bboxes=...)``); required — this converter IS the SAM
    stage."""
    import cv2

    assert sam_model is not None, "yolo_bbox2segment needs a SAM model"
    im_dir = Path(im_dir)
    lbl_dir = Path(str(im_dir).replace("/images", "/labels"))
    out = Path(save_dir) if save_dir else lbl_dir.parent / f"{lbl_dir.name}-segment"
    out.mkdir(parents=True, exist_ok=True)

    for ip in sorted(im_dir.iterdir()):
        if ip.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        lp = lbl_dir / f"{ip.stem}.txt"
        if not lp.exists():
            continue
        img = cv2.imread(str(ip))
        if img is None:
            continue
        h, w = img.shape[:2]
        rows = [r.split() for r in lp.read_text().splitlines() if r.strip()]
        if not rows:
            (out / lp.name).write_text("")
            continue
        cls_ids = [int(float(r[0])) for r in rows]
        xywh = np.asarray([[float(v) for v in r[1:5]] for r in rows], np.float64)
        boxes = np.empty_like(xywh)
        boxes[:, 0] = (xywh[:, 0] - xywh[:, 2] / 2) * w
        boxes[:, 1] = (xywh[:, 1] - xywh[:, 3] / 2) * h
        boxes[:, 2] = (xywh[:, 0] + xywh[:, 2] / 2) * w
        boxes[:, 3] = (xywh[:, 1] + xywh[:, 3] / 2) * h
        res = sam_model.predict(img, bboxes=boxes)
        lines = []
        for c, m in zip(cls_ids, np.asarray(res.masks, np.uint8)):
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if not contours:
                continue
            poly = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float64)
            if len(poly) < 3:
                continue
            poly[:, 0] /= w
            poly[:, 1] /= h
            lines.append(f"{c} " + " ".join(f"{v:.6g}" for v in poly.reshape(-1)))
        (out / lp.name).write_text("\n".join(lines) + ("\n" if lines else ""))
    return out


def convert_to_multispectral(
    path: str | Path, n_channels: int = 10, replace: bool = False
) -> None:
    """RGB -> n-channel multispectral TIFF by linear wavelength interpolation
    (reference converter.py:698: bands at B=475/G=510/R=650 nm, targets on
    [450, 700] nm, linear with extrapolation beyond the RGB anchors)."""
    import cv2

    p = Path(path)
    if p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"):
                convert_to_multispectral(f, n_channels)
                if replace:
                    f.unlink()
        return

    img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB).astype(np.float64)
    # anchors sorted by wavelength: (B 475, G 510, R 650)
    wl = np.array([475.0, 510.0, 650.0])
    ch = np.stack([img[..., 2], img[..., 1], img[..., 0]], -1)  # B, G, R planes
    targets = np.linspace(450, 700, n_channels)
    # piecewise-linear with end-slope extrapolation (scipy-free)
    out = np.empty((*img.shape[:2], n_channels), np.float64)
    for i, t in enumerate(targets):
        k = 0 if t <= wl[1] else 1  # segment index
        w0, w1 = wl[k], wl[k + 1]
        f0, f1 = ch[..., k], ch[..., k + 1]
        out[..., i] = f0 + (t - w0) * (f1 - f0) / (w1 - w0)
    planes = np.clip(out, 0, 255).astype(np.uint8).transpose(2, 0, 1)
    cv2.imwritemulti(str(p.with_suffix(".tiff")), list(planes))

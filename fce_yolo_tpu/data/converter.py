"""Dataset converters (reference data/converter.py:855 subset that matters
for the detect/segment pipeline): COCO-format JSON -> YOLO txt labels, and
the 80<->91 COCO class-id maps."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

__all__ = ["convert_coco", "coco91_to_coco80_class"]


def coco91_to_coco80_class() -> list[int | None]:
    """Paper-91 -> contiguous-80 class index map (reference converter.py)."""
    out: list[int | None] = [None] * 91
    idx = 0
    missing = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}  # ids absent from the 80-set (0-based)
    for i in range(91):
        if i in missing:
            continue
        out[i] = idx
        idx += 1
    return out


def convert_coco(
    annotations_json: str | Path,
    save_dir: str | Path,
    use_segments: bool = False,
    cls91to80: bool = True,
) -> Path:
    """COCO instances JSON -> YOLO labels/<image_stem>.txt.

    Writes one `cls cx cy w h` (or polygon) row per annotation, normalized;
    returns the labels dir. Mirrors reference convert_coco semantics (skips
    iscrowd, clamps boxes).
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
                pts = seg[0]  # first polygon
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

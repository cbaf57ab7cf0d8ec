"""Dataset splitting utilities.

Behavioral parity targets: reference data/split.py:13-97
(split_classify_dataset — class-structured 80/20 directory split) and
:98-140 (autosplit — weighted train/val/test list files with the same
seed-0 random.choices assignment so splits reproduce).
"""

from __future__ import annotations

import random
import shutil
from pathlib import Path

from fce_yolo_tpu.data.dataset import IMG_FORMATS, img2label_path

__all__ = ["autosplit", "split_classify_dataset"]


def autosplit(
    path: str | Path,
    weights: tuple[float, float, float] = (0.9, 0.1, 0.0),
    annotated_only: bool = False,
) -> list[Path]:
    """Write autosplit_{train,val,test}.txt next to an images dir.

    Returns the list files written. Reproduces the reference's seed-0
    ``random.choices`` assignment exactly.
    """
    path = Path(path)
    files = sorted(x for x in path.rglob("*.*") if x.suffix[1:].lower() in IMG_FORMATS)
    random.seed(0)
    indices = random.choices([0, 1, 2], weights=weights, k=len(files))

    txts = [path.parent / f"autosplit_{s}.txt" for s in ("train", "val", "test")]
    for t in txts:
        if t.exists():
            t.unlink()
    handles = [open(t, "a") for t in txts]
    try:
        for img, i in zip(files, indices):
            if annotated_only and not Path(img2label_path(str(img))).exists():
                continue
            handles[i].write(f"./{img.relative_to(path.parent).as_posix()}\n")
    finally:
        for h in handles:
            h.close()
    return [t for t in txts if t.exists()]


def split_classify_dataset(source_dir: str | Path, train_ratio: float = 0.8) -> Path:
    """Split a class-per-directory classification tree into
    ``{source}_split/{train,val}/{class}/`` (reference split.py:13-97)."""
    source = Path(source_dir)
    out = source.parent / f"{source.name}_split"
    rng = random.Random(0)
    for cls_dir in sorted(p for p in source.iterdir() if p.is_dir()):
        imgs = sorted(x for x in cls_dir.iterdir() if x.suffix[1:].lower() in IMG_FORMATS)
        rng.shuffle(imgs)
        n_train = round(len(imgs) * train_ratio)
        for split, chunk in (("train", imgs[:n_train]), ("val", imgs[n_train:])):
            dst = out / split / cls_dir.name
            dst.mkdir(parents=True, exist_ok=True)
            for img in chunk:
                shutil.copy2(img, dst / img.name)
    return out

"""Generate fce_yolo_tpu/cfg/datasets/*.yaml from the reference registry.

The reference ships ~40 dataset YAMLs (ultralytics/cfg/datasets/). Class-name
tables, split layouts, kpt_shape/flip_idx and download URLs are factual
dataset metadata, not code; we re-emit them in our own file format with a
header that cites the source. Run from the repo root:

    python tools/gen_dataset_yamls.py
"""

from __future__ import annotations

from pathlib import Path

import yaml

REF = Path("/root/reference/ultralytics/cfg/datasets")
OUT = Path(__file__).resolve().parent.parent / "fce_yolo_tpu" / "cfg" / "datasets"

# The shipped subset: every dataset a reference user is likely to name on the
# CLI (the tiny *8 fixtures, the COCO family, the fork's coco_custom, plus
# one representative per task/domain). The rest resolve the same way if a
# user drops the YAML next to their data.
SHIP = [
    "coco8.yaml", "coco128.yaml", "coco.yaml", "coco_custom.yaml",
    "coco8-seg.yaml", "coco128-seg.yaml", "coco8-pose.yaml", "coco-pose.yaml",
    "coco8-grayscale.yaml", "coco8-multispectral.yaml",
    "dota8.yaml", "DOTAv1.yaml", "DOTAv1.5.yaml",
    "VOC.yaml", "VisDrone.yaml", "ImageNet.yaml",
    "african-wildlife.yaml", "tiger-pose.yaml", "hand-keypoints.yaml",
    "dog-pose.yaml", "crack-seg.yaml", "carparts-seg.yaml", "package-seg.yaml",
    "brain-tumor.yaml", "medical-pills.yaml", "signature.yaml",
    "GlobalWheat2020.yaml", "SKU-110K.yaml", "lvis.yaml", "Objects365.yaml",
    "open-images-v7.yaml", "xView.yaml", "Argoverse.yaml", "kitti.yaml",
    "HomeObjects-3K.yaml", "construction-ppe.yaml",
    "dota8-multispectral.yaml",
]

# Keys we carry through, in emission order.
KEYS = ["path", "train", "val", "test", "minival", "channels", "kpt_shape",
        "flip_idx", "names", "kpt_names", "download"]


def emit(name: str) -> None:
    src = REF / name
    d = yaml.safe_load(src.read_text())
    lines = [
        f"# {Path(name).stem} dataset config for fce-yolo-tpu.",
        f"# Factual metadata (classes, splits, keypoint layout) from the reference",
        f"# registry: ultralytics/cfg/datasets/{name}. This environment has no",
        "# network egress: datasets are NOT auto-downloaded — place the data at",
        "# `path` (relative paths resolve against FY_DATASETS_DIR or this file's",
        "# directory); the original download URL is kept below for completeness.",
        "",
    ]
    for k in KEYS:
        if k not in d or d[k] is None:
            if k in ("train", "val"):
                lines.append(f"{k}:")
            continue
        v = d[k]
        if isinstance(v, (str, int, float, bool)):
            sv = yaml.safe_dump(v, allow_unicode=True, default_flow_style=True).strip().removesuffix("\n...").strip()
            lines.append(f"{k}: {sv}")
        else:
            dumped = yaml.safe_dump({k: v}, sort_keys=False, default_flow_style=None,
                                    allow_unicode=True, width=100)
            lines.append(dumped.rstrip())
    (OUT / name).write_text("\n".join(lines) + "\n")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    done = []
    for name in SHIP:
        if (REF / name).exists():
            emit(name)
            done.append(name)
    print(f"wrote {len(done)} dataset YAMLs to {OUT}")


if __name__ == "__main__":
    main()

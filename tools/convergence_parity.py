"""Epochs-scale training-convergence parity vs the torch reference.

VERDICT r4 missing #3: the strongest feasible proxy for the <=0.1-mAP COCO
north star in an env with no COCO and no pretrained weights. Both frameworks
train the SAME model (yolo11n, import-matched random init), on the SAME
on-disk tiny dataset, with the SAME recipe (AdamW lr0=1e-3, 3-epoch warmup,
cosine decay, zero augmentation so the pixel streams match), for the same
epoch count — then each framework's own validator scores the converged EMA
weights and we compare final mAP50-95 + commit the loss/mAP curve overlay.

Reference pipeline driven in-process on CPU: engine/trainer.py:218
(_do_train), recipe shape from script/config.py:168-216 (AdamW + cosine +
warmup two-stage; single-stage here). Our side runs the public api.train.

Run (CPU-heavy, ~10-20 min):
    python tools/convergence_parity.py --epochs 40 --out runs/convergence
"""

from __future__ import annotations

import argparse
import contextlib
import csv
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"


def make_dataset(root: str, n: int = 32, imgsz: int = 96, seed: int = 7) -> str:
    """Deterministic 3-class rectangles dataset (conftest tiny_dataset's
    recipe, scaled up to n images so 40 epochs = 160 optimizer steps)."""
    import cv2

    rng = np.random.RandomState(seed)
    colors = [(230, 60, 40), (40, 230, 60), (40, 60, 230)]
    img_dir = os.path.join(root, "images", "train")
    lbl_dir = os.path.join(root, "labels", "train")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n):
        img = np.full((imgsz, imgsz, 3), 110, np.uint8)
        img += rng.randint(0, 12, img.shape, np.uint8)  # mild texture
        rows = []
        for _ in range(rng.randint(1, 4)):
            c = rng.randint(0, 3)
            w, h = rng.uniform(0.25, 0.5, 2)
            cx = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
            cy = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
            x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
            x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
            cv2.rectangle(img, (x1, y1), (x2, y2), colors[c], -1)
            rows.append(f"{c} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        cv2.imwrite(os.path.join(img_dir, f"im{i:03d}.jpg"), img[..., ::-1])
        with open(os.path.join(lbl_dir, f"im{i:03d}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
    yaml_path = os.path.join(root, "data.yaml")
    with open(yaml_path, "w") as f:
        f.write(
            f"path: {root}\ntrain: images/train\nval: images/train\n"
            "names:\n  0: red\n  1: green\n  2: blue\n"
        )
    return yaml_path


RECIPE = dict(
    optimizer="AdamW", lr0=1e-3, lrf=0.01, cos_lr=True,
    warmup_epochs=3.0, weight_decay=0.0005,
)
NO_AUG = dict(mosaic=0.0, mixup=0.0, copy_paste=0.0, hsv_h=0.0, hsv_s=0.0,
              hsv_v=0.0, degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
              perspective=0.0, flipud=0.0, fliplr=0.0)


@contextlib.contextmanager
def ref_path():
    """Reference import context: importlib-metadata shim + the torchvision
    stub the parity tests use (ultralytics.models imports SAM which imports
    torchvision, absent here; TorchNMS.nms is its documented exact match)."""
    import importlib.machinery as ilm
    import importlib.metadata as md
    import types

    orig = md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    md.version = fake_version
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__spec__ = ilm.ModuleSpec("torchvision", None)
        tv.__version__ = "0.23.0"
        tv_ops = types.ModuleType("torchvision.ops")

        def _nms(boxes, scores, iou_threshold):
            from ultralytics.utils.nms import TorchNMS

            return TorchNMS.nms(boxes, scores, iou_threshold)

        tv_ops.nms = _nms
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    if "polars" not in sys.modules:
        # trainer.save_model reads results.csv via polars (absent here) —
        # its read is try/excepted, so a raising stub degrades gracefully
        pl = types.ModuleType("polars")

        def _read_csv(*a, **k):
            raise RuntimeError("polars stub (absent in env)")

        pl.read_csv = _read_csv
        sys.modules["polars"] = pl
    sys.path.insert(0, REF)
    try:
        yield
    finally:
        sys.path.remove(REF)
        md.version = orig


def read_results_csv(path: str) -> dict:
    """column -> list[float] with whitespace-stripped headers."""
    with open(path) as f:
        rows = list(csv.reader(f))
    head = [h.strip() for h in rows[0]]
    cols = {h: [] for h in head}
    for r in rows[1:]:
        for h, v in zip(head, r):
            try:
                cols[h].append(float(v))
            except ValueError:
                cols[h].append(float("nan"))
    return cols


def train_reference(data_yaml: str, init_sd_out: str, out_dir: str,
                    epochs: int, batch: int, imgsz: int) -> dict:
    import torch

    with ref_path():
        # import the detect trainer directly — the top-level facade pulls
        # SAM3 which imports torchvision (absent in this env)
        from ultralytics.models.yolo.detect.train import DetectionTrainer
        from ultralytics.nn.tasks import DetectionModel

        torch.manual_seed(0)
        with contextlib.redirect_stdout(io.StringIO()):
            tm = DetectionModel("yolo11n.yaml", nc=3, verbose=False)
        # snapshot the INIT weights so the jax run starts from the same point
        torch.save({k: v.clone() for k, v in tm.state_dict().items()},
                   init_sd_out)
        overrides = dict(
            model="yolo11n.yaml", task="detect",
            data=data_yaml, epochs=epochs, batch=batch, imgsz=imgsz,
            device="cpu", workers=0, amp=False, plots=False, verbose=False,
            deterministic=True, seed=0, patience=10 * epochs, val=True,
            close_mosaic=0, project=out_dir, name="ref", exist_ok=True,
            **RECIPE, **NO_AUG,
        )
        tr = DetectionTrainer(overrides=overrides)
        tr.model = tm  # preset module: setup_model() keeps it (trainer.py:666)
        with contextlib.redirect_stdout(io.StringIO()):
            tr.train()
        res = read_results_csv(os.path.join(str(tr.save_dir), "results.csv"))
    return res


def train_ours(data_yaml: str, init_sd_path: str, out_dir: str,
               epochs: int, batch: int, imgsz: int, bf16_ema: bool = False) -> dict:
    import torch

    from fce_yolo_tpu.api import YOLO
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import init_variables

    y = YOLO("yolo11n.yaml", nc=3)
    import jax

    template = jax.tree_util.tree_map(
        lambda x: np.asarray(x),
        init_variables(y.model, jax.random.PRNGKey(0), imgsz=64),
    )
    sd = torch.load(init_sd_path, map_location="cpu", weights_only=True)
    y.variables = state_dict_to_variables(sd, template=template)
    extra = {"bf16_ema": True} if bf16_ema else {}
    y.train(
        data=data_yaml, epochs=epochs, batch=batch, imgsz=imgsz,
        workers=0, seed=0, project=out_dir, name="tpu", exist_ok=True,
        val=True, patience=10 * epochs, close_mosaic=0, bf16=False,
        verbose=False, **RECIPE, **NO_AUG, **extra,
    )
    return read_results_csv(os.path.join(out_dir, "tpu", "results.csv"))


def overlay(ref: dict, ours: dict, out_png: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    map_col = "metrics/mAP50-95(B)"
    box_col = "train/box_loss"
    for cols, name, style in ((ref, "torch reference", "--o"), (ours, "fce-yolo-tpu", "-s")):
        ep = cols.get("epoch", list(range(1, 1 + len(cols[map_col]))))
        axes[0].plot(ep, cols[map_col], style, label=name, ms=3)
        axes[1].plot(ep, cols[box_col], style, label=name, ms=3)
    axes[0].set_title("val mAP50-95 (EMA weights)")
    axes[1].set_title("train box loss")
    for ax in axes:
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)


def run(epochs: int, out: str, n_imgs: int = 32, batch: int = 8,
        imgsz: int = 64, bf16_ema: bool = False) -> dict:
    out = os.path.abspath(out)  # both frameworks resolve relative dataset
    os.makedirs(out, exist_ok=True)  # paths against their own roots
    data_yaml = make_dataset(os.path.join(out, "dataset"), n=n_imgs)
    init_sd = os.path.join(out, "init_state_dict.pt")
    ref = train_reference(data_yaml, init_sd, out, epochs, batch, imgsz)
    ours = train_ours(data_yaml, init_sd, out, epochs, batch, imgsz,
                      bf16_ema=bf16_ema)
    map_col = "metrics/mAP50-95(B)"
    summary = {
        "epochs": epochs, "n_imgs": n_imgs, "batch": batch, "imgsz": imgsz,
        "bf16_ema": bf16_ema,
        "ref_final_map5095": ref[map_col][-1],
        "tpu_final_map5095": ours[map_col][-1],
        "ref_best_map5095": max(ref[map_col]),
        "tpu_best_map5095": max(ours[map_col]),
        "delta_final": ours[map_col][-1] - ref[map_col][-1],
        "delta_best": max(ours[map_col]) - max(ref[map_col]),
    }
    overlay(ref, ours, os.path.join(out, "convergence_overlay.png"))
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--out", default="runs/convergence")
    ap.add_argument("--imgs", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=64)
    ap.add_argument("--bf16-ema", action="store_true",
                    help="also exercise the reduced-precision EMA state path")
    args = ap.parse_args()

    # CPU-only: parity is about convergence, and the TPU tunnel must stay
    # free for concurrent bench jobs (single-client rule)
    import jax

    jax.config.update("jax_platforms", "cpu")
    run(args.epochs, args.out, args.imgs, args.batch, args.imgsz,
        bf16_ema=args.bf16_ema)


if __name__ == "__main__":
    main()

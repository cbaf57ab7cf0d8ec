"""Data layer: letterbox geometry, augment invariants, dataset scan, loader shapes."""

import numpy as np
import pytest

from fce_yolo_tpu.data import (
    AugmentCfg,
    DataLoader,
    YOLODataset,
    check_det_dataset,
    collate,
    letterbox,
)
from fce_yolo_tpu.data.augment import mosaic4, random_flip, random_hsv, random_perspective


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    out, r, (pw, ph) = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert abs(r - 3.2) < 1e-9  # 640/200
    assert pw == 0 and ph == 160
    # no-scaleup path keeps small images small
    out2, r2, _ = letterbox(img, 640, scaleup=False)
    assert r2 == 1.0  # upscaling suppressed
    out3, r3, _ = letterbox(np.zeros((1000, 1000, 3), np.uint8), 640, scaleup=False)
    assert r3 == pytest.approx(0.64)


def test_letterbox_rect_stride_align():
    img = np.zeros((100, 200, 3), np.uint8)
    out, r, _ = letterbox(img, 640, rect=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] < 640  # minimal padding, not full square


def test_random_flip_box_math():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    s = {"img": img, "cls": np.array([0.0]), "bboxes": boxes}
    out = random_flip(s, rng, AugmentCfg(fliplr=1.0, flipud=0.0))
    np.testing.assert_allclose(out["bboxes"], [[70, 20, 90, 40]])


def test_random_hsv_preserves_shape_dtype():
    rng = np.random.default_rng(0)
    img = np.random.randint(0, 255, (64, 64, 3), np.uint8)
    out = random_hsv(img, rng, AugmentCfg())
    assert out.shape == img.shape and out.dtype == np.uint8


def test_mosaic4_canvas_and_labels():
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(4):
        img = np.random.randint(0, 255, (80, 120, 3), np.uint8)
        samples.append(
            {"img": img, "cls": np.array([1.0]), "bboxes": np.array([[10.0, 10.0, 60.0, 60.0]])}
        )
    out = mosaic4(samples, 160, rng)
    assert out["img"].shape == (320, 320, 3)
    assert len(out["cls"]) >= 1
    assert (out["bboxes"] >= 0).all() and (out["bboxes"] <= 320).all()


def test_random_perspective_identity_keeps_boxes():
    rng = np.random.default_rng(0)
    cfg = AugmentCfg(degrees=0, translate=0, scale=0, shear=0, perspective=0)
    img = np.random.randint(0, 255, (64, 64, 3), np.uint8)
    s = {"img": img, "cls": np.array([0.0]), "bboxes": np.array([[8.0, 8.0, 40.0, 40.0]])}
    out = random_perspective(s, rng, cfg)
    assert out["img"].shape == (64, 64, 3)
    np.testing.assert_allclose(out["bboxes"], s["bboxes"], atol=1e-3)


def test_check_det_dataset(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    assert d["nc"] == 3 and d["names"][0] == "circle"
    assert d["train"].endswith("images/train")


def test_dataset_val_mode(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["val"], imgsz=128, mode="val")
    assert len(ds) == 4
    s = ds[0]
    assert s["img"].shape == (128, 128, 3)
    assert "ratio" in s and "orig_shape" in s
    # boxes inside the letterboxed frame
    if len(s["bboxes"]):
        assert (s["bboxes"] >= -1).all() and (s["bboxes"] <= 129).all()


def test_dataset_train_mode_and_collate(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", seed=1)
    samples = [ds[i] for i in range(4)]
    for s in samples:
        assert s["img"].shape == (96, 96, 3) and s["img"].dtype == np.uint8
    batch = collate(samples, max_labels=32)
    assert batch["img"].shape == (4, 96, 96, 3)
    assert batch["cls"].shape == (4, 32)
    assert batch["bboxes"].shape == (4, 32, 4)
    assert batch["mask"].dtype == bool
    # normalized xywh in [0, 1]
    assert (batch["bboxes"][batch["mask"]] >= 0).all()
    assert (batch["bboxes"][batch["mask"]] <= 1.0 + 1e-6).all()


def test_dataloader_shapes_and_epochs(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", seed=1)
    dl = DataLoader(ds, batch_size=4, workers=2, max_labels=16, seed=0)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert all(b["img"].shape == (4, 96, 96, 3) for b in batches)
    # different epoch -> different order (reseeded)
    dl.set_epoch(1)
    batches2 = list(dl)
    assert len(batches2) == 2


def test_dataloader_val_tail_padding(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["val"], imgsz=96, mode="val")
    dl = DataLoader(ds, batch_size=3, shuffle=False, workers=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["n_valid"] == 3 and batches[1]["n_valid"] == 1
    assert batches[1]["img"].shape == (3, 96, 96, 3)  # padded, static


def test_mosaic_close(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train")
    assert ds.mosaic_enabled
    ds.set_epoch(95, close_mosaic_at=10, total_epochs=100)
    assert not ds.mosaic_enabled


def test_copy_paste():
    from fce_yolo_tpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    a = {
        "img": np.zeros((100, 100, 3), np.uint8),
        "cls": np.array([0.0]),
        "bboxes": np.array([[5.0, 5.0, 20.0, 20.0]]),
        "segments": [np.array([[5, 5], [20, 5], [20, 20], [5, 20]], np.float32)],
    }
    b = {
        "img": np.full((100, 100, 3), 200, np.uint8),
        "cls": np.array([1.0]),
        "bboxes": np.array([[40.0, 40.0, 80.0, 80.0]]),
        "segments": [np.array([[40, 40], [80, 40], [80, 80], [40, 80]], np.float32)],
    }
    out = copy_paste(a, b, rng, p=1.0)
    assert len(out["cls"]) == 2 and out["cls"][1] == 1.0
    # pasted region carries donor pixels
    assert out["img"][60, 60].mean() > 150
    assert out["img"][2, 2].mean() < 10
    # box-only donor: no-op
    out2 = copy_paste(a, {"img": b["img"], "cls": b["cls"], "bboxes": b["bboxes"]}, rng)
    assert len(out2["cls"]) == 1


def test_convert_coco(tmp_path):
    import json

    from fce_yolo_tpu.data.converter import convert_coco

    ann = {
        "images": [{"id": 1, "file_name": "im1.jpg", "width": 200, "height": 100}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [50, 25, 100, 50], "iscrowd": 0},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "iscrowd": 1},  # skipped
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(ann))
    out = convert_coco(p, tmp_path / "labels")
    rows = (out / "im1.txt").read_text().strip().splitlines()
    assert len(rows) == 1
    cls, cx, cy, w, h = rows[0].split()
    assert cls == "0" and float(cx) == 0.5 and float(cy) == 0.5
    assert float(w) == 0.5 and float(h) == 0.5


def test_label_cache_invalidation(tmp_path):
    """Editing a label file must invalidate the parsed-label cache."""
    import cv2

    img_dir = tmp_path / "images" / "t"
    lbl_dir = tmp_path / "labels" / "t"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((32, 32, 3), np.uint8))
    (lbl_dir / "a.txt").write_text("0 0.5 0.5 0.5 0.5\n")

    ds1 = YOLODataset(str(img_dir), imgsz=32, mode="val")
    assert len(ds1.labels[0]["cls"]) == 1

    import os
    import time

    time.sleep(0.01)
    (lbl_dir / "a.txt").write_text("0 0.5 0.5 0.5 0.5\n1 0.3 0.3 0.2 0.2\n")
    os.utime(lbl_dir / "a.txt")
    ds2 = YOLODataset(str(img_dir), imgsz=32, mode="val")
    assert len(ds2.labels[0]["cls"]) == 2

"""Pose + OBB task training paths end-to-end through the facade."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_pose_dataset(tmp_path_factory):
    """4-keypoint pose dataset: rectangles with corner keypoints."""
    import cv2

    root = tmp_path_factory.mktemp("tinypose")
    rng = np.random.RandomState(2)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((128, 128, 3), 50, np.uint8)
            bw, bh = rng.uniform(0.3, 0.5), rng.uniform(0.3, 0.5)
            cx, cy = rng.uniform(bw / 2, 1 - bw / 2), rng.uniform(bh / 2, 1 - bh / 2)
            x1, y1, x2, y2 = cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2
            cv2.rectangle(img, (int(x1 * 128), int(y1 * 128)), (int(x2 * 128), int(y2 * 128)), (0, 200, 255), -1)
            kpts = " ".join(
                f"{x:.4f} {y:.4f} 2" for x, y in ((x1, y1), (x2, y1), (x2, y2), (x1, y2))
            )
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text(
                f"0 {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f} {kpts}\n"
            )
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames: [obj]\nkpt_shape: [4, 3]\n"
    )
    return str(root / "data.yaml")


@pytest.fixture(scope="module")
def tiny_obb_dataset(tmp_path_factory):
    """Rotated-rectangle dataset in DOTA-YOLO 8-coordinate format."""
    import cv2

    root = tmp_path_factory.mktemp("tinyobb")
    rng = np.random.RandomState(3)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.full((128, 128, 3), 50, np.uint8)
            cx, cy = rng.uniform(0.35, 0.65), rng.uniform(0.35, 0.65)
            w, h, ang = rng.uniform(0.25, 0.4), rng.uniform(0.12, 0.2), rng.uniform(-0.7, 0.7)
            c, s = np.cos(ang), np.sin(ang)
            corners = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
            pts = corners @ np.array([[c, -s], [s, c]]).T + [cx, cy]
            pts = pts.clip(0.01, 0.99)
            cv2.fillPoly(img, [np.round(pts * 128).astype(np.int32)], (200, 100, 0))
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            coords = " ".join(f"{v:.4f}" for v in pts.reshape(-1))
            (root / "labels" / split / f"{i}.txt").write_text(f"0 {coords}\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames: [obj]\n"
    )
    return str(root / "data.yaml")


def test_pose_dataset_and_collate(tiny_pose_dataset):
    from fce_yolo_tpu.data import DataLoader, YOLODataset, check_det_dataset

    d = check_det_dataset(tiny_pose_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", task="pose", kpt_shape=(4, 3), seed=0)
    # flips auto-disabled without flip_idx (reference v8_transforms behavior)
    assert ds.hyp.fliplr == 0.0
    b = next(iter(DataLoader(ds, batch_size=4, workers=2, max_labels=8)))
    assert b["keypoints"].shape == (4, 8, 4, 3)
    valid = b["mask"]
    kv = b["keypoints"][valid]
    vis = kv[..., 2] > 0
    assert (kv[..., :2][vis] >= -0.01).all() and (kv[..., :2][vis] <= 1.01).all()


def test_obb_dataset_and_collate(tiny_obb_dataset):
    from fce_yolo_tpu.data import DataLoader, YOLODataset, check_det_dataset

    d = check_det_dataset(tiny_obb_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", task="obb", seed=0)
    b = next(iter(DataLoader(ds, batch_size=4, workers=2, max_labels=8)))
    assert b["bboxes"].shape == (4, 8, 5)
    rb = b["bboxes"][b["mask"]]
    assert (rb[:, 2] >= rb[:, 3] - 1e-6).all()  # canonical: w >= h
    assert (rb[:, 4] >= -np.pi / 4 - 1e-6).all() and (rb[:, 4] < 3 * np.pi / 4 + 1e-6).all()


@pytest.mark.slow
def test_pose_train_facade(tiny_pose_dataset, tmp_path):
    from fce_yolo_tpu.api import YOLO

    from fce_yolo_tpu.nn.model import build_model

    m = YOLO("yolo11n-pose.yaml", nc=1)
    m.model, m.spec, m.strides = build_model(
        {**m.spec.yaml_dict, "kpt_shape": [4, 3], "nc": 1}, scale="n"
    )
    m.variables = None
    out = m.train(
        data=tiny_pose_dataset, epochs=3, batch=4, imgsz=96, workers=2, max_labels=8,
        mosaic=0.0, optimizer="AdamW", lr0=0.005, warmup_epochs=0.0, close_mosaic=0,
        project=str(tmp_path), name="p", verbose=False, val=True,
    )
    assert out["epochs_run"] == 3
    assert np.isfinite(out["results"][-1]["train/box_loss"])


@pytest.mark.slow
def test_obb_train_facade(tiny_obb_dataset, tmp_path):
    from fce_yolo_tpu.api import YOLO

    m = YOLO("yolo11n-obb.yaml", nc=1)
    out = m.train(
        data=tiny_obb_dataset, epochs=3, batch=4, imgsz=96, workers=2, max_labels=8,
        mosaic=0.0, optimizer="AdamW", lr0=0.005, warmup_epochs=0.0, close_mosaic=0,
        project=str(tmp_path), name="o", verbose=False,
    )
    assert out["epochs_run"] == 3
    assert np.isfinite(out["results"][-1]["train/box_loss"])


def test_kpt_iou_np():
    from fce_yolo_tpu.engine.task_validators import kpt_iou_np

    gk = np.zeros((1, 4, 3)); gk[0, :, :2] = [[10, 10], [20, 10], [20, 20], [10, 20]]
    gk[0, :, 2] = 2  # visible
    pk = gk[:, :, :2].copy()
    area = np.array([100.0])
    oks = kpt_iou_np(gk, pk, area)
    assert oks[0, 0] == pytest.approx(1.0, abs=1e-6)
    # displaced keypoints score lower
    oks2 = kpt_iou_np(gk, pk + 5.0, area)
    assert oks2[0, 0] < oks[0, 0]


def test_probiou_np():
    from fce_yolo_tpu.engine.task_validators import probiou_np

    a = np.array([[50.0, 50, 20, 10, 0.0]])
    b = np.array([[50.0, 50, 20, 10, 0.0], [50.0, 50, 20, 10, 0.8], [90.0, 90, 20, 10, 0.0]])
    iou = probiou_np(a, b)
    assert iou[0, 0] > 0.99
    assert iou[0, 0] > iou[0, 1] > iou[0, 2]


def test_pose_val_facade(tiny_pose_dataset):
    from fce_yolo_tpu.api import YOLO
    from fce_yolo_tpu.nn.model import build_model

    m = YOLO("yolo11n-pose.yaml", nc=1)
    m.model, m.spec, m.strides = build_model(
        {**m.spec.yaml_dict, "kpt_shape": [4, 3], "nc": 1}, scale="n"
    )
    m.variables = None
    res = m.val(data=tiny_pose_dataset, imgsz=96, batch=4, verbose=False)
    assert "metrics/mAP50-95(P)" in res and "metrics/mAP50-95(B)" in res


def test_obb_val_facade(tiny_obb_dataset):
    from fce_yolo_tpu.api import YOLO

    m = YOLO("yolo11n-obb.yaml", nc=1)
    res = m.val(data=tiny_obb_dataset, imgsz=96, batch=4, verbose=False)
    assert "metrics/mAP50-95(B)" in res and 0 <= res["fitness"] <= 1

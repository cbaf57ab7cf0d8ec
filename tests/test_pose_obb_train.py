"""Pose + OBB task training paths end-to-end through the facade."""

import numpy as np
import pytest






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

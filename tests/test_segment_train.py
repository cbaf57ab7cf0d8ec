"""Segment task end-to-end: polygon labels -> rasterized masks -> seg loss
through the facade train loop."""

import numpy as np
import pytest

from fce_yolo_tpu.data import DataLoader, YOLODataset, check_det_dataset


def test_segment_dataset_parses_polygons(tiny_seg_dataset):
    d = check_det_dataset(tiny_seg_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="val")
    raw = ds.load_raw(0)
    assert "segments" in raw and len(raw["segments"]) == len(raw["cls"])
    assert raw["segments"][0].shape == (4, 2)


def test_segment_collate_masks(tiny_seg_dataset):
    d = check_det_dataset(tiny_seg_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", seed=0)
    dl = DataLoader(ds, batch_size=4, workers=2, max_labels=16)
    b = next(iter(dl))
    assert "masks" in b and b["masks"].shape == (4, 16, 24, 24)
    # valid instances have nonzero masks matching their boxes roughly
    valid = b["mask"]
    assert b["masks"][valid].sum() > 0
    # mask area ~ box area (normalized) within reason
    areas_m = b["masks"][valid].mean(axis=(1, 2))
    areas_b = (b["bboxes"][valid][:, 2] * b["bboxes"][valid][:, 3])
    ok = np.abs(areas_m - areas_b) < 0.15
    assert ok.mean() > 0.7, (areas_m, areas_b)


@pytest.mark.slow
def test_segment_train_facade(tiny_seg_dataset, tmp_path):
    from fce_yolo_tpu.api import YOLO

    m = YOLO("yolo11n-seg.yaml", nc=2)
    out = m.train(
        data=tiny_seg_dataset, epochs=3, batch=4, imgsz=96, workers=2, max_labels=16,
        mosaic=0.0, optimizer="AdamW", lr0=0.005, warmup_epochs=0.0, close_mosaic=0,
        project=str(tmp_path), name="s", verbose=False, val=True,
    )
    assert out["epochs_run"] == 3
    row = out["results"][-1]
    assert np.isfinite(row["train/box_loss"])
    # fitness computed from the detect part of the seg head
    assert "fitness" in row


def test_mask_iou_np():
    from fce_yolo_tpu.engine.seg_validator import mask_iou_np

    a = np.zeros((1, 8, 8), bool); a[0, :4, :4] = True
    b = np.zeros((2, 8, 8), bool); b[0, :4, :4] = True; b[1, 2:6, 2:6] = True
    iou = mask_iou_np(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(4 / 28)


def test_segment_val_mask_map(tiny_seg_dataset):
    """Segment val returns both Box and Mask metric families through the facade."""
    from fce_yolo_tpu.api import YOLO

    m = YOLO("yolo11n-seg.yaml", nc=2)
    res = m.val(data=tiny_seg_dataset, imgsz=96, batch=4, verbose=False)
    for tag in ("B", "M"):
        assert f"metrics/mAP50-95({tag})" in res
    assert 0.0 <= res["fitness"] <= 1.0

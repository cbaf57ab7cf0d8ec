"""Native C++ loader: geometry parity with the Python pipeline + batch contract."""

import numpy as np
import pytest

from fce_yolo_tpu.data import YOLODataset, check_det_dataset, letterbox
from fce_yolo_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(), reason="native library not built")


def test_native_letterbox_matches_python():
    rng = np.random.RandomState(0)
    for h, w in ((100, 200), (333, 111), (640, 640)):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        py_img, py_r, py_pad = letterbox(img, 160, scaleup=False)
        na_img, na_r, na_pad = nl.native_letterbox(img, 160, scaleup=False)
        assert py_r == pytest.approx(na_r, abs=1e-6)
        assert py_pad == pytest.approx(na_pad, abs=0.5)
        # bilinear resize kernels may differ by rounding; compare structurally
        assert na_img.shape == py_img.shape
        diff = np.abs(py_img.astype(int) - na_img.astype(int)).mean()
        assert diff < 3.0, f"letterbox mismatch mean abs diff {diff}"


def test_native_val_loader_contract(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["val"], imgsz=96, mode="val")
    dl = nl.NativeDataLoader(ds, batch_size=3, workers=2, max_labels=16)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["img"].shape == (3, 96, 96, 3) and b["img"].dtype == np.uint8
    assert b["bboxes"].shape == (3, 16, 4)
    assert b["mask"].dtype == bool and b["mask"].any()
    assert batches[1]["n_valid"] == 1
    assert "ratio" in b and "orig_shape" in b
    # normalized xywh within [0,1]
    assert (b["bboxes"][b["mask"]] >= 0).all() and (b["bboxes"][b["mask"]] <= 1 + 1e-6).all()


def test_native_val_matches_python_loader(tiny_dataset):
    """Val mode is deterministic: native and Python loaders must agree."""
    from fce_yolo_tpu.data import DataLoader

    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["val"], imgsz=96, mode="val")
    py = next(iter(DataLoader(ds, batch_size=4, shuffle=False, workers=1, max_labels=16)))
    na = next(iter(nl.NativeDataLoader(ds, batch_size=4, workers=1, max_labels=16)))
    assert (py["mask"] == na["mask"]).all()
    np.testing.assert_allclose(py["bboxes"], na["bboxes"], atol=2e-2)
    diff = np.abs(py["img"].astype(int) - na["img"].astype(int)).mean()
    assert diff < 3.0


def test_native_train_loader_augments(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train")
    dl = nl.NativeDataLoader(ds, batch_size=4, workers=4, max_labels=16, seed=1)
    assert len(dl) == 2
    e0 = list(dl)
    assert all(b["img"].shape == (4, 96, 96, 3) for b in e0)
    dl.set_epoch(1)
    e1 = list(dl)
    assert len(e1) == 2
    # augmentation is stochastic: epochs differ
    assert not np.array_equal(e0[0]["img"], e1[0]["img"])
    # mosaic close switches off mosaic without breaking shapes
    dl.set_epoch(99, close_mosaic_at=10, total_epochs=100)
    e2 = list(dl)
    assert e2[0]["img"].shape == (4, 96, 96, 3)

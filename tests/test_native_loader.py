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


def test_native_decode_batch_matches_python(tmp_path):
    """fy_decode_letterbox_batch == cv2 decode + python letterbox + RGB flip
    (the predict-path front end; reference predictor preprocess contract)."""
    import cv2
    import numpy as np

    from fce_yolo_tpu.data.augment import letterbox
    from fce_yolo_tpu.data.native_loader import available, native_decode_batch

    if not available():
        import pytest

        pytest.skip("native loader not built")

    rng = np.random.RandomState(3)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (640, 480), (333, 517)]):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        p = tmp_path / f"{i}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))

    batch, meta = native_decode_batch(paths, 320, scaleup=False, workers=2)
    assert batch.shape == (3, 320, 320, 3)
    for i, p in enumerate(paths):
        im = cv2.imread(p)  # BGR
        ref, r, (pw, ph) = letterbox(
            np.ascontiguousarray(im[..., ::-1]), 320, scaleup=False)
        np.testing.assert_array_equal(batch[i], ref)
        assert abs(meta[i, 0] - r) < 1e-6
        assert abs(meta[i, 1] - pw) < 1e-3 and abs(meta[i, 2] - ph) < 1e-3
        assert meta[i, 3] == im.shape[0] and meta[i, 4] == im.shape[1]

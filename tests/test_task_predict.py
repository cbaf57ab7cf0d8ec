"""Task-aware predict paths: segment masks + pose keypoints through the facade."""

import numpy as np
import pytest

from fce_yolo_tpu.api import YOLO
from fce_yolo_tpu.ops.masks import crop_mask, process_mask


def test_crop_mask():
    import jax.numpy as jnp

    m = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0], [0.0, 0.0, 8.0, 8.0]])
    out = np.asarray(crop_mask(m, boxes))
    assert out[0].sum() == 16 and out[1].sum() == 64


def test_process_mask_shapes():
    import jax.numpy as jnp

    coefs = jnp.asarray(np.random.RandomState(0).randn(5, 32).astype(np.float32))
    proto = jnp.asarray(np.random.RandomState(1).randn(16, 16, 32).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([8.0, 8.0, 56.0, 56.0]), (5, 1))
    m = process_mask(coefs, proto, boxes, (64, 64), upsample=True)
    assert m.shape == (5, 64, 64) and m.dtype == bool


def test_segment_predict_facade():
    m = YOLO("yolo11n-seg.yaml", nc=3)
    img = np.random.randint(0, 255, (100, 140, 3), np.uint8)
    res = m.predict(img, imgsz=96, conf=0.0)  # conf 0 -> some detections guaranteed
    r = res[0]
    if len(r):
        assert r.masks is not None
        assert r.masks.data.shape[1:] == (100, 140)
        plotted = r.plot()
        assert plotted.shape == (100, 140, 3)


def test_obb_predict_facade():
    """OBB predict returns an OBB container: xywhr in ORIGINAL pixels
    (center un-letterboxed, w/h scaled but never clipped), corner polygons,
    axis-aligned hull boxes, plot + save_txt 8-coordinate rows."""
    m = YOLO("yolo11n-obb.yaml", nc=3)
    img = np.random.randint(0, 255, (100, 140, 3), np.uint8)
    res = m.predict(img, imgsz=96, conf=0.0)
    r = res[0]
    assert r.obb is not None
    if len(r):
        assert r.obb.data.shape[1] == 7
        assert r.obb.xywhr.shape == (len(r), 5)
        polys = r.obb.xyxyxyxy
        assert polys.shape == (len(r), 4, 2)
        # hull boxes derive from the polygons
        np.testing.assert_allclose(r.boxes.xyxy[:, :2], polys.min(1), atol=1e-4)
        # polygon edge lengths reproduce w/h (rotation-invariant)
        e1 = np.linalg.norm(polys[:, 0] - polys[:, 1], axis=1)
        e2 = np.linalg.norm(polys[:, 1] - polys[:, 2], axis=1)
        np.testing.assert_allclose(
            np.sort(np.stack([e1, e2], 1), 1),
            np.sort(r.obb.data[:, 2:4], 1), rtol=1e-4, atol=1e-3)
        assert r.plot().shape == (100, 140, 3)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = r.save_txt(f"{d}/obb.txt", save_conf=True)
            row = open(p).readline().split()
            assert len(row) == 10  # cls + 8 coords + conf


def test_pose_predict_facade():
    m = YOLO("yolo11n-pose.yaml")
    img = np.random.randint(0, 255, (100, 140, 3), np.uint8)
    res = m.predict(img, imgsz=96, conf=0.0)
    r = res[0]
    if len(r):
        assert r.keypoints is not None
        assert r.keypoints.data.shape[1:] == (17, 3)
        # visibilities sigmoided
        assert (r.keypoints.conf >= 0).all() and (r.keypoints.conf <= 1).all()


def test_predict_classes_filter_and_verbose():
    """classes= keeps only the named ids and matches a manual post-filter
    (reference predictor classes arg); verbose= emits the summary line.
    The log line is asserted via a handler attached directly to LOGGER —
    fd-level capture is order-dependent when earlier tests touch the
    stream the handler bound at import time."""
    import io
    import logging

    from fce_yolo_tpu.utils import LOGGER

    m = YOLO("yolo11n.yaml")
    img = np.random.RandomState(3).randint(0, 255, (120, 160, 3), np.uint8)
    r_all = m.predict(img, imgsz=96, conf=0.0001)[0]
    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    LOGGER.addHandler(h)
    try:
        r_f = m.predict(img, imgsz=96, conf=0.0001, classes=[0, 2], verbose=True)[0]
    finally:
        LOGGER.removeHandler(h)
    got = r_f.boxes.cls.astype(int)
    assert set(got.tolist()) <= {0, 2}
    want = np.isin(r_all.boxes.cls.astype(int), [0, 2]).sum()
    assert len(r_f) == want
    assert "image 1" in buf.getvalue()

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

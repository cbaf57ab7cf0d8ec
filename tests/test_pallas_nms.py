"""Pallas NMS kernel: bit-parity with the scan implementation (interpret mode)."""

import numpy as np
import pytest


def _candidates(rng, b=2, k=256):
    import jax.numpy as jnp

    centers = rng.uniform(50, 500, (b, k, 2))
    wh = rng.uniform(10, 80, (b, k, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    # sorted descending scores, as produced by top-k candidate selection
    scores = np.sort(rng.rand(b, k).astype(np.float32), axis=1)[:, ::-1].copy()
    valid = scores > 0.3
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def test_pallas_matches_scan():
    import jax
    from functools import partial

    from fce_yolo_tpu.ops.nms import _pick_suppress
    from fce_yolo_tpu.ops.pallas_nms import pallas_pick_suppress

    rng = np.random.RandomState(0)
    boxes, scores, valid = _candidates(rng)
    idx_p, ok_p = pallas_pick_suppress(boxes, scores, valid, iou_thres=0.45, max_det=64, interpret=True)
    idx_s, ok_s = jax.vmap(partial(_pick_suppress, iou_thres=0.45, max_det=64))(boxes, scores, valid)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_s))
    # indices must agree wherever a detection was emitted
    ok = np.asarray(ok_s)
    np.testing.assert_array_equal(np.asarray(idx_p)[ok], np.asarray(idx_s)[ok])


def test_pallas_no_valid_candidates():
    import jax.numpy as jnp

    from fce_yolo_tpu.ops.pallas_nms import pallas_pick_suppress

    boxes = jnp.zeros((1, 128, 4))
    scores = jnp.zeros((1, 128))
    valid = jnp.zeros((1, 128), bool)
    idx, ok = pallas_pick_suppress(boxes, scores, valid, max_det=16, interpret=True)
    assert not np.asarray(ok).any()


def test_batched_nms_impl_dispatch():
    """impl='scan' and impl='pallas' (interpreted off-TPU via env) agree
    through the full batched_nms wrapper on CPU."""
    import jax.numpy as jnp

    from fce_yolo_tpu.ops.nms import batched_nms

    rng = np.random.RandomState(1)
    preds = rng.rand(2, 400, 4 + 3).astype(np.float32)
    preds[..., :2] = preds[..., :2] * 400 + 100  # cx, cy
    preds[..., 2:4] = preds[..., 2:4] * 60 + 20  # w, h
    out = batched_nms(jnp.asarray(preds), conf_thres=0.3, max_det=32, impl="scan")
    assert out["boxes"].shape == (2, 32, 4)
    assert out["valid"].any()
    # scores are descending within the valid region
    s = np.asarray(out["scores"][0])
    v = np.asarray(out["valid"][0])
    sv = s[v]
    assert (np.diff(sv) <= 1e-6).all()

"""Bboxes/Instances container parity vs the reference (utils/instance.py).

Runs every geometric edit on identical random labels through both
implementations and asserts the arrays stay numerically identical.
"""

from __future__ import annotations

import importlib.metadata as _md
import os
import sys

import numpy as np
import pytest

from fce_yolo_tpu.data.instance import Bboxes, Instances

REF = "/root/reference"
pytestmark = pytest.mark.parity

if not os.path.isdir(os.path.join(REF, "ultralytics")):
    pytest.skip("reference repo unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_instance():
    """Import reference Bboxes/Instances with the torchvision-metadata shim."""
    orig = _md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    _md.version = fake_version
    sys.path.insert(0, REF)
    try:
        from ultralytics.utils.instance import Bboxes as RB
        from ultralytics.utils.instance import Instances as RI

        yield RB, RI
    finally:
        sys.path.remove(REF)
        _md.version = orig


def _random_labels(rng, n=7, m=12, kpts=True):
    xy = rng.uniform(0, 600, (n, 2, 2)).astype(np.float32)
    boxes = np.concatenate([xy.min(1), xy.max(1) + 1], axis=1)  # valid xyxy
    segs = rng.uniform(0, 600, (n, m, 2)).astype(np.float32)
    kp = rng.uniform(-50, 700, (n, 17, 3)).astype(np.float32) if kpts else None
    return boxes, segs, kp


def _pair(ref_cls, boxes, segs, kp, fmt="xyxy", normalized=False):
    ours = Instances(boxes.copy(), segs.copy(), None if kp is None else kp.copy(),
                     bbox_format=fmt, normalized=normalized)
    theirs = ref_cls(boxes.copy(), segs.copy(), None if kp is None else kp.copy(),
                     bbox_format=fmt, normalized=normalized)
    return ours, theirs


def _assert_same(ours, theirs):
    np.testing.assert_allclose(ours.bboxes, theirs.bboxes, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(ours.segments, theirs.segments, rtol=1e-6, atol=1e-5)
    if theirs.keypoints is not None:
        np.testing.assert_allclose(ours.keypoints, theirs.keypoints, rtol=1e-6, atol=1e-5)
    assert ours.normalized == theirs.normalized
    assert ours._bboxes.format == theirs._bboxes.format
    # ours computes in f64 where the reference mutates f32 in place
    np.testing.assert_allclose(ours.bbox_areas, theirs.bbox_areas, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("src", ["xyxy", "xywh", "ltwh"])
@pytest.mark.parametrize("dst", ["xyxy", "xywh", "ltwh"])
def test_bboxes_convert_matrix(ref_instance, src, dst):
    RB, _ = ref_instance
    rng = np.random.default_rng(0)
    b = rng.uniform(10, 500, (9, 4)).astype(np.float32)
    ours, theirs = Bboxes(b.copy(), format=src), RB(b.copy(), format=src)
    ours.convert(dst)
    theirs.convert(dst)
    np.testing.assert_allclose(ours.bboxes, theirs.bboxes, rtol=1e-6)
    np.testing.assert_allclose(ours.areas(), theirs.areas(), rtol=1e-6)


def test_bboxes_mul_add_concat_getitem(ref_instance):
    RB, _ = ref_instance
    rng = np.random.default_rng(1)
    b = rng.uniform(10, 500, (6, 4)).astype(np.float32)
    ours, theirs = Bboxes(b.copy()), RB(b.copy())
    for obj in (ours, theirs):
        obj.mul((0.5, 2.0, 0.5, 2.0))
        obj.add(7)
        obj.mul(1.25)
    np.testing.assert_allclose(ours.bboxes, theirs.bboxes, rtol=1e-6)
    oc = Bboxes.concatenate([ours, ours[2], ours[1:4]])
    tc = RB.concatenate([theirs, theirs[2], theirs[1:4]])
    np.testing.assert_allclose(oc.bboxes, tc.bboxes, rtol=1e-6)
    assert len(oc) == len(tc) == 10


@pytest.mark.parametrize("fmt", ["xyxy", "xywh"])
def test_instances_flip_scale_pad_roundtrip(ref_instance, fmt):
    _, RI = ref_instance
    rng = np.random.default_rng(2)
    boxes, segs, kp = _random_labels(rng)
    ours, theirs = _pair(RI, boxes, segs, kp)
    for obj in (ours, theirs):
        obj.convert_bbox(fmt)
        obj.scale(0.75, 1.5)
        obj.add_padding(13, 4)
        obj.fliplr(640)
        obj.flipud(480)
        obj.normalize(640, 480)
        obj.denormalize(640, 480)
    _assert_same(ours, theirs)


def test_instances_clip_and_zero_area_removal(ref_instance):
    _, RI = ref_instance
    rng = np.random.default_rng(3)
    boxes, segs, kp = _random_labels(rng, n=10)
    boxes[3] = [-50, -40, -10, -5]  # fully outside -> zero area after clip
    boxes[7, 2:] = boxes[7, :2]  # degenerate
    ours, theirs = _pair(RI, boxes, segs, kp)
    for obj in (ours, theirs):
        obj.clip(500, 400)
    _assert_same(ours, theirs)
    keep_o, keep_t = ours.remove_zero_area_boxes(), theirs.remove_zero_area_boxes()
    np.testing.assert_array_equal(keep_o, keep_t)
    assert not keep_o[3] and not keep_o[7]
    _assert_same(ours, theirs)


def test_instances_getitem_update_concat(ref_instance):
    _, RI = ref_instance
    rng = np.random.default_rng(4)
    boxes, segs, kp = _random_labels(rng, n=8)
    ours, theirs = _pair(RI, boxes, segs, kp)
    mask = np.array([True, False] * 4)
    _assert_same(ours[mask], theirs[mask])
    _assert_same(ours[2:5], theirs[2:5])

    nb = rng.uniform(0, 100, (8, 4)).astype(np.float32)
    ours.update(nb.copy())
    theirs.update(nb.copy())
    _assert_same(ours, theirs)

    # mixed segment lengths force the resample path in concatenate
    b2, s2, k2 = _random_labels(rng, n=3, m=20)
    o2, t2 = _pair(RI, b2, s2, k2)
    oc = Instances.concatenate([ours, o2])
    tc = RI.concatenate([theirs, t2])
    assert oc.segments.shape == tc.segments.shape == (11, 20, 2)
    _assert_same(oc, tc)


def test_instances_no_keypoints_and_empty_segments():
    boxes = np.array([[10.0, 10.0, 50.0, 60.0]], dtype=np.float32)
    inst = Instances(boxes, bbox_format="xyxy", normalized=False)
    inst.fliplr(100)
    inst.clip(100, 100)
    np.testing.assert_allclose(inst.bboxes, [[50.0, 10.0, 90.0, 60.0]])
    assert inst.segments.shape == (1, 0, 2)
    assert len(Instances.concatenate([inst, inst])) == 2

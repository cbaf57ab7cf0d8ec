"""Metrics layer: self-consistency + golden parity vs the reference numpy code.

The mAP bookkeeping must match the reference bit-for-bit (SURVEY.md §7 "Exact
mAP parity"), so ap_per_class / compute_ap / match_predictions are compared
directly against the reference implementations on randomized inputs.
"""

import os
import sys

import numpy as np
import pytest

from fce_yolo_tpu.utils.metrics import (
    ConfusionMatrix,
    DetMetrics,
    IOU_THRESHOLDS,
    ap_per_class,
    box_iou_np,
    compute_ap,
    match_predictions,
)

REF = "/root/reference"


def _rand_eval_set(rng, n_det=200, n_gt=150, nc=5):
    conf = rng.rand(n_det)
    pred_cls = rng.randint(0, nc, n_det).astype(float)
    target_cls = rng.randint(0, nc, n_gt).astype(float)
    # tp correlated with conf so the PR curve is non-trivial
    tp = (rng.rand(n_det, 10) < conf[:, None] * 0.9).astype(bool)
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone over IoU thresholds
    return tp, conf, pred_cls, target_cls


def test_box_iou_identity():
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], float)
    iou = box_iou_np(b, b)
    assert np.allclose(np.diag(iou), 1.0)
    assert 0.13 < iou[0, 1] < 0.16  # 25/175


def test_compute_ap_perfect_detector():
    ap, _, _ = compute_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
    assert ap > 0.99


def test_match_predictions_greedy_dedup():
    # two detections both overlap one GT: only the higher-IoU one matches
    true_cls = np.array([0.0])
    pred_cls = np.array([0.0, 0.0])
    iou = np.array([[0.9, 0.6]])
    correct = match_predictions(pred_cls, true_cls, iou)
    assert correct[0, 0] and not correct[1, 0]
    # at threshold 0.95 neither matches
    assert not correct[:, -1].any()


def test_detmetrics_roundtrip():
    rng = np.random.RandomState(0)
    m = DetMetrics(names={i: str(i) for i in range(5)})
    for _ in range(4):
        tp, conf, pred_cls, target_cls = _rand_eval_set(rng, 50, 40)
        m.update_stats(
            dict(tp=tp, conf=conf, pred_cls=pred_cls, target_cls=target_cls, target_img=np.unique(target_cls))
        )
    m.process(nc=5)
    assert 0 < m.map50 <= 1 and 0 < m.map <= 1 and m.map50 >= m.map
    rd = m.results_dict
    assert abs(rd["fitness"] - (0.1 * m.map50 + 0.9 * m.map)) < 1e-9
    assert m.maps.shape == (5,)


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(names={0: "a", 1: "b"})
    det = dict(
        bboxes=np.array([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], float),
        conf=np.array([0.9, 0.8, 0.7]),
        cls=np.array([0, 1, 0], float),
    )
    gt = dict(bboxes=np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float), cls=np.array([0, 0], float))
    cm.process_batch(det, gt)
    assert cm.matrix[0, 0] == 1  # TP class 0
    assert cm.matrix[1, 0] == 1  # class confusion: predicted b on GT a
    assert cm.matrix[0, 2] == 1  # unmatched detection -> FP (background col)
    assert cm.matrix.sum() == 3


# ---------------- golden parity vs reference ----------------

needs_ref = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ultralytics")), reason="no reference")


@pytest.fixture(scope="module")
def ref_metrics():
    import importlib.metadata as md

    orig = md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    md.version = fake_version
    sys.path.insert(0, REF)
    try:
        from ultralytics.utils import metrics as rm

        yield rm
    finally:
        sys.path.remove(REF)


@needs_ref
@pytest.mark.parity
def test_ap_per_class_parity(ref_metrics):
    rng = np.random.RandomState(42)
    tp, conf, pred_cls, target_cls = _rand_eval_set(rng)
    ours = ap_per_class(tp, conf, pred_cls, target_cls)
    ref = ref_metrics.ap_per_class(tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy())
    # reference returns (tp, fp, p, r, f1, ap, unique, p_curve, r_curve, f1_curve, x, prec)
    np.testing.assert_allclose(ours["ap"], ref[5], atol=1e-12)
    np.testing.assert_allclose(ours["p"], ref[2], atol=1e-12)
    np.testing.assert_allclose(ours["r"], ref[3], atol=1e-12)
    np.testing.assert_allclose(ours["f1"], ref[4], atol=1e-12)
    np.testing.assert_array_equal(ours["unique_classes"], ref[6])


@needs_ref
@pytest.mark.parity
def test_match_predictions_parity(ref_metrics):
    torch = pytest.importorskip("torch")
    from ultralytics.engine.validator import BaseValidator

    rng = np.random.RandomState(7)
    n_det, n_gt, nc = 60, 40, 3
    boxes_d = np.sort(rng.rand(n_det, 2, 2) * 100, axis=1).reshape(n_det, 4)
    boxes_g = np.sort(rng.rand(n_gt, 2, 2) * 100, axis=1).reshape(n_gt, 4)
    pred_cls = rng.randint(0, nc, n_det).astype(float)
    true_cls = rng.randint(0, nc, n_gt).astype(float)
    iou = box_iou_np(boxes_g, boxes_d)

    ours = match_predictions(pred_cls, true_cls, iou)

    v = BaseValidator.__new__(BaseValidator)
    v.iouv = torch.tensor(IOU_THRESHOLDS)
    ref = BaseValidator.match_predictions(
        v, torch.tensor(pred_cls), torch.tensor(true_cls), torch.tensor(iou)
    ).numpy()
    np.testing.assert_array_equal(ours, ref)

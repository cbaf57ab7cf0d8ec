"""Tracker tests: Kalman invariants, association, identity persistence on
synthetic trajectories (reference has no dedicated tracker unit tests; this
is stricter)."""

import numpy as np
import pytest

from fce_yolo_tpu.trackers import BOTSORT, BYTETracker, KalmanFilterXYAH, TrackerArgs, build_tracker
from fce_yolo_tpu.trackers.matching import iou_distance, linear_assignment


def test_kalman_roundtrip():
    kf = KalmanFilterXYAH()
    z = np.array([50.0, 60.0, 0.8, 40.0])
    mean, cov = kf.initiate(z)
    assert mean.shape == (8,) and cov.shape == (8, 8)
    mean2, cov2 = kf.predict(mean, cov)
    np.testing.assert_allclose(mean2[:4], z, atol=1e-9)  # zero initial velocity
    # update with a shifted measurement pulls the state toward it
    z2 = np.array([55.0, 60.0, 0.8, 40.0])
    mean3, cov3 = kf.update(mean2, cov2, z2)
    assert 50.0 < mean3[0] <= 55.0
    # covariance stays symmetric positive-definite
    assert np.allclose(cov3, cov3.T, atol=1e-9)
    assert np.all(np.linalg.eigvalsh(cov3[:4, :4]) > 0)


def test_multi_predict_matches_single():
    kf = KalmanFilterXYAH()
    zs = [np.array([10.0, 10, 1, 20]), np.array([100.0, 50, 0.5, 30])]
    singles = []
    means, covs = [], []
    for z in zs:
        m, c = kf.initiate(z)
        means.append(m)
        covs.append(c)
        singles.append(kf.predict(m.copy(), c.copy()))
    mm, cc = kf.multi_predict(np.stack(means), np.stack(covs))
    for i in range(2):
        np.testing.assert_allclose(mm[i], singles[i][0], atol=1e-9)
        np.testing.assert_allclose(cc[i], singles[i][1], atol=1e-9)


def test_linear_assignment_gating():
    cost = np.array([[0.1, 0.9], [0.95, 0.2]])
    matches, ua, ub = linear_assignment(cost, thresh=0.5)
    assert {(m[0], m[1]) for m in matches} == {(0, 0), (1, 1)}
    matches, ua, ub = linear_assignment(cost, thresh=0.05)
    assert len(matches) == 0 and len(ua) == 2 and len(ub) == 2


def _moving_boxes(t):
    """Two objects moving right / down."""
    return np.array(
        [
            [10 + 3 * t, 10, 40 + 3 * t, 40],
            [100, 20 + 2 * t, 140, 70 + 2 * t],
        ],
        float,
    )


def test_bytetracker_identity_persistence():
    tk = BYTETracker(TrackerArgs(), frame_rate=30)
    ids_per_frame = []
    for t in range(10):
        boxes = _moving_boxes(t)
        out = tk.update(boxes, np.array([0.9, 0.8]), np.array([0, 1]))
        if t > 0:
            assert out.shape[0] == 2
        ids_per_frame.append(set(out[:, 4].astype(int)))
    # same two ids throughout (no switches)
    assert ids_per_frame[1] == ids_per_frame[-1]
    assert len(ids_per_frame[-1]) == 2


def test_bytetracker_low_conf_rescue_and_loss():
    tk = BYTETracker(TrackerArgs(track_buffer=5), frame_rate=30)
    for t in range(3):
        tk.update(_moving_boxes(t), np.array([0.9, 0.9]), np.array([0, 0]))
    # object 2 drops to low confidence -> rescued by stage 2
    out = tk.update(_moving_boxes(3), np.array([0.9, 0.15]), np.array([0, 0]))
    assert out.shape[0] == 2
    # object 2 disappears entirely -> eventually only one track remains
    for t in range(4, 12):
        out = tk.update(_moving_boxes(t)[:1], np.array([0.9]), np.array([0]))
    assert out.shape[0] == 1


def test_botsort_with_camera_motion():
    import cv2

    tk = BOTSORT(frame_rate=30)
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (240, 320, 3), np.uint8)
    ids = []
    for t in range(6):
        M = np.float32([[1, 0, 2 * t], [0, 1, 0]])
        img = cv2.warpAffine(base, M, (320, 240))
        boxes = np.array([[50 + 2 * t, 50, 90 + 2 * t, 90]], float)  # static in world, moving with camera
        out = tk.update(boxes, np.array([0.9]), np.array([0]), img=img)
        if len(out):
            ids.append(int(out[0, 4]))
    assert len(set(ids)) == 1  # one stable identity


def test_build_tracker_from_yaml():
    tk = build_tracker("bytetrack.yaml")
    assert isinstance(tk, BYTETracker) and not isinstance(tk, BOTSORT)
    tk2 = build_tracker("botsort.yaml")
    assert isinstance(tk2, BOTSORT)
    assert tk2.args.gmc_method == "sparseOptFlow"


# ------------------------------------------------------------------- ReID
def test_embedding_distance_math():
    from types import SimpleNamespace

    from fce_yolo_tpu.trackers.matching import embedding_distance

    t = SimpleNamespace(smooth_feat=np.array([1.0, 0.0], np.float32))
    d_same = SimpleNamespace(curr_feat=np.array([1.0, 0.0], np.float32))
    d_orth = SimpleNamespace(curr_feat=np.array([0.0, 1.0], np.float32))
    d_none = SimpleNamespace(curr_feat=None)
    m = embedding_distance([t], [d_same, d_orth, d_none])
    np.testing.assert_allclose(m, [[0.0, 1.0, 1.0]], atol=1e-6)


def test_botsort_reid_resolves_crossing():
    """Two objects swap positions between frames; plain IoU matching picks
    the wrong identities (cross-pairs overlap more), appearance matching
    (reference BOTSORT.get_dists) keeps them (ids follow the pixels)."""
    from fce_yolo_tpu.trackers.bot_sort import BOTSORT
    from fce_yolo_tpu.trackers.byte_tracker import TrackerArgs

    def make_img(pos_a, pos_b):
        img = np.zeros((120, 200, 3), np.uint8)
        img[:, int(pos_a[0]) : int(pos_a[2])] = (255, 0, 0)   # object A signature
        img[:, int(pos_b[0]) : int(pos_b[2])] = (0, 255, 0)   # object B signature
        return img

    def encoder(img, boxes):
        feats = []
        for x1, y1, x2, y2 in boxes.astype(int):
            cx = (x1 + x2) // 2
            px = img[60, np.clip(cx, 0, img.shape[1] - 1)].astype(np.float32)
            feats.append(px / max(np.linalg.norm(px), 1e-6))
        return np.stack(feats)

    def run(with_reid: bool) -> dict:
        args = TrackerArgs(tracker_type="botsort", gmc_method="none",
                           with_reid=with_reid, fuse_score=False,
                           proximity_thresh=0.5, appearance_thresh=0.25)
        tk = BOTSORT(args, encoder=encoder if with_reid else None)
        a1, b1 = (0, 0, 100, 100), (40, 0, 140, 100)
        img1 = make_img(a1, b1)
        tk.update(np.array([a1, b1], float), np.array([0.9, 0.9]),
                  np.array([0, 1]), img=img1)
        # frame 2: A slides right under B's old slot, B slides left under A's
        a2, b2 = (30, 0, 130, 100), (10, 0, 110, 100)
        img2 = make_img(a2, b2)
        out = tk.update(np.array([a2, b2], float), np.array([0.9, 0.9]),
                        np.array([0, 1]), img=img2)
        # map detection class -> assigned id (class rides the detection here,
        # so it tells us which physical object each track latched onto)
        return {int(r[6]): int(r[4]) for r in out}

    ids_reid = run(True)
    # with appearance: object A (class 0) keeps the id it got in frame 1
    assert ids_reid[0] != ids_reid[1]
    assert ids_reid[0] == 1 and ids_reid[1] == 2
    ids_iou = run(False)
    # sanity: the geometry really is adversarial — IoU-only swaps identities
    assert ids_iou[0] == 2 and ids_iou[1] == 1

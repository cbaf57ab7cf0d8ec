"""Association costs + assignment for tracking (reference trackers/utils/matching.py)."""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.utils.metrics import box_iou_np

__all__ = ["iou_distance", "fuse_score", "linear_assignment"]


def iou_distance(atracks: list, btracks: list) -> np.ndarray:
    """1 - IoU cost between two track/detection lists (uses .xyxy)."""
    a = np.array([t.xyxy for t in atracks]).reshape(-1, 4)
    b = np.array([t.xyxy for t in btracks]).reshape(-1, 4)
    if not len(a) or not len(b):
        return np.ones((len(a), len(b)), np.float32)
    return 1.0 - box_iou_np(a, b).astype(np.float32)


def fuse_score(cost_matrix: np.ndarray, detections: list) -> np.ndarray:
    """Fuse detection confidence into the IoU similarity (matching.py fuse_score)."""
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1.0 - cost_matrix
    det_scores = np.array([d.score for d in detections])
    fused = iou_sim * det_scores[None, :]
    return 1.0 - fused


def linear_assignment(cost_matrix: np.ndarray, thresh: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hungarian assignment with cost gating.

    Returns (matches (K, 2), unmatched_a, unmatched_b). Uses scipy's
    linear_sum_assignment on a threshold-gated cost (the reference uses lap's
    cost_limit; gating by +inf substitution is equivalent at the optimum for
    the accepted pairs).
    """
    if cost_matrix.size == 0:
        return (
            np.zeros((0, 2), int),
            np.arange(cost_matrix.shape[0]),
            np.arange(cost_matrix.shape[1]),
        )
    from scipy.optimize import linear_sum_assignment

    gated = np.where(cost_matrix > thresh, thresh + 1e-4, cost_matrix)
    rows, cols = linear_sum_assignment(gated)
    ok = cost_matrix[rows, cols] <= thresh
    matches = np.stack([rows[ok], cols[ok]], 1) if ok.any() else np.zeros((0, 2), int)
    unmatched_a = np.setdiff1d(np.arange(cost_matrix.shape[0]), matches[:, 0])
    unmatched_b = np.setdiff1d(np.arange(cost_matrix.shape[1]), matches[:, 1])
    return matches, unmatched_a, unmatched_b


def embedding_distance(tracks: list, detections: list) -> np.ndarray:
    """Cosine distance between track smooth features and detection features
    (reference trackers/utils/matching.py embedding_distance). Pairs missing
    a feature get the max distance 1."""
    m = np.ones((len(tracks), len(detections)), np.float32)
    if not len(tracks) or not len(detections):
        return m
    for i, t in enumerate(tracks):
        tf = getattr(t, "smooth_feat", None)
        if tf is None:
            continue
        for j, d in enumerate(detections):
            df = getattr(d, "curr_feat", None)
            if df is None:
                continue
            m[i, j] = max(0.0, 1.0 - float(np.dot(tf, df)))
    return m

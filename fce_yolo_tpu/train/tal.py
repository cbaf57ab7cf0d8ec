"""Task-Aligned Assigner — fully masked, static-shape jnp.

Behavioral parity target: reference utils/tal.py:12-350 (TaskAlignedAssigner).
The reference materializes boolean-masked gathers (data-dependent shapes) and
falls back to CPU on CUDA OOM; this re-design computes the dense
(batch, max_boxes, anchors) metric tensors with ``where``-masking throughout —
no dynamic shapes, no host fallback, one XLA fusion domain. Ground truths
arrive pre-padded to ``max_boxes`` with a validity mask (the padded-batch
contract the reference itself builds in loss.py:294-309).

Everything is wrapped in ``stop_gradient`` by the caller (assignment is
no-grad, reference tal.py:43).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fce_yolo_tpu.ops.iou import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy
    target_scores: jnp.ndarray  # (B, A, nc) float
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid scores
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy (pixels)
    anc_points: jnp.ndarray,  # (A, 2) anchor centers (pixels)
    gt_labels: jnp.ndarray,  # (B, M) int
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy (pixels)
    mask_gt: jnp.ndarray,  # (B, M) bool — valid (non-padded) gts
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    """Task-aligned one-to-many assignment.

    align metric = score(gt_class)^alpha * CIoU(pred, gt)^beta over anchors
    whose centers fall inside the gt box; top-k per gt; anchors claimed by
    multiple gts go to the highest-IoU one; target scores are normalized by
    per-gt max metric (reference tal.py:109-125).
    """
    b, a_n, nc = pd_scores.shape
    m = gt_labels.shape[1]

    # --- candidate mask: anchor center strictly inside gt box (tal.py:275-297)
    lt = gt_bboxes[:, :, None, :2]  # (B, M, 1, 2)
    rb = gt_bboxes[:, :, None, 2:]
    xy = anc_points[None, None, :, :]  # (1, 1, A, 2)
    deltas = jnp.concatenate([xy - lt, rb - xy], axis=-1)  # (B, M, A, 4)
    mask_in_gts = deltas.min(axis=-1) > eps  # (B, M, A)
    live = mask_in_gts & mask_gt[:, :, None]  # (B, M, A)

    # --- alignment metric (tal.py:153-188)
    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)  # (B, M)
    # scores of each anchor for each gt's class: (B, A, nc) -> (B, M, A)
    cls_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1
    )
    cls_scores = jnp.where(live, cls_scores, 0.0)
    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, mode="CIoU"
    )
    overlaps = jnp.where(live, jnp.clip(overlaps, 0.0, None), 0.0)  # (B, M, A)
    align_metric = cls_scores**alpha * overlaps**beta

    # --- top-k candidates per gt (tal.py:201-230): scatter distinct topk
    # indices; invalid gt rows are masked out wholesale.
    _, topk_idx = jax.lax.top_k(align_metric, topk)  # (B, M, topk)
    bidx = jnp.arange(b)[:, None, None]
    midx = jnp.arange(m)[None, :, None]
    mask_topk = (
        jnp.zeros((b, m, a_n), dtype=align_metric.dtype)
        .at[bidx, midx, topk_idx]
        .add(1.0)
    )
    mask_pos = mask_topk * live.astype(align_metric.dtype)  # (B, M, A)

    # --- resolve anchors claimed by multiple gts -> highest overlap (tal.py:299-328)
    fg_counts = mask_pos.sum(axis=-2)  # (B, A)
    multi = fg_counts[:, None, :] > 1  # (B, 1->M, A)
    max_overlap_gt = jnp.argmax(overlaps, axis=-2)  # (B, A)
    is_max = jax.nn.one_hot(max_overlap_gt, m, dtype=mask_pos.dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask_f = mask_pos.sum(axis=-2)  # (B, A)
    fg_mask = fg_mask_f > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)  # (B, A)

    # --- gather targets (tal.py:232-273)
    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B, A)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None].repeat(4, -1), axis=1
    )  # (B, A, 4)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)

    # --- normalize by per-gt peak metric (tal.py:118-124)
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlap = (overlaps * mask_pos).max(axis=-1, keepdims=True)  # (B, M, 1)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(axis=-2)  # (B, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)


def assign_rotated(
    pd_scores: jnp.ndarray,  # (B, A, nc)
    pd_rboxes: jnp.ndarray,  # (B, A, 5) xywhr (pixels)
    anc_points: jnp.ndarray,  # (A, 2)
    gt_labels: jnp.ndarray,  # (B, M)
    gt_rboxes: jnp.ndarray,  # (B, M, 5) xywhr (pixels)
    mask_gt: jnp.ndarray,  # (B, M)
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    """Rotated TAL (reference RotatedTaskAlignedAssigner, tal.py:318-350):
    overlaps use probiou; candidate anchors are those inside the *rotated*
    gt box (cross-product containment test, tal.py select_candidates_in_rotated_gts).
    """
    from fce_yolo_tpu.ops.iou import probiou

    b, a_n, nc = pd_scores.shape
    m = gt_labels.shape[1]

    # rotated containment: corners of each gt rbox, anchor inside parallelogram
    cx, cy, w, h, r = (gt_rboxes[..., i] for i in range(5))
    cos, sin = jnp.cos(r), jnp.sin(r)
    dx1, dy1 = w / 2 * cos, w / 2 * sin  # half-width vector
    dx2, dy2 = -h / 2 * sin, h / 2 * cos  # half-height vector
    a_pt = jnp.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1)[:, :, None, :]  # corner A (B,M,1,2)
    ab = jnp.stack([2 * dx1, 2 * dy1], -1)[:, :, None, :]
    ad = jnp.stack([2 * dx2, 2 * dy2], -1)[:, :, None, :]
    ap = anc_points[None, None, :, :] - a_pt  # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1)
    norm_ad = (ad * ad).sum(-1)
    ap_ab = (ap * ab).sum(-1)
    ap_ad = (ap * ad).sum(-1)
    mask_in_gts = (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)
    live = mask_in_gts & mask_gt[:, :, None]

    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)
    cls_scores = jnp.take_along_axis(pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1)
    cls_scores = jnp.where(live, cls_scores, 0.0)
    overlaps = probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :])
    overlaps = jnp.where(live, jnp.clip(overlaps, 0.0, None), 0.0)
    align_metric = cls_scores**alpha * overlaps**beta

    _, topk_idx = jax.lax.top_k(align_metric, topk)
    bidx = jnp.arange(b)[:, None, None]
    midx = jnp.arange(m)[None, :, None]
    mask_topk = (
        jnp.zeros((b, m, a_n), dtype=align_metric.dtype).at[bidx, midx, topk_idx].add(1.0)
    )
    mask_pos = mask_topk * live.astype(align_metric.dtype)

    fg_counts = mask_pos.sum(axis=-2)
    multi = fg_counts[:, None, :] > 1
    max_overlap_gt = jnp.argmax(overlaps, axis=-2)
    is_max = jax.nn.one_hot(max_overlap_gt, m, dtype=mask_pos.dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2) > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)

    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
    target_bboxes = jnp.take_along_axis(
        gt_rboxes, target_gt_idx[..., None].repeat(5, -1), axis=1
    )  # (B, A, 5)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)

    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)
    pos_overlap = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(axis=-2)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)

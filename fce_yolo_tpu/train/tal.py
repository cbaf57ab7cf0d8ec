"""Task-Aligned Assigner — fully masked, static-shape, HBM-lean jnp.

Behavioral parity target: reference utils/tal.py:12-350 (TaskAlignedAssigner).
The reference materializes ~15 dense (batch, max_boxes, anchors) f32 tensors
(candidate masks, one-hots, scatter masks); at production shapes
(B=64, M=32, A=8400) that is >1 GB of HBM traffic per step and dominated the
round-1 train step (133 ms of a 218 ms step). This re-design stores exactly
TWO (B, M, A) tensors — the f32 ranking metric and the (metric_dtype,
default bf16) overlaps — and resolves every downstream decision with dense
reductions:

  1. one fused pass emits metric = score^alpha * CIoU^beta and overlaps
     (both masked to anchors inside valid gt boxes);
  2. ``top_k`` per gt yields only the K-th VALUE; the candidate set is the
     dense threshold mask ``metric >= kth`` — no index gathers;
  3. per-anchor claim counts + the reference's multi-claim resolution
     (argmax over gts of overlap, tal.py:299-328) as dense reductions over
     the already-materialized (B, M, A) tensors — TPU scatters serialize
     and cost tens of ms at production shapes, so none are used;
  4. per-gt normalizers (pos_align/pos_overlap, tal.py:118-124) as masked
     maxes over the assignment-equality mask.

Threshold-vs-explicit-topk divergence: anchors TIED at the K-th metric all
become candidates (the reference keeps an arbitrary K of them), and a gt
with < K live anchors admits its zero-metric in-box anchors. Both give the
extra anchors zero target weight, so every loss term is unchanged; only
the fg bitmask can differ on ties.

Ground truths arrive pre-padded to ``max_boxes`` with a validity mask (the
padded-batch contract the reference itself builds in loss.py:294-309).
Everything is wrapped in ``stop_gradient`` by the caller (assignment is
no-grad, reference tal.py:43).

``metric_dtype`` controls the storage precision of the two big tensors; all
math happens in f32 and only the stored values are rounded, so bf16 can at
most flip top-k/argmax rankings between near-tied candidates (assignment
changes on <<1% of anchors; see tests/test_loss.py). Use f32 for bit-exact
reference parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fce_yolo_tpu.ops.iou import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy (5 for rotated)
    target_norm: jnp.ndarray  # (B, A) float = dense target_scores.sum(-1)
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32

    def dense_scores(self, num_classes: int, dtype=jnp.float32) -> jnp.ndarray:
        """(B, A, nc) soft target scores (reference assigner's 3rd output).

        one_hot(label) * norm; norm is already zero outside fg. Only built on
        demand — the losses consume ``target_norm`` directly (BCE against a
        one-hot target has a closed form that never materializes this).
        """
        oh = jax.nn.one_hot(self.target_labels, num_classes, dtype=dtype)
        return oh * self.target_norm[..., None].astype(dtype)


def _kth_value(metric: jnp.ndarray, topk: int) -> jnp.ndarray:
    """K-th largest metric per gt, (B, M, 1) — EXACT, by iterative knockout.

    ``lax.top_k`` lowers to a full stable variadic sort of the (B, M, A)
    plane on TPU (18 ms/step at production shapes, r3 profile). The value is
    only used as a THRESHOLD, so instead knock out the current per-row
    argmax (first-index tie-break, exactly one element per round — duplicate
    values survive, matching top_k's multiset semantics) topk-1 times and
    take the remaining max: K-1 cheap fused max/where passes. approx_max_k
    would be faster still but silently misses maxima, widening the
    candidate set.
    """
    m = metric
    iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, m.ndim - 1)
    for _ in range(topk - 1):
        idx = jnp.argmax(m, axis=-1, keepdims=True)
        m = jnp.where(iota == idx, -jnp.inf, m)
    return jnp.max(m, axis=-1, keepdims=True)


def _finalize(
    metric: jnp.ndarray,  # (B, M, A) metric_dtype, masked to live candidates
    overlaps: jnp.ndarray,  # (B, M, A) metric_dtype, masked
    live: jnp.ndarray,  # (B, M, A) bool — anchor inside a valid gt box
    kth: jnp.ndarray,  # (B, M, 1) K-th largest metric per gt
    labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4|5)
    eps: float,
) -> AssignResult:
    """Steps 3-4: claim resolution + target gathering — dense reductions
    only (no TPU scatters)."""
    b, m, a_n = metric.shape

    # candidate mask: top-k by value threshold, restricted to STRICTLY
    # POSITIVE metrics. This reproduces the reference's effective rule
    # (tal.py:201-230): top-10 of (metric * in_gts) keeps the positive
    # in-box anchors, while its zero-metric tie-fills land on arbitrary
    # low-index anchors that mask_in_gts then removes. Without the
    # ``metric > 0`` term a gt whose in-box anchors are ALL zero-metric
    # gets kth == 0 and claims every live anchor; the multi-claim
    # overlap-argmax then reassigns genuinely-positive anchors to that
    # zero-metric gt, zeroing their weights — measured as a training
    # collapse (best_fitness 0.68 -> 0.016). NOTE ``> 0``, not ``> eps``:
    # early-training metrics sit at 1e-13 and are real signal (the
    # reference's eps gate is dead code — its caller always supplies
    # topk_mask=mask_gt).
    mask_pos = live & (metric >= kth) & (metric > 0)

    count = mask_pos.sum(axis=1)  # (B, A) per-anchor claim count
    single_gt = jnp.argmax(mask_pos, axis=1).astype(jnp.int32)  # first claimant
    # multi-claim winner: argmax over gts of overlap — the reference picks
    # this gt even if it never claimed the anchor via top-k (tal.py:313-317)
    max_overlap_gt = jnp.argmax(overlaps, axis=1).astype(jnp.int32)

    fg_mask = count > 0
    target_gt_idx = jnp.where(count > 1, max_overlap_gt, single_gt)

    # Every per-anchor lookup below is a masked reduction over the
    # assignment one-hot plane — NO take_along_axis: TPU lowers those
    # gathers to serial kCustom kernels (~45 ms/step at production shapes,
    # r3 profile), while these reductions fuse into a few full-bandwidth
    # HBM passes and the bbox lookup rides the MXU as a one-hot matmul.
    assigned = fg_mask[:, None, :] & (
        target_gt_idx[:, None, :] == jnp.arange(m, dtype=jnp.int32)[None, :, None]
    )  # (B, M, A) — exactly one True per fg anchor, all-False elsewhere

    metric_sel = jnp.where(assigned, metric.astype(jnp.float32), 0.0)  # (B, M, A)
    # at the assigned gt: one-hot row-sum == the selected value
    metric_at = metric_sel.sum(axis=1)  # (B, A), zero outside fg
    # per-gt peak metric/overlap over its assigned anchors (tal.py:118-124)
    pos_align = jnp.max(metric_sel, axis=2)  # (B, M)
    pos_overlap = jnp.max(
        jnp.where(assigned, overlaps.astype(jnp.float32), 0.0), axis=2
    )  # (B, M)
    # per-gt rescale factor, looked up per anchor via the same one-hot plane
    gt_scale = pos_overlap / (pos_align + eps)  # (B, M)
    norm = metric_at * (assigned * gt_scale[:, :, None]).sum(axis=1)

    onehot = assigned.astype(jnp.float32)
    # labels < 2^24 are exact in f32
    target_labels = (onehot * labels[:, :, None].astype(jnp.float32)).sum(1).astype(jnp.int32)
    target_bboxes = jnp.einsum("bma,bmk->bak", onehot, gt_bboxes)
    return AssignResult(
        target_labels=target_labels,
        target_bboxes=target_bboxes,
        target_norm=jnp.where(fg_mask, norm, 0.0),
        fg_mask=fg_mask,
        target_gt_idx=target_gt_idx,
    )


def assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid scores (or logits, see flag)
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
    scores_logits: bool = False,
    metric_dtype=jnp.bfloat16,
) -> AssignResult:
    """Task-aligned one-to-many assignment.

    align metric = score(gt_class)^alpha * CIoU(pred, gt)^beta over anchors
    whose centers fall inside the gt box; top-k per gt; anchors claimed by
    multiple gts go to the highest-IoU one; target norm is the per-gt
    normalized metric (reference tal.py:109-125).

    Args:
        scores_logits: pd_scores are raw logits — sigmoid is applied after
            the per-gt class gather ((B,M,A) instead of (B,A,nc) work).
        metric_dtype: storage dtype of the two (B, M, A) tensors.
    """
    b, a_n, nc = pd_scores.shape
    m = gt_labels.shape[1]
    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)  # (B, M)

    # --- fused metric pass (stores exactly two (B, M, A) tensors) ---------
    gx1 = gt_bboxes[..., 0][:, :, None]
    gy1 = gt_bboxes[..., 1][:, :, None]
    gx2 = gt_bboxes[..., 2][:, :, None]
    gy2 = gt_bboxes[..., 3][:, :, None]
    ax = anc_points[None, None, :, 0]
    ay = anc_points[None, None, :, 1]
    # anchor center strictly inside gt box (tal.py:275-297)
    in_gts = (ax - gx1 > eps) & (ay - gy1 > eps) & (gx2 - ax > eps) & (gy2 - ay > eps)
    live = in_gts & mask_gt[:, :, None]  # (B, M, A)

    # class-score gather as an MXU one-hot matmul: (B, A, nc) x (B, nc, M)
    # — avoids materializing the (B, nc, A) transpose + serial gather
    onehot = jax.nn.one_hot(labels, nc, dtype=pd_scores.dtype)  # (B, M, nc)
    cls_sc = jnp.einsum("bac,bmc->bma", pd_scores, onehot)  # (B, M, A)
    if scores_logits:
        cls_sc = jax.nn.sigmoid(cls_sc)
    ov = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, mode="CIoU"
    )
    ov = jnp.clip(ov, 0.0, None)
    overlaps = jnp.where(live, ov, 0.0).astype(metric_dtype)
    # the RANKING metric stays f32: the candidate set is "metric >= kth", and
    # reduced precision makes k-th-value ties ubiquitous early in training
    # (near-uniform scores), exploding the positive set — measured as a
    # convergence regression when this was bf16
    metric = jnp.where(live, cls_sc**alpha * ov**beta, 0.0)

    # --- top-k candidates per gt (tal.py:201-230) --------------------------
    kth = _kth_value(metric, topk)  # (B, M, 1)
    return _finalize(metric, overlaps, live, kth, labels, gt_bboxes, eps)


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
    scores_logits: bool = False,
    metric_dtype=jnp.bfloat16,
) -> AssignResult:
    """Rotated TAL (reference RotatedTaskAlignedAssigner, tal.py:318-350):
    overlaps use probiou; candidate anchors are those inside the *rotated*
    gt box (cross-product containment, tal.py select_candidates_in_rotated_gts).
    Same compact two-tensor restructure as :func:`assign`.
    """
    from fce_yolo_tpu.ops.iou import probiou

    b, a_n, nc = pd_scores.shape
    m = gt_labels.shape[1]
    labels = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)

    # rotated containment: corner A + edge vectors of each gt rbox
    cx, cy, w, h, r = (gt_rboxes[..., i] for i in range(5))
    cos, sin = jnp.cos(r), jnp.sin(r)
    dx1, dy1 = w / 2 * cos, w / 2 * sin  # half-width vector
    dx2, dy2 = -h / 2 * sin, h / 2 * cos  # half-height vector
    a_x = (cx - dx1 - dx2)[:, :, None]  # corner A (B, M, 1)
    a_y = (cy - dy1 - dy2)[:, :, None]
    abx, aby = (2 * dx1)[:, :, None], (2 * dy1)[:, :, None]
    adx, ady = (2 * dx2)[:, :, None], (2 * dy2)[:, :, None]
    norm_ab = abx * abx + aby * aby
    norm_ad = adx * adx + ady * ady

    def contains(px, py):  # px/py broadcastable to (B, M, ...)
        apx, apy = px - a_x, py - a_y
        ap_ab = apx * abx + apy * aby
        ap_ad = apx * adx + apy * ady
        return (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)

    ax = anc_points[None, None, :, 0]
    ay = anc_points[None, None, :, 1]
    live = contains(ax, ay) & mask_gt[:, :, None]  # (B, M, A)

    onehot = jax.nn.one_hot(labels, nc, dtype=pd_scores.dtype)
    cls_sc = jnp.einsum("bac,bmc->bma", pd_scores, onehot)
    if scores_logits:
        cls_sc = jax.nn.sigmoid(cls_sc)
    ov = jnp.clip(probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :]), 0.0, None)
    overlaps = jnp.where(live, ov, 0.0).astype(metric_dtype)
    metric = jnp.where(live, cls_sc**alpha * ov**beta, 0.0)  # f32 ranking (see assign)

    kth = _kth_value(metric, topk)
    return _finalize(metric, overlaps, live, kth, labels, gt_rboxes, eps)

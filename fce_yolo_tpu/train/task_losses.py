"""Task losses beyond detect: segment / pose / obb / classify.

Parity targets: reference utils/loss.py v8SegmentationLoss:382,
v8PoseLoss:563, v8OBBLoss:734, v8ClassificationLoss:724. TPU re-design:

- The reference loops per image and boolean-gathers foreground anchors
  (ragged). Here each loss selects a STATIC top-K foreground subset per
  image (shape-stable; K bounds the per-image instance count, which is
  <= max_labels anyway) and computes masked dense math — one fusion
  domain, no recompiles.
- Mask targets arrive as padded per-instance bitmaps (B, M, Hm, Wm)
  (the non-overlap contract; the reference's overlap encoding is a
  storage optimization we don't need with static padding).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fce_yolo_tpu.ops.anchors import dist2rbox, make_anchors
from fce_yolo_tpu.ops.iou import probiou
from fce_yolo_tpu.train import tal
from fce_yolo_tpu.train.loss import (
    DetectionLossCfg,
    LossState,
    _bce_with_logits,
    _dfl_loss,
    detection_loss,
)

__all__ = ["segmentation_loss", "pose_loss", "obb_loss", "classification_loss", "OKS_SIGMA"]

# COCO keypoint sigmas (reference utils/loss.py:594)
OKS_SIGMA = (
    jnp.array(
        [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
    )
    / 10.0
)


def _topk_fg(aux: dict, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select a static top-K foreground anchor subset per image.

    Returns (idx (B, K) int32, valid (B, K) bool). Ranked by assignment
    weight so the K cap drops the least-confident extras first.
    """
    assign = aux["assign"]
    score = assign.target_norm + assign.fg_mask.astype(jnp.float32)
    _, idx = jax.lax.top_k(score, k)  # (B, K)
    valid = jnp.take_along_axis(assign.fg_mask, idx, axis=1)
    return idx.astype(jnp.int32), valid


def _crop_weight(h: int, w: int, xyxy: jnp.ndarray) -> jnp.ndarray:
    """Inside-box indicator grid: xyxy (..., 4) in mask pixels -> (..., h, w)."""
    ys = jnp.arange(h, dtype=xyxy.dtype)[:, None]
    xs = jnp.arange(w, dtype=xyxy.dtype)[None, :]
    x1, y1, x2, y2 = (xyxy[..., i][..., None, None] for i in range(4))
    return ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)).astype(xyxy.dtype)


def segmentation_loss(
    out: dict,
    batch: dict[str, jnp.ndarray],
    cfg: DetectionLossCfg,
    state: LossState,
    max_fg: int = 64,
) -> tuple[jnp.ndarray, dict, LossState]:
    """Detection loss + per-instance mask BCE (reference loss.py:382-561).

    batch adds "masks": (B, M, Hm, Wm) float binary instance masks at (or
    above) proto resolution, index-aligned with "cls"/"bboxes".
    """
    total, parts, state, aux = detection_loss(out["feats"], batch, cfg, state, return_aux=True)
    b = out["proto"].shape[0]
    hm, wm = out["proto"].shape[1:3]
    imgsz_h, imgsz_w = aux["imgsz"]

    masks = batch["masks"].astype(jnp.float32)
    if masks.shape[-2:] != (hm, wm):
        masks = jax.image.resize(masks, (*masks.shape[:2], hm, wm), method="nearest")

    idx, valid = _topk_fg(aux, max_fg)  # (B, K)
    assign = aux["assign"]
    coefs = jnp.take_along_axis(out["mask_coefs"], idx[..., None], axis=1)  # (B, K, nm)
    gt_idx = jnp.take_along_axis(assign.target_gt_idx, idx, axis=1)  # (B, K)
    gt_mask = jnp.take_along_axis(masks, gt_idx[..., None, None], axis=1)  # (B, K, hm, wm)
    tbox = jnp.take_along_axis(assign.target_bboxes, idx[..., None], axis=1)  # (B, K, 4) px

    # normalized -> mask-pixel boxes + areas (reference loss.py:536-546)
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], tbox.dtype)
    tbox_n = tbox / scale
    area = jnp.clip((tbox_n[..., 2] - tbox_n[..., 0]) * (tbox_n[..., 3] - tbox_n[..., 1]), 1e-4, None)
    mxyxy = tbox_n * jnp.asarray([wm, hm, wm, hm], tbox.dtype)

    pred_mask = jnp.einsum("bkn,bhwn->bkhw", coefs, out["proto"])  # (B, K, hm, wm)
    bce = _bce_with_logits(pred_mask, gt_mask)
    crop = _crop_weight(hm, wm, mxyxy)
    per_anchor = (bce * crop).mean(axis=(-2, -1)) / area  # (B, K)
    n_valid = jnp.maximum(valid.sum(), 1)
    loss_seg = (per_anchor * valid).sum() / n_valid

    parts = dict(parts)
    parts["seg"] = loss_seg * cfg.box_gain
    total = total + parts["seg"] * b
    return total, parts, state


class PoseLossCfg(NamedTuple):
    det: DetectionLossCfg = DetectionLossCfg(nc=1)
    kpt_shape: tuple[int, int] = (17, 3)
    pose_gain: float = 12.0
    kobj_gain: float = 1.0


def pose_loss(
    out: dict,
    batch: dict[str, jnp.ndarray],
    cfg: PoseLossCfg,
    state: LossState,
    max_fg: int = 64,
) -> tuple[jnp.ndarray, dict, LossState]:
    """Detection loss + OKS-style keypoint location + visibility BCE
    (reference v8PoseLoss:563-723, KeypointLoss:636-660).

    batch adds "keypoints": (B, M, nkpt, 3) with xy normalized to [0, 1]
    and visibility flag.
    """
    total, parts, state, aux = detection_loss(out["feats"], batch, cfg.det, state, return_aux=True)
    b = out["kpts"].shape[0]
    nkpt, ndim = cfg.kpt_shape
    imgsz_h, imgsz_w = aux["imgsz"]
    anchors, stride_t = aux["anchor_points"], aux["stride_tensor"]

    idx, valid = _topk_fg(aux, max_fg)
    assign = aux["assign"]
    raw = jnp.take_along_axis(out["kpts"], idx[..., None], axis=1).reshape(b, -1, nkpt, ndim)
    anc = anchors[idx]  # (B, K, 2)
    strd = stride_t[idx]  # (B, K, 1)
    pred_xy = (raw[..., :2] * 2.0 + (anc[:, :, None, :] - 0.5)) * strd[:, :, None, :]

    gt_idx = jnp.take_along_axis(assign.target_gt_idx, idx, axis=1)
    kpts = batch["keypoints"].astype(jnp.float32)  # (B, M, nkpt, 3)
    gt_k = jnp.take_along_axis(kpts, gt_idx[..., None, None], axis=1)  # (B, K, nkpt, 3)
    gt_xy = gt_k[..., :2] * jnp.asarray([imgsz_w, imgsz_h], jnp.float32)
    kpt_mask = (gt_k[..., 2] != 0) & valid[..., None]  # (B, K, nkpt)

    tbox = jnp.take_along_axis(assign.target_bboxes, idx[..., None], axis=1)
    area = jnp.clip((tbox[..., 2] - tbox[..., 0]) * (tbox[..., 3] - tbox[..., 1]), 1e-9, None)

    sigmas = (
        OKS_SIGMA if nkpt == 17 else jnp.full((nkpt,), 1.0 / nkpt)
    ).astype(jnp.float32)
    d2 = ((pred_xy - gt_xy) ** 2).sum(-1)  # (B, K, nkpt)
    e = d2 / (2 * sigmas[None, None, :]) ** 2 / (area[..., None] + 1e-9) / 2
    kpt_loss_factor = kpt_mask.shape[-1] / (jnp.maximum(kpt_mask.sum(-1, keepdims=True), 1))
    # Reference KeypointLoss (loss.py:636-660) takes .mean() over ALL
    # (fg_anchor, nkpt) elements — normalize by valid_fg * nkpt, not by the
    # visible-keypoint count, to keep the pose/box/cls balance identical.
    loss_kpt = ((1 - jnp.exp(-e)) * kpt_mask * kpt_loss_factor).sum() / jnp.maximum(
        valid.sum() * nkpt, 1
    )

    if ndim == 3:
        obj_logit = jnp.take_along_axis(out["kpts"], idx[..., None], axis=1).reshape(
            b, -1, nkpt, ndim
        )[..., 2]
        bce = _bce_with_logits(obj_logit, kpt_mask.astype(jnp.float32))
        loss_kobj = (bce * valid[..., None]).sum() / jnp.maximum(valid.sum() * nkpt, 1)
    else:
        loss_kobj = jnp.float32(0.0)

    parts = dict(parts)
    parts["kpt"] = loss_kpt * cfg.pose_gain
    parts["kobj"] = loss_kobj * cfg.kobj_gain
    total = total + (parts["kpt"] + parts["kobj"]) * b
    return total, parts, state


def obb_loss(
    out: dict,
    batch: dict[str, jnp.ndarray],
    cfg: DetectionLossCfg,
    state: LossState,
) -> tuple[jnp.ndarray, dict, LossState]:
    """Rotated-box detection loss (reference v8OBBLoss:734-850).

    batch: "cls" (B, M), "bboxes" (B, M, 5) normalized xywh + angle(rad),
    "mask" (B, M). Assignment uses probiou instead of CIoU; box loss is
    1 - probiou; DFL targets come from the axis-aligned ltrb of the rotated
    target (reference bbox2dist on xywh2xyxy of the derotated box).
    """
    feats, angle = out["feats"], out["angle"]
    nc, reg_max = cfg.nc, cfg.reg_max
    no = nc + reg_max * 4
    b = feats[0].shape[0]
    dtype = feats[0].dtype

    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
    pred_distri, pred_scores = flat[..., : reg_max * 4], flat[..., reg_max * 4 :]
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_tensor = make_anchors(shapes, list(cfg.strides), 0.5, dtype=dtype)
    imgsz_h = feats[0].shape[1] * cfg.strides[0]
    imgsz_w = feats[0].shape[2] * cfg.strides[0]

    gt = batch["bboxes"].astype(dtype)  # (B, M, 5) normalized xywh + r
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h, 1.0], dtype)
    gt_rb = gt * scale  # pixel xywhr
    gt_labels = batch["cls"].astype(jnp.int32)
    mask_gt = batch["mask"] & (gt[..., 2] * gt[..., 3] > 0)

    from fce_yolo_tpu.ops.anchors import dfl_expectation

    pred_dist4 = pred_distri.reshape(b, -1, 4, reg_max)
    pred_ltrb = dfl_expectation(pred_distri, reg_max)
    pred_rb = dist2rbox(pred_ltrb, angle.astype(dtype), anchor_points[None])  # feature units
    pred_rb_px = jnp.concatenate(
        [pred_rb * stride_tensor[None], angle.astype(dtype)], axis=-1
    )  # (B, A, 5)

    assign_out = jax.lax.stop_gradient(
        tal.assign_rotated(
            pred_scores,
            pred_rb_px,
            anchor_points * stride_tensor,
            gt_labels,
            gt_rb,
            mask_gt,
            topk=cfg.tal_topk,
            num_classes=nc,
            alpha=cfg.tal_alpha,
            beta=cfg.tal_beta,
            scores_logits=True,
            metric_dtype=jnp.dtype(cfg.tal_dtype),
        )
    )
    norm = assign_out.target_norm
    target_scores_sum = jnp.maximum(norm.sum(), 1.0)

    # closed-form BCE vs one_hot(label) * norm; iota-compare select, not
    # take_along_axis — TPU gathers serialize (see train/loss.py)
    x_at_label = jnp.where(
        jnp.arange(nc, dtype=jnp.int32) == assign_out.target_labels[..., None],
        pred_scores, 0.0,
    ).sum(-1)
    loss_cls = (
        jax.nn.softplus(pred_scores).sum() - (norm * x_at_label).sum()
    ) / target_scores_sum

    # pixel xywhr -> feature units (angle unscaled)
    tb = jnp.concatenate(
        [assign_out.target_bboxes[..., :4] / stride_tensor[None], assign_out.target_bboxes[..., 4:]],
        axis=-1,
    )
    # off-fg target rboxes are all-zero (one-hot matmul in the assigner);
    # probiou's backward hits 0/0 on zero-area boxes even under zero loss
    # weight (NaN * 0 = NaN), so substitute a unit box there
    safe = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0], tb.dtype)
    tb = jnp.where(assign_out.fg_mask[..., None], tb, safe)
    weight = norm

    iou = probiou(jnp.concatenate([pred_rb, angle.astype(dtype)], -1), tb)
    loss_box = ((1.0 - iou) * weight).sum() / target_scores_sum

    # DFL on the axis-aligned footprint of the rotated target (loss.py:820-828)
    from fce_yolo_tpu.ops.anchors import bbox2dist

    half = tb[..., 2:4] / 2
    tb_xyxy = jnp.concatenate([tb[..., :2] - half, tb[..., :2] + half], axis=-1)
    target_ltrb = bbox2dist(anchor_points[None], tb_xyxy, reg_max)
    dfl = _dfl_loss(pred_dist4, target_ltrb, reg_max)
    loss_dfl = (dfl * weight).sum() / target_scores_sum

    parts = {
        "box": loss_box * cfg.box_gain,
        "cls": loss_cls * cfg.cls_gain,
        "dfl": loss_dfl * cfg.dfl_gain,
        "fg_count": assign_out.fg_mask.sum().astype(jnp.float32),
    }
    total = (parts["box"] + parts["cls"] + parts["dfl"]) * b
    return total, parts, state


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    """Cross-entropy (reference v8ClassificationLoss:724-733)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels.astype(jnp.int32)[:, None], axis=-1).mean()
    return nll, {"cls": nll}


def e2e_detect_loss(out: dict, batch: dict, cfg, state):
    """YOLOv10 dual-assignment loss (reference utils/loss.py:851-867
    E2EDetectLoss): one2many branch with topk-10 TAL + one2one branch with
    topk-1 TAL on detached features; totals summed. The one2one branch's
    inputs are already stop_gradient-ed inside V10Detect, so the two losses
    optimize disjoint heads over a shared (one2many-driven) backbone.
    """
    from fce_yolo_tpu.train.loss import detection_loss

    many_total, many_parts, state = detection_loss(
        out["feats"], batch, cfg._replace(tal_topk=10), state
    )
    one_total, one_parts, state = detection_loss(
        out["one2one_feats"], batch, cfg._replace(tal_topk=1), state
    )
    parts = {f"one2many_{k}": v for k, v in many_parts.items()}
    parts.update({f"one2one_{k}": v for k, v in one_parts.items()})
    parts["box"] = many_parts["box"] + one_parts["box"]
    parts["cls"] = many_parts["cls"] + one_parts["cls"]
    parts["dfl"] = many_parts["dfl"] + one_parts["dfl"]
    return many_total + one_total, parts, state

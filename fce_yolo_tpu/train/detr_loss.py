"""RT-DETR training loss: Hungarian matching + VFL/GIoU/L1 with per-layer aux.

Parity targets: reference models/utils/loss.py (DETRLoss:17-392,
RTDETRDetectionLoss:394-466), models/utils/ops.py (HungarianMatcher:14-150)
and the loss composition in nn/tasks.py RTDETRDetectionModel.loss:743-787
(enc layer prepended as aux layer 0; the LAST decoder layer is the main
loss; use_vfl=True).

TPU re-design: the reference flattens ragged per-image gt lists and runs
scipy's Hungarian on the host. Here ground truths arrive padded to
``max_boxes`` with a validity mask (the padded-batch contract of
train/loss.py) and matching runs fully on device via
``optax.assignment.hungarian_algorithm`` under ``vmap`` — padded gt columns
carry a large constant cost so they absorb junk queries, and every loss
term is masked by gt validity. Static shapes end to end; no host sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from fce_yolo_tpu.ops.iou import bbox_iou
from fce_yolo_tpu.train.loss import LossState, _bce_with_logits

__all__ = ["DETRLossCfg", "detr_loss", "hungarian_match", "make_cdn_group"]

_PAD_COST = 1e6


def make_cdn_group(
    gt_cls,  # (B, M) int, padded
    gt_bboxes,  # (B, M, 4) f32 normalized xywh, padded
    mask_gt,  # (B, M) bool validity
    nc: int,
    nq: int,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
    rng=None,
) -> dict:
    """Host-side contrastive-denoising group (reference
    models/utils/ops.py get_cdn_group:188-315), static-shape form.

    The reference strides its dn slots by the batch's max gt count; here the
    padded ``M`` is the (static) stride, so sub-max images carry inert padded
    slots exactly like the reference's — their class embedding is zeroed
    (``dn_cls = -1`` sentinel) and their raw-logit box stays 0.0, matching
    the reference's untouched ``padding_cls``/``padding_bbox`` zeros.

    Layout (reference copy-i -> slot block i of width M, ops.py:284-289):
    blocks [0, G) are positive copies, blocks [G, 2G) negative, so positives
    occupy slots [0, G*M) in gt order — the dn match is the identity.

    Returns numpy arrays: ``dn_cls`` (B, 2GM) int32 with -1 pads, ``dn_bbox``
    (B, 2GM, 4) f32 inverse-sigmoid logits, ``dn_attn_mask``
    (2GM+nq, 2GM+nq) bool (True = blocked), plus ``num_group``.
    """
    import numpy as np

    b, m = gt_cls.shape
    g = max(1, num_dn // max(m, 1))  # reference: num_dn // max_nums, min 1
    nd = 2 * g * m
    r = np.random.default_rng(rng)

    dn_cls = np.tile(np.asarray(gt_cls, np.int64), (1, 2 * g))  # (B, nd)
    dn_bbox = np.tile(np.asarray(gt_bboxes, np.float32), (1, 2 * g, 1))
    valid = np.tile(np.asarray(mask_gt, bool), (1, 2 * g))

    if cls_noise_ratio > 0:  # flip half-ratio of labels to random classes
        flip = r.random(dn_cls.shape) < (cls_noise_ratio * 0.5)
        dn_cls = np.where(flip, r.integers(0, nc, dn_cls.shape), dn_cls)

    if box_noise_scale > 0:
        xy, wh = dn_bbox[..., :2], dn_bbox[..., 2:]
        known = np.concatenate([xy - wh / 2, xy + wh / 2], -1)  # xyxy
        diff = np.tile(wh * 0.5, (1, 1, 2)) * box_noise_scale
        sign = r.integers(0, 2, dn_bbox.shape) * 2.0 - 1.0
        part = r.random(dn_bbox.shape)
        part[:, g * m:] += 1.0  # negative copies: shift in [1, 2) half-extents
        known = np.clip(known + sign * part * diff, 0.0, 1.0)
        c_xy, c_wh = (known[..., :2] + known[..., 2:]) / 2, known[..., 2:] - known[..., :2]
        dn_bbox = np.concatenate([c_xy, c_wh], -1)
        eps = 1e-6
        p = np.clip(dn_bbox, eps, 1 - eps)
        dn_bbox = np.log(p / (1 - p))  # torch.logit inverse-sigmoid

    dn_cls = np.where(valid, dn_cls, -1).astype(np.int32)
    dn_bbox = np.where(valid[..., None], dn_bbox, 0.0).astype(np.float32)

    # attention mask (ops.py:291-304): match queries blind to dn; each dn
    # group (2M-wide chunk) blind to every other dn chunk
    tgt = nd + nq
    amask = np.zeros((tgt, tgt), bool)
    amask[nd:, :nd] = True
    for i in range(g):
        s, e = 2 * m * i, 2 * m * (i + 1)
        amask[s:e, e:nd] = True
        amask[s:e, :s] = True
    return {"dn_cls": dn_cls, "dn_bbox": dn_bbox, "dn_attn_mask": amask,
            "num_group": g}


class DETRLossCfg(NamedTuple):
    nc: int = 80
    gain_class: float = 1.0
    gain_bbox: float = 5.0
    gain_giou: float = 2.0
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    gamma: float = 1.5  # focal focusing (DETRLoss FocalLoss default)
    alpha: float = 0.25  # focal balance
    matcher_gamma: float = 2.0  # reference HungarianMatcher gamma (ops.py:54)
    aux_loss: bool = True


def hungarian_match(
    pred_bboxes: jnp.ndarray,  # (B, nq, 4) xywh [0,1]
    pred_scores: jnp.ndarray,  # (B, nq, nc) logits
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xywh [0,1]
    gt_cls: jnp.ndarray,  # (B, M) int
    mask_gt: jnp.ndarray,  # (B, M) bool
    cfg: DETRLossCfg,
) -> jnp.ndarray:
    """Optimal bipartite assignment (reference HungarianMatcher.forward).

    Returns match_q (B, M) int32: the query index assigned to each (padded)
    gt slot. Padded slots get an arbitrary query (masked downstream).
    """
    scores = jax.nn.sigmoid(pred_scores)  # use_fl=True path (ops.py:117)
    ps = jnp.take_along_axis(
        scores, jnp.clip(gt_cls, 0, cfg.nc - 1)[:, None, :].astype(jnp.int32), axis=2
    )  # (B, nq, M)
    neg = (1 - cfg.alpha) * ps**cfg.matcher_gamma * (-jnp.log(1 - ps + 1e-8))
    pos = cfg.alpha * (1 - ps) ** cfg.matcher_gamma * (-jnp.log(ps + 1e-8))
    cost_class = pos - neg

    cost_bbox = jnp.abs(pred_bboxes[:, :, None, :] - gt_bboxes[:, None, :, :]).sum(-1)
    giou = bbox_iou(pred_bboxes[:, :, None, :], gt_bboxes[:, None, :, :], xywh=True, mode="GIoU")
    cost = (
        cfg.cost_class * cost_class
        + cfg.cost_bbox * cost_bbox
        + cfg.cost_giou * (1.0 - giou)
    )
    cost = jnp.where(mask_gt[:, None, :], cost, _PAD_COST)
    cost = jnp.nan_to_num(cost, nan=_PAD_COST, posinf=_PAD_COST, neginf=-_PAD_COST)

    rows, cols = jax.vmap(optax.assignment.hungarian_algorithm)(cost)  # (B, M) each
    m = gt_cls.shape[1]
    ab = jnp.arange(cost.shape[0])[:, None]
    match_q = jnp.zeros((cost.shape[0], m), jnp.int32).at[ab, cols].set(rows)
    return match_q


def _layer_loss(
    pred_bboxes: jnp.ndarray,  # (B, nq, 4)
    pred_scores: jnp.ndarray,  # (B, nq, nc) logits
    gt_bboxes: jnp.ndarray,  # (B, M, 4)
    gt_cls: jnp.ndarray,  # (B, M) int32
    mask_gt: jnp.ndarray,  # (B, M)
    cfg: DETRLossCfg,
    match_q: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(class, bbox, giou) losses for one prediction layer
    (reference DETRLoss._get_loss:310-349)."""
    b, nq, nc = pred_scores.shape
    if match_q is None:
        match_q = hungarian_match(
            jax.lax.stop_gradient(pred_bboxes), jax.lax.stop_gradient(pred_scores),
            gt_bboxes, gt_cls, mask_gt, cfg,
        )
    ab = jnp.arange(b)[:, None]
    num_gts = jnp.maximum(mask_gt.sum(), 1).astype(pred_bboxes.dtype)

    pb = jnp.take_along_axis(pred_bboxes, match_q[..., None], axis=1)  # (B, M, 4)

    # bbox L1 + GIoU over matched pairs (loss.py:120-152)
    l1 = jnp.where(mask_gt, jnp.abs(pb - gt_bboxes).sum(-1), 0.0).sum() / num_gts
    giou = bbox_iou(pb, gt_bboxes, xywh=True, mode="GIoU")
    l_giou = jnp.where(mask_gt, 1.0 - giou, 0.0).sum() / num_gts

    # class: VFL against IoU-weighted one-hot targets (loss.py:102-118,
    # use_vfl=True); falls back to focal when the batch has no gts
    iou_w = jax.lax.stop_gradient(
        jnp.where(mask_gt, jnp.clip(bbox_iou(pb, gt_bboxes, xywh=True), 0, 1), 0.0)
    )
    targets = jnp.full((b, nq), nc, jnp.int32).at[ab, match_q].set(
        jnp.where(mask_gt, gt_cls.astype(jnp.int32), nc)
    )
    gt_score_q = jnp.zeros((b, nq), pred_scores.dtype).at[ab, match_q].set(
        jnp.where(mask_gt, iou_w, 0.0)
    )
    one_hot = jax.nn.one_hot(targets, nc + 1, dtype=pred_scores.dtype)[..., :-1]
    gt_sc = gt_score_q[..., None] * one_hot
    p = jax.nn.sigmoid(pred_scores)
    bce_vfl = _bce_with_logits(pred_scores, gt_sc)
    w_vfl = cfg.alpha * p**cfg.gamma * (1 - one_hot) + gt_sc * one_hot
    vfl = (bce_vfl * w_vfl).mean(axis=1).sum()
    bce_fl = _bce_with_logits(pred_scores, one_hot)
    p_t = one_hot * p + (1 - one_hot) * (1 - p)
    w_fl = (1 - p_t) ** cfg.gamma * (one_hot * cfg.alpha + (1 - one_hot) * (1 - cfg.alpha))
    fl = (bce_fl * w_fl).mean(axis=1).sum()
    l_cls = jnp.where(mask_gt.sum() > 0, vfl, fl) / (num_gts / nq)

    return cfg.gain_class * l_cls, cfg.gain_bbox * l1, cfg.gain_giou * l_giou


def detr_loss(
    out: dict,
    batch: dict[str, jnp.ndarray],
    cfg: DETRLossCfg,
    state: LossState,
) -> tuple[jnp.ndarray, dict, LossState]:
    """Full RT-DETR loss: enc layer + all decoder layers, each re-matched
    (reference tasks.py:771-787 + DETRLoss.forward:351-392).

    out: the RTDETRDecoder train output — dec_bboxes (L, B, nq, 4),
    dec_scores (L, B, nq, nc), enc_bboxes/enc_scores (B, nq, ...).
    batch: the standard padded contract (cls / bboxes normalized xywh / mask).
    """
    gt_b = batch["bboxes"].astype(jnp.float32)
    gt_c = batch["cls"].astype(jnp.int32)
    mask = batch["mask"] & (batch["bboxes"][..., 2:].prod(-1) > 0)

    dec_bboxes, dec_scores = out["dec_bboxes"], out["dec_scores"]
    dn_loss = jnp.float32(0.0)
    if "dn_cls" in batch:
        # split the prepended denoising queries off every decoder layer
        # (reference tasks.py:764-770 dn_num_split) and charge them the
        # fixed-match dn loss (RTDETRDetectionLoss.forward:421-433)
        nd = batch["dn_cls"].shape[1]
        dn_bboxes, dec_bboxes = dec_bboxes[:, :, :nd], dec_bboxes[:, :, nd:]
        dn_scores, dec_scores = dec_scores[:, :, :nd], dec_scores[:, :, nd:]
        m = gt_c.shape[1]
        g = nd // (2 * m)
        # positives occupy slots [0, G*M) in gt order (make_cdn_group layout)
        # -> the dn match is the identity over G tiled copies of the gts
        gt_b_dn = jnp.tile(gt_b, (1, g, 1))
        gt_c_dn = jnp.tile(gt_c, (1, g))
        mask_dn = jnp.tile(mask, (1, g))
        match_dn = jnp.broadcast_to(
            jnp.arange(g * m, dtype=jnp.int32)[None], (gt_c.shape[0], g * m)
        )
        for li in range(dn_bboxes.shape[0]):  # main (last) + aux dn layers
            c, bx, gi = _layer_loss(
                dn_bboxes[li], dn_scores[li], gt_b_dn, gt_c_dn, mask_dn, cfg,
                match_q=match_dn,
            )
            dn_loss = dn_loss + c + bx + gi

    all_bboxes = jnp.concatenate([out["enc_bboxes"][None], dec_bboxes], axis=0)
    all_scores = jnp.concatenate([out["enc_scores"][None], dec_scores], axis=0)
    n_layers = all_bboxes.shape[0]

    # main loss = last layer; the rest are aux (each independently matched)
    l_cls, l_box, l_giou = _layer_loss(
        all_bboxes[-1], all_scores[-1], gt_b, gt_c, mask, cfg
    )
    aux_cls = aux_box = aux_giou = jnp.float32(0.0)
    if cfg.aux_loss:
        for li in range(n_layers - 1):
            c, bx, g = _layer_loss(all_bboxes[li], all_scores[li], gt_b, gt_c, mask, cfg)
            aux_cls, aux_box, aux_giou = aux_cls + c, aux_box + bx, aux_giou + g

    parts = {
        "cls": l_cls, "box": l_box, "giou": l_giou,
        "aux": aux_cls + aux_box + aux_giou,
        "dn": dn_loss,
        "fg_count": mask.sum().astype(jnp.float32),
    }
    total = l_cls + l_box + l_giou + parts["aux"] + dn_loss
    return total, parts, state

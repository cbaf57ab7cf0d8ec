"""Static-shape batched NMS for TPU.

The reference's NMS (utils/nms.py:13-166) filters candidates with boolean
masks (data-dependent shapes) and calls torchvision NMS per image — neither
maps to XLA. This re-design keeps every shape static:

1. Multi-label candidate selection = one top-k over the *flattened*
   (anchors x classes) score matrix (the same shape-static pattern as the
   reference's end2end ``Detect.postprocess``, nn/modules/head.py:191-212),
   giving K candidate (box, score, class) triples per image.
2. Greedy suppression = a pick-argmax/suppress ``lax.scan`` of max_det
   steps, each O(K) on the VPU (no K x K IoU matrix); identical keep-set
   and order to sequential greedy NMS (torchvision semantics).
3. Class separation uses the reference's coordinate-offset trick
   (utils/nms.py:143-149): boxes are shifted by ``class_id * max_wh`` so one
   IoU matrix handles class-aware suppression.

Outputs are fixed (max_det, 6) per image with invalid rows zero-scored, so
the whole predict path stays on device and jit-compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fce_yolo_tpu.ops.boxes import xywh2xyxy


def _pick_suppress(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float,
    max_det: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS as a pick-argmax / suppress scan — O(max_det * K), no K x K
    matrix. Each step selects the highest remaining score and masks every
    candidate overlapping it; exact torchvision keep-set and emit order.

    Args:
        boxes: (K, 4) xyxy with class offsets applied.
        scores: (K,) candidate scores.
        valid: (K,) candidates above the confidence threshold.

    Returns:
        (picked_idx (max_det,) int32, picked_ok (max_det,) bool) in
        descending-score order.
    """
    k = boxes.shape[0]
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0, None) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    neg_inf = jnp.float32(-jnp.inf)
    live_scores = jnp.where(valid, scores, neg_inf)

    def step(live, _):
        i = jnp.argmax(live)
        ok = live[i] > neg_inf
        b = boxes[i]
        lt = jnp.maximum(b[:2], boxes[:, :2])
        rb = jnp.minimum(b[2:], boxes[:, 2:])
        inter = jnp.clip(rb - lt, 0, None).prod(-1)
        iou = inter / (area[i] + area - inter + 1e-7)
        kill = (iou > iou_thres) | (jnp.arange(k) == i)
        live = jnp.where(ok & kill, neg_inf, live)
        return live, (i.astype(jnp.int32), ok)

    _, (idx, ok) = jax.lax.scan(step, live_scores, None, length=max_det)
    return idx, ok


def _select_candidates(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    pre_nms_topk: int,
    multi_label: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static top-K candidate selection over (anchors [x classes]).

    A flat top-k over all N*nc (anchor, class) pairs is the semantic target,
    but on TPU sorting 672k elements per image dominates the whole predict
    pipeline. Hierarchical selection instead: (1) top-K anchors by per-anchor
    max class score — one cheap (N,) top_k; (2) multi-label top-K over just
    those anchors' K*nc score rows. Any pair NMS could emit is within the
    top max_det anchors by max-score, so with K >= pre_nms_topk >> max_det
    the keep-set is unchanged in practice.
    """
    n, nc = scores.shape
    k = min(pre_nms_topk, n * nc if multi_label else n)
    if multi_label and nc > 1:
        ka = min(pre_nms_topk, n)
        best_score = jnp.max(scores, axis=-1)  # (N,)
        _, anchor_pool = jax.lax.top_k(best_score, ka)  # (Ka,)
        pool_scores = scores[anchor_pool]  # (Ka, nc)
        top_scores, top_idx = jax.lax.top_k(pool_scores.reshape(-1), k)
        anchor_idx = anchor_pool[top_idx // nc]
        cls_idx = top_idx % nc
    else:
        best_cls = jnp.argmax(scores, axis=-1)
        best_score = jnp.max(scores, axis=-1)
        top_scores, anchor_idx = jax.lax.top_k(best_score, k)
        cls_idx = best_cls[anchor_idx]
    return boxes[anchor_idx], top_scores, cls_idx, anchor_idx


def single_image_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    multi_label: bool = True,
    agnostic: bool = False,
    max_wh: float = 7680.0,
) -> dict[str, jnp.ndarray]:
    """NMS for one image with fully static shapes.

    Args:
        boxes: (N, 4) xyxy in input-image pixels.
        scores: (N, nc) per-class sigmoid scores.

    Returns dict with ``boxes`` (max_det, 4), ``scores`` (max_det,),
    ``classes`` (max_det,) int32 (-1 for empty slots), ``valid`` (max_det,) bool.
    """
    cand_boxes, top_scores, cls_idx, _ = _select_candidates(
        boxes, scores, pre_nms_topk, multi_label
    )
    valid = top_scores > conf_thres
    offset = jnp.where(agnostic, 0.0, cls_idx.astype(boxes.dtype) * max_wh)
    idx, kept = _pick_suppress(
        cand_boxes + offset[:, None], top_scores, valid, iou_thres, max_det
    )
    return {
        "boxes": jnp.where(kept[:, None], cand_boxes[idx], 0.0),
        "scores": jnp.where(kept, top_scores[idx], 0.0),
        "classes": jnp.where(kept, cls_idx[idx], -1).astype(jnp.int32),
        "valid": kept,
    }


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "max_det",
        "pre_nms_topk",
        "multi_label",
        "agnostic",
        "in_fmt",
        "impl",
        "nc",
    ),
)
def batched_nms(
    prediction: jnp.ndarray,
    *,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    multi_label: bool = True,
    agnostic: bool = False,
    in_fmt: str = "xywh",
    impl: str = "auto",
    nc: int | None = None,
) -> dict[str, jnp.ndarray]:
    """Batched NMS over decoded head output.

    Args:
        prediction: (B, N, 4 + nc [+ E]) — boxes, per-class scores, and
            optional extra per-anchor channels (mask coefficients, decoded
            keypoints, OBB angle). Pass ``nc`` when extras are present; they
            are gathered per kept detection into the ``extra`` output.
        impl: "auto" (Pallas kernel on TPU, scan elsewhere) | "pallas" | "scan".

    Returns dict of (B, max_det, ...) arrays; see ``single_image_nms``.
    """
    boxes = prediction[..., :4]
    if in_fmt == "xywh":
        boxes = xywh2xyxy(boxes)
    if nc is None:
        scores = prediction[..., 4:]
        extra = None
    else:
        scores = prediction[..., 4 : 4 + nc]
        extra = prediction[..., 4 + nc :] if prediction.shape[-1] > 4 + nc else None

    cand_boxes, top_scores, cls_idx, anchor_idx = jax.vmap(
        partial(_select_candidates, pre_nms_topk=pre_nms_topk, multi_label=multi_label)
    )(boxes, scores)
    valid = top_scores > conf_thres
    offset = jnp.where(agnostic, 0.0, cls_idx.astype(boxes.dtype) * 7680.0)
    shifted = cand_boxes + offset[..., None]

    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from fce_yolo_tpu.ops.pallas_nms import pallas_pick_suppress

        idx, kept = pallas_pick_suppress(
            shifted, top_scores, valid, iou_thres=iou_thres, max_det=max_det
        )
    else:
        idx, kept = jax.vmap(
            partial(_pick_suppress, iou_thres=iou_thres, max_det=max_det)
        )(shifted, top_scores, valid)

    take = lambda a: jnp.take_along_axis(a, idx, axis=1)
    out = {
        "boxes": jnp.where(kept[..., None], jnp.take_along_axis(cand_boxes, idx[..., None], axis=1), 0.0),
        "scores": jnp.where(kept, take(top_scores), 0.0),
        "classes": jnp.where(kept, take(cls_idx), -1).astype(jnp.int32),
        "valid": kept,
    }
    if extra is not None:
        kept_anchor = take(anchor_idx)  # candidate slot -> source anchor
        out["extra"] = jnp.where(
            kept[..., None],
            jnp.take_along_axis(extra, kept_anchor[..., None], axis=1),
            0.0,
        )
    return out


def _fast_nms_rotated(
    obb: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float,
    max_det: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``nms_rotated`` semantics (utils/nms.py rotated branch):
    candidates sorted by score, box j survives iff no higher-scored valid
    candidate has probiou >= thres with it (Fast-NMS — suppressed boxes still
    suppress). One K x K probiou matrix; no sequential loop — ideal for TPU.

    Args:
        obb: (K, 5) xywhr, class offsets applied to cx/cy, sorted by score desc.
        scores: (K,) descending.
        valid: (K,) above-confidence mask.

    Returns (idx (max_det,) int32, kept (max_det,) bool), descending score.
    """
    from fce_yolo_tpu.ops.iou import probiou

    k = obb.shape[0]
    iou = probiou(obb[:, None, :], obb[None, :, :])  # (K, K)
    higher = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :]) & valid[:, None]
    suppressed = ((iou >= iou_thres) & higher).any(axis=0)
    keep = valid & ~suppressed
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    kk = min(max_det, k)  # fewer candidates than max_det is legal
    top_scores, idx = jax.lax.top_k(kept_scores, kk)
    if kk < max_det:
        idx = jnp.pad(idx, (0, max_det - kk))
        top_scores = jnp.pad(top_scores, (0, max_det - kk), constant_values=-jnp.inf)
    return idx.astype(jnp.int32), top_scores > -jnp.inf


@partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "pre_nms_topk", "multi_label", "agnostic", "nc"),
)
def rotated_batched_nms(
    prediction: jnp.ndarray,
    *,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    multi_label: bool = True,
    agnostic: bool = False,
    nc: int | None = None,
) -> dict[str, jnp.ndarray]:
    """Rotated-box NMS with probiou suppression (reference non_max_suppression
    rotated=True branch + nms_rotated).

    Args:
        prediction: (B, N, 4 + nc + E) — xywh boxes, per-class scores, and
            extras whose FIRST channel is the angle (radians). ``nc`` required.

    Returns dict of (B, max_det, ...) with ``boxes`` as (cx, cy, w, h) —
    unrotated footprint kept for API symmetry — plus ``extra`` carrying the
    angle (+ any further channels) per kept detection.
    """
    assert nc is not None, "rotated NMS needs nc to locate the angle channel"
    boxes_xywh = prediction[..., :4]
    scores = prediction[..., 4 : 4 + nc]
    extra = prediction[..., 4 + nc :]
    angle = extra[..., 0]

    def one(boxes_i, scores_i, angle_i, extra_i):
        cand_boxes, top_scores, cls_idx, anchor_idx = _select_candidates(
            boxes_i, scores_i, pre_nms_topk, multi_label
        )
        cand_angle = angle_i[anchor_idx]
        valid = top_scores > conf_thres
        off = jnp.where(agnostic, 0.0, cls_idx.astype(boxes_i.dtype) * 7680.0)
        obb = jnp.concatenate(
            [cand_boxes[:, :2] + off[:, None], cand_boxes[:, 2:4], cand_angle[:, None]], -1
        )
        idx, kept = _fast_nms_rotated(obb, top_scores, valid, iou_thres, max_det)
        return {
            "boxes": jnp.where(kept[:, None], cand_boxes[idx], 0.0),
            "scores": jnp.where(kept, top_scores[idx], 0.0),
            "classes": jnp.where(kept, cls_idx[idx], -1).astype(jnp.int32),
            "valid": kept,
            "extra": jnp.where(kept[:, None], extra_i[anchor_idx[idx]], 0.0),
        }

    # _select_candidates converts nothing: rotated boxes stay xywh(+r)
    return jax.vmap(one)(boxes_xywh, scores, angle, extra)

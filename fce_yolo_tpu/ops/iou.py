"""IoU family: plain/GIoU/DIoU/CIoU (reference utils/metrics.py:80-148),
WIoU v1 (reference utils/metrics.py:149-219), and the pairwise N×M IoU used
for metric matching (reference utils/metrics.py:45-79).

Design notes (TPU):
- Everything broadcasts over leading dims; elementwise pairs compute in one
  fused VPU pass. ``stop_gradient`` replaces torch's ``no_grad`` for the
  CIoU aspect-ratio alpha term.
- ``mode`` is a static Python string so each variant traces to a minimal
  XLA graph (no runtime branching).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _corners(box: jnp.ndarray, xywh: bool):
    if xywh:
        x, y, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
        hw, hh = w * 0.5, h * 0.5
        return x - hw, y - hh, x + hw, y + hh, w, h
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return x1, y1, x2, y2, x2 - x1, y2 - y1


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    mode: str = "IoU",
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise IoU between broadcastable box tensors (trailing dim 4).

    ``mode``: "IoU" | "GIoU" | "DIoU" | "CIoU" (static). Returns shape of the
    broadcast of the leading dims (the trailing dim-4 axis is consumed, unlike
    the reference which keeps a trailing singleton).

    Parity: reference utils/metrics.py:80-148. The xywh=False path adds eps to
    w/h exactly as the reference does (h1 = y2-y1+eps, w via x2-x1) to match
    bit-level behavior of the CIoU aspect term.
    """
    if xywh:
        b1_x1, b1_y1, b1_x2, b1_y2, w1, h1 = _corners(box1, True)
        b2_x1, b2_y1, b2_x2, b2_y2, w2, h2 = _corners(box2, True)
    else:
        b1_x1, b1_y1, b1_x2, b1_y2, w1, h1 = _corners(box1, False)
        b2_x1, b2_y1, b2_x2, b2_y2, w2, h2 = _corners(box2, False)
        h1 = h1 + eps
        h2 = h2 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if mode == "IoU":
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height
    if mode == "GIoU":
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw * cw + ch * ch + eps  # convex diagonal squared
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    if mode == "DIoU":
        return iou - rho2 / c2
    if mode == "CIoU":
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        # Guard the 0/0 case (identical aspect ratios and iou ~= 1+eps, where
        # fp rounding can make the denominator exactly 0); v=0 => term is 0.
        denom = v - iou + (1 + eps)
        alpha = jax.lax.stop_gradient(jnp.where(v > 0, v / jnp.where(v > 0, denom, 1.0), 0.0))
        return iou - (rho2 / c2 + v * alpha)
    raise ValueError(f"unknown IoU mode {mode!r}")


def bbox_wiou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Wise-IoU v1 metric: 1 - exp(rho^2/C^2) * (1 - IoU).

    Higher is better; loss = 1 - metric. The v3 dynamic non-monotonic
    focusing coefficient lives in the loss layer (train/loss.py) because it
    carries EMA state. Parity: reference utils/metrics.py:149-219; the
    xywh=False path clamps w/h to eps (not add) exactly as the reference.
    """
    if xywh:
        b1_x1, b1_y1, b1_x2, b1_y2, w1, h1 = _corners(box1, True)
        b2_x1, b2_y1, b2_x2, b2_y2, w2, h2 = _corners(box2, True)
    else:
        b1_x1, b1_y1, b1_x2, b1_y2, w1, h1 = _corners(box1, False)
        b2_x1, b2_y1, b2_x2, b2_y2, w2, h2 = _corners(box2, False)
        w1, h1 = jnp.clip(w1, eps, None), jnp.clip(h1, eps, None)
        w2, h2 = jnp.clip(w2, eps, None), jnp.clip(h2, eps, None)

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    c2 = cw * cw + ch * ch + eps
    # rho2/c2 <= 1 (centers lie inside the enclosing box), so exp is bounded.
    return 1.0 - jnp.exp(rho2 / c2) * (1.0 - iou)


def box_iou_pairwise(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU matrix between (N, 4) and (M, 4) xyxy boxes -> (N, M).

    Parity: reference utils/metrics.py:45-79 (``box_iou``); used by the
    validator's pred<->gt matching and by NMS.
    """
    a = box1[:, None, :]  # (N, 1, 4)
    b = box2[None, :, :]  # (1, M, 4)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area1 = jnp.clip(box1[:, 2:] - box1[:, :2], 0, None).prod(-1)
    area2 = jnp.clip(box2[:, 2:] - box2[:, :2], 0, None).prod(-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def _obb_covariance(obb: jnp.ndarray, eps: float = 1e-7) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gaussian covariance terms (a, b, c) of an xywhr box
    (reference metrics.py _get_covariance_matrix)."""
    w, h, r = obb[..., 2], obb[..., 3], obb[..., 4]
    a = w * w / 12.0
    b = h * h / 12.0
    cos, sin = jnp.cos(r), jnp.sin(r)
    return (
        a * cos * cos + b * sin * sin,
        a * sin * sin + b * cos * cos,
        (a - b) * cos * sin,
    )


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Probabilistic IoU between broadcastable (..., 5) xywhr boxes.

    Hellinger-distance Gaussian similarity (reference metrics.py:283-325,
    arXiv:2106.06072). Fully elementwise -> broadcast (B, M, 1, 5) against
    (B, 1, A, 5) for the rotated assigner's (B, M, A) overlap tensor.
    """
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _obb_covariance(obb1)
    a2, b2, c2 = _obb_covariance(obb2)
    den = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / den * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / den * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0.0, None)
    det2 = jnp.clip(a2 * b2 - c2**2, 0.0, None)
    t3 = jnp.log((den - eps + eps) / (4.0 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd

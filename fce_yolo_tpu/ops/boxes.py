"""Box coordinate conversions and scaling.

Behavioral parity targets: reference utils/ops.py:204-420 (conversions),
utils/ops.py:102-151 (scale_boxes), utils/ops.py:152-168 (clip_boxes),
utils/ops.py:137-149 (make_divisible).

All functions operate on the trailing dim-4 axis and broadcast over any
leading shape, so they work unbatched, batched, or inside vmap.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round ``x`` up to the nearest multiple of ``divisor`` (host-side int math)."""
    return int(math.ceil(x / divisor) * divisor)


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    lt, rb = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(lt + rb) * 0.5, rb - lt], axis=-1)


def ltwh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(left, top, w, h) -> (x1, y1, x2, y2)."""
    lt, wh = x[..., :2], x[..., 2:4]
    return jnp.concatenate([lt, lt + wh], axis=-1)


def xyxy2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (left, top, w, h) — COCO annotation format."""
    lt, rb = x[..., :2], x[..., 2:4]
    return jnp.concatenate([lt, rb - lt], axis=-1)


def ltwh2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(left, top, w, h) -> (cx, cy, w, h)."""
    lt, wh = x[..., :2], x[..., 2:4]
    return jnp.concatenate([lt + wh * 0.5, wh], axis=-1)


def xywh2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (left, top, w, h)."""
    xy, wh = x[..., :2], x[..., 2:4]
    return jnp.concatenate([xy - wh * 0.5, wh], axis=-1)


def box_area(box: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; trailing dim 4 -> scalar per box."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def clip_boxes(boxes: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clamp xyxy boxes to image bounds ``shape`` = (height, width)."""
    h, w = shape
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_boxes(
    img1_shape: tuple[int, int],
    boxes: jnp.ndarray,
    img0_shape: tuple[int, int],
    ratio_pad: tuple[float, tuple[float, float]] | None = None,
    padding: bool = True,
) -> jnp.ndarray:
    """Rescale xyxy boxes from a letterboxed ``img1_shape`` back to ``img0_shape``.

    Matches the reference semantics: gain = min(h1/h0, w1/w0), symmetric pad
    computed with the same round-to-0.1 fudge the reference LetterBox uses.
    Shapes are (h, w) tuples; works on (..., 4) boxes.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0]
        pad_w, pad_h = ratio_pad[1]

    if padding:
        shift = jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
        boxes = boxes - shift
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)

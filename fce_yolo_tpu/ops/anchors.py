"""Anchor grids, distance<->box transforms, DFL expectation decode.

Parity targets: reference utils/tal.py:352-383 (make_anchors, dist2bbox,
bbox2dist) and nn/modules/block.py:58-80 (DFL).

TPU design: anchor grids are built from *static* feature shapes at trace
time, so they constant-fold into the compiled program — no anchor cache or
shape-change regeneration (reference head.py:161-163) is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_anchors(
    feat_shapes: list[tuple[int, int]],
    strides: list[int],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build concatenated anchor centers and per-anchor strides.

    Args:
        feat_shapes: list of (h, w) per detection level (static ints).
        strides: stride per level.

    Returns:
        anchor_points: (sum(h*w), 2) grid-cell centers in feature units.
        stride_tensor: (sum(h*w), 1).
    """
    points, stride_t = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_t.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_t, axis=0)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True) -> jnp.ndarray:
    """(l, t, r, b) distances from anchor -> box. Trailing axis layout.

    ``distance``: (..., 4), ``anchor_points``: broadcastable (..., 2).
    """
    lt, rb = distance[..., :2], distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """xyxy box -> (l, t, r, b) distances, clamped to [0, reg_max-0.01]."""
    x1y1, x2y2 = bbox[..., :2], bbox[..., 2:4]
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def dist2rbox(
    distance: jnp.ndarray, angle: jnp.ndarray, anchor_points: jnp.ndarray
) -> jnp.ndarray:
    """(l, t, r, b) + rotation angle -> rotated box (cx, cy, w, h).

    Matches reference utils/tal.py:385-403 dist2rbox: the lt/rb midpoint
    offset is rotated by the predicted angle around the anchor.
    ``distance``: (..., 4); ``angle``: (..., 1); anchor_points (..., 2).
    """
    lt, rb = distance[..., :2], distance[..., 2:4]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=-1)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=-1) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=-1)


def dfl_expectation(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss decode: softmax expectation over reg_max bins.

    ``pred_dist``: (..., 4 * reg_max) raw logits in [l*16, t*16, r*16, b*16]
    bin-major order (4 groups of reg_max, matching the reference's
    ``view(b, 4, c1, a)`` layout, block.py:78). Returns (..., 4) expected
    distances.

    Equivalent to the reference's frozen arange-conv but expressed as a
    softmax+dot that XLA fuses into the head epilogue.
    """
    shape = pred_dist.shape
    x = pred_dist.reshape(*shape[:-1], 4, reg_max)
    x = jax.nn.softmax(x, axis=-1)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.einsum("...kr,r->...k", x, proj)

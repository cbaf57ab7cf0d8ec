"""Instance-mask ops: prototype combination, crop, upsample.

Parity targets: reference utils/ops.py:445-553 (crop_mask, process_mask,
scale_masks). Static shapes: masks stay (max_det, H, W) with invalid rows
zeroed; everything jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["crop_mask", "process_mask", "process_mask_native", "scale_masks_np"]


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside each box (reference ops.py crop_mask).

    masks: (N, H, W); boxes: (N, 4) xyxy in mask pixels.
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    xs = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    return masks * inside


def process_mask(
    mask_coefs: jnp.ndarray,  # (N, nm) per-detection coefficients
    proto: jnp.ndarray,  # (Hp, Wp, nm) prototypes (NHWC layout)
    boxes: jnp.ndarray,  # (N, 4) xyxy in input-image pixels
    img_shape: tuple[int, int],  # (H, W) of the network input
    upsample: bool = True,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """coefs x protos -> sigmoid -> crop -> (optional) upsample -> binarize.

    Returns (N, H, W) bool at input resolution (upsample=True) or proto
    resolution. Matches reference ops.py:process_mask semantics.
    """
    hp, wp, nm = proto.shape
    ih, iw = img_shape
    m = jnp.einsum("nk,hwk->nhw", mask_coefs, proto)
    m = jax.nn.sigmoid(m)
    scale = jnp.asarray([wp / iw, hp / ih, wp / iw, hp / ih], boxes.dtype)
    m = crop_mask(m, boxes * scale)
    if upsample:
        m = jax.image.resize(m, (m.shape[0], ih, iw), method="bilinear")
    return m > threshold


def scale_masks_np(masks, orig_shape: tuple[int, int], ratio: float, pad: tuple[float, float]):
    """Host-side: strip letterbox padding and resize masks to the original
    image (reference ops.py scale_masks). masks: (N, H, W) bool numpy."""
    import cv2
    import numpy as np

    masks = np.asarray(masks)
    n, h, w = masks.shape
    pw, ph = pad
    top, left = int(round(ph)), int(round(pw))
    bottom, right = h - int(round(ph)), w - int(round(pw))
    out = np.zeros((n, orig_shape[0], orig_shape[1]), bool)
    for i in range(n):
        crop = masks[i, top:bottom, left:right].astype(np.uint8)
        if crop.size:
            out[i] = cv2.resize(crop, (orig_shape[1], orig_shape[0]), interpolation=cv2.INTER_LINEAR) > 0
    return out


def process_mask_native(
    mask_coefs: jnp.ndarray,
    proto: jnp.ndarray,
    boxes: jnp.ndarray,
    img_shape: tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Like :func:`process_mask` but upsample-first then crop at native
    resolution (reference ops.py:499 process_mask_native) — avoids the
    low-res crop aliasing at box edges."""
    ih, iw = img_shape
    m = jax.nn.sigmoid(jnp.einsum("nk,hwk->nhw", mask_coefs, proto))
    m = jax.image.resize(m, (m.shape[0], ih, iw), method="bilinear")
    m = crop_mask(m, boxes)
    return m > threshold

"""Test-time augmentation and model ensembling for detect models.

Behavioral parity targets: reference nn/tasks.py:422-487 (_predict_augment /
_descale_pred / _clip_augmented: scales [1, 0.83, 0.67], flips
[none, lr, none], per-scale anchor-tail clipping) and nn/tasks.py:1238-1276
(Ensemble: anchor-axis concat of per-model decoded predictions, "nms
ensemble"). Layout differences from torch: NHWC images, anchor-major
(B, N, 4+nc) predictions, so the de-scale/de-flip ops act on the trailing
feature axis instead of dim 1.

Each (scale, flip) pair is its own jit specialization — three cached
compilations, amortized across the prediction stream.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

__all__ = ["scale_img", "predict_augment", "ensemble_predict"]


def scale_img(x: jnp.ndarray, ratio: float, gs: int = 32) -> jnp.ndarray:
    """Bilinear-resize a NHWC batch by ``ratio`` and pad to gs-multiples with
    the ImageNet-mean gray 0.447 (reference utils/torch_utils.py scale_img)."""
    import jax

    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    y = jax.image.resize(x, (b, nh, nw, c), method="bilinear")
    ph = math.ceil(nh / gs) * gs - nh
    pw = math.ceil(nw / gs) * gs - nw
    return jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=0.447)


def _descale(p: jnp.ndarray, flip_lr: bool, scale: float, img_w: int) -> jnp.ndarray:
    """Invert scale/flip on decoded (B, N, 4+nc) xywh preds (tasks.py:446-467)."""
    box, rest = p[..., :4], p[..., 4:]
    box = box / scale
    if flip_lr:
        box = jnp.concatenate(
            [img_w - box[..., 0:1], box[..., 1:2], box[..., 2:4]], axis=-1
        )
    return jnp.concatenate([box, rest], axis=-1)


def _clip_tails(ys: list[jnp.ndarray], nl: int = 3) -> list[jnp.ndarray]:
    """Drop the coarse-grid tail of the full-scale pass and the fine-grid head
    of the smallest pass (reference _clip_augmented, tasks.py:469-487).
    Anchor order is P3..P5, so the 'tail' lives at the END of axis 1."""
    g = sum(4**i for i in range(nl))
    i0 = (ys[0].shape[1] // g) * 1
    ys[0] = ys[0][:, :-i0]
    i2 = (ys[-1].shape[1] // g) * 4 ** (nl - 1)
    ys[-1] = ys[-1][:, i2:]
    return ys


def predict_augment(
    model,
    variables: dict,
    x: jnp.ndarray,
    gs: int = 32,
    scales: Sequence[float] = (1.0, 0.83, 0.67),
    flips: Sequence[bool] = (False, True, False),
) -> jnp.ndarray:
    """Multi-scale + flip inference, merged on the anchor axis for NMS.

    Args:
        model: a DetectionModel (detect task, non-end2end).
        variables: its params/batch_stats.
        x: (B, H, W, 3) float images in [0, 1].

    Returns:
        (B, N_total, 4+nc) merged decoded predictions.
    """
    img_w = x.shape[2]
    ys = []
    for s, f in zip(scales, flips):
        xi = x[:, :, ::-1, :] if f else x
        xi = scale_img(xi, s, gs)
        preds = model.apply(variables, xi, train=False)["preds"]
        ys.append(_descale(preds, f, s, img_w))
    ys = _clip_tails(ys, nl=3)
    return jnp.concatenate(ys, axis=1)


def ensemble_predict(members: Sequence[tuple], x: jnp.ndarray) -> jnp.ndarray:
    """"NMS ensemble": concat every member's decoded predictions on the
    anchor axis (reference Ensemble.forward, tasks.py:1260-1276); the shared
    NMS afterwards arbitrates across members.

    Args:
        members: sequence of (model, variables) pairs with a common nc.
        x: (B, H, W, 3) float images in [0, 1].
    """
    ys = [m.apply(v, x, train=False)["preds"] for m, v in members]
    nc = {y.shape[-1] for y in ys}
    assert len(nc) == 1, f"ensemble members disagree on output width: {nc}"
    return jnp.concatenate(ys, axis=1)

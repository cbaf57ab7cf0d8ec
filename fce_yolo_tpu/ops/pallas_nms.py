"""Pallas TPU kernel for greedy NMS suppression.

The XLA `lax.scan` formulation (ops/nms.py:_pick_suppress) pays per-step
scheduling overhead for max_det (300) tiny sequential steps — measured ~7 ms
per 32-image batch at K=1024 on v5e, ~16% of the e2e predict time. This
kernel runs the whole greedy loop VMEM-resident: the grid parallelizes over
images, each program keeps the (K,) score vector and (4, K) transposed boxes
in VMEM and does max_det argmax+suppress iterations at VPU latency with zero
dispatch overhead.

Keep-set and emit order are exactly torchvision-greedy (same as the scan
version): tested bit-identical in tests/test_pallas_nms.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pallas_pick_suppress"]


def _nms_kernel(boxes_ref, scores_ref, valid_ref, idx_ref, ok_ref, *, iou_thres, max_det):
    from jax.experimental import pallas as pl  # noqa: F401 (imported for clarity)

    k = scores_ref.shape[1]
    x1 = boxes_ref[0, 0, :]  # (K,)
    y1 = boxes_ref[0, 1, :]
    x2 = boxes_ref[0, 2, :]
    y2 = boxes_ref[0, 3, :]
    area = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    neg_inf = jnp.float32(-jnp.float32(jnp.inf))
    live0 = jnp.where(valid_ref[0, :] > 0, scores_ref[0, :], neg_inf)

    iota = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0).squeeze(-1)

    def step(t, carry):
        live, idx_acc, ok_acc = carry
        i = jnp.argmax(live).astype(jnp.int32)
        ok = live[i] > neg_inf
        # gather the picked box via one-hot reduction (vector-friendly)
        sel = (iota == i).astype(jnp.float32)
        bx1 = jnp.sum(sel * x1)
        by1 = jnp.sum(sel * y1)
        bx2 = jnp.sum(sel * x2)
        by2 = jnp.sum(sel * y2)
        barea = jnp.sum(sel * area)
        iw = jnp.clip(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0, None)
        ih = jnp.clip(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0, None)
        inter = iw * ih
        iou = inter / (barea + area - inter + 1e-7)
        kill = (iou > iou_thres) | (iota == i)
        live = jnp.where(ok & kill, neg_inf, live)
        idx_acc = jax.lax.dynamic_update_index_in_dim(idx_acc, i, t, 0)
        ok_acc = jax.lax.dynamic_update_index_in_dim(
            ok_acc, ok.astype(jnp.int32), t, 0
        )
        return live, idx_acc, ok_acc

    live, idx_acc, ok_acc = jax.lax.fori_loop(
        0,
        max_det,
        step,
        (live0, jnp.zeros((max_det,), jnp.int32), jnp.zeros((max_det,), jnp.int32)),
    )
    idx_ref[0, :] = idx_acc
    ok_ref[0, :] = ok_acc


@functools.partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def pallas_pick_suppress(
    boxes: jnp.ndarray,  # (B, K, 4) xyxy with class offsets applied
    scores: jnp.ndarray,  # (B, K)
    valid: jnp.ndarray,  # (B, K) bool
    iou_thres: float = 0.45,
    max_det: int = 300,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy NMS. Returns (idx (B, max_det) int32, ok (B, max_det) bool)."""
    from jax.experimental import pallas as pl

    b, k, _ = boxes.shape
    boxes_t = boxes.transpose(0, 2, 1).astype(jnp.float32)  # (B, 4, K): lanes = K
    scores = scores.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)

    kernel = functools.partial(_nms_kernel, iou_thres=float(iou_thres), max_det=int(max_det))
    idx, ok = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, max_det), lambda i: (i, 0)),
            pl.BlockSpec((1, max_det), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, max_det), jnp.int32),
            jax.ShapeDtypeStruct((b, max_det), jnp.int32),
        ],
        interpret=interpret,
    )(boxes_t, scores, valid_f)
    return idx, ok > 0

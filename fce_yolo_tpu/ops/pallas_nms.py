"""Pallas TPU kernel for greedy NMS suppression.

The XLA `lax.scan` formulation (ops/nms.py:_pick_suppress) vmapped over the
batch runs max_det tiny steps per image and cannot early-exit — measured
>100 ms for a 128-image batch at K=1024 on v5e (5x the whole backbone
forward). This kernel restructures the loop TPU-first:

- ONE grid program holds the whole batch's candidate set in VMEM
  ((B, K) score/coordinate planes — 128 x 1024 f32 is ~0.5 MB/plane).
- The greedy pick+suppress step is VECTORIZED ACROSS THE BATCH: per-row
  argmax -> one-hot gather of the picked boxes -> (B, K) IoU row ->
  suppression mask. The only sequential dimension is max_det (300), not
  batch x max_det (38,400) — a ~B-fold cut in serial work on a
  single-TensorCore chip.
- Early exit: a while_loop stops as soon as every image's candidate pool
  is exhausted, so typical trained-model batches (tens of detections) pay
  tens of steps, not 300.

Keep-set and emit order per image are exactly torchvision-greedy (same as
the scan version): tested in tests/test_pallas_nms.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pallas_pick_suppress"]


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, valid_ref, idx_ref, ok_ref,
                *, iou_thres, max_det):
    b, k = scores_ref.shape
    x1, y1, x2, y2 = x1_ref[:, :], y1_ref[:, :], x2_ref[:, :], y2_ref[:, :]
    area = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    neg_inf = jnp.float32(-jnp.float32(jnp.inf))
    live0 = jnp.where(valid_ref[:, :] > 0, scores_ref[:, :], neg_inf)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    iota_md = jax.lax.broadcasted_iota(jnp.int32, (b, max_det), 1)

    def cond(carry):
        t, live, _, _ = carry
        return (t < max_det) & (jnp.max(live) > neg_inf)

    def body(carry):
        t, live, idx_acc, ok_acc = carry
        i = jnp.argmax(live, axis=1).astype(jnp.int32)  # (B,)
        row_max = jnp.max(live, axis=1, keepdims=True)  # (B, 1)
        ok = row_max > neg_inf  # (B, 1)
        sel = (iota_k == i[:, None]).astype(jnp.float32)  # (B, K) one-hot
        g = lambda v: jnp.sum(sel * v, axis=1, keepdims=True)  # (B, 1)
        bx1, by1, bx2, by2, barea = g(x1), g(y1), g(x2), g(y2), g(area)
        iw = jnp.clip(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0, None)
        ih = jnp.clip(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0, None)
        inter = iw * ih
        iou = inter / (barea + area - inter + 1e-7)
        kill = (iou > iou_thres) | (iota_k == i[:, None])
        live = jnp.where(ok & kill, neg_inf, live)
        at_t = iota_md == t
        idx_acc = jnp.where(at_t, i[:, None], idx_acc)
        ok_acc = jnp.where(at_t & ok, 1, ok_acc)
        return t + 1, live, idx_acc, ok_acc

    _, live, idx_acc, ok_acc = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            live0,
            jnp.zeros((b, max_det), jnp.int32),
            jnp.zeros((b, max_det), jnp.int32),
        ),
    )
    idx_ref[:, :] = idx_acc
    ok_ref[:, :] = ok_acc


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
    from jax.experimental.pallas import tpu as pltpu

    b, k, _ = boxes.shape
    planes = [boxes[..., i].astype(jnp.float32) for i in range(4)]  # 4 x (B, K)
    scores = scores.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)

    kernel = functools.partial(_nms_kernel, iou_thres=float(iou_thres), max_det=int(max_det))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM) if not interpret else pl.BlockSpec(memory_space=None)
    kw = {}
    if not interpret:
        kw["in_specs"] = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        kw["out_specs"] = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    idx, ok = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, max_det), jnp.int32),
            jax.ShapeDtypeStruct((b, max_det), jnp.int32),
        ],
        interpret=interpret,
        **kw,
    )(*planes, scores, valid_f)
    return idx, ok > 0

"""YOLO-World open-vocabulary modules.

Behavioral parity targets: reference nn/modules/block.py:566-820
(MaxSigmoidAttnBlock, C2fAttn, ImagePoolingAttn, ContrastiveHead,
BNContrastiveHead) and nn/modules/head.py:440-490 (WorldDetect). The blocks
are ordinary tensor programs — they need no CLIP weights — so they import
torch checkpoints and parity-test like any other module. Only the TEXT
ENCODER producing ``txt_feats`` requires pretrained CLIP (impossible
offline); see nn/text_model.py for the offline stub encoder.

Text-conditioned modules take ``(x, text)``; the graph executor
(nn/model.py) threads ``txt_feats`` through them the way the reference
WorldModel.predict does (nn/tasks.py:896-940): C2fAttn sees the running
(ImagePoolingAttn-enhanced) embeddings, WorldDetect sees the originals.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fce_yolo_tpu.nn.modules import (
    BN_EPS,
    BN_MOMENTUM,
    Bottleneck,
    Conv2d,
    ConvBNAct,
)
from fce_yolo_tpu.ops.anchors import dfl_expectation, dist2bbox, make_anchors

__all__ = [
    "MaxSigmoidAttnBlock", "C2fAttn", "ImagePoolingAttn",
    "ContrastiveHead", "BNContrastiveHead", "WorldDetect",
]


class MaxSigmoidAttnBlock(nn.Module):
    """Max-sigmoid guided attention (reference block.py:566-615): per-head
    image/text similarity, max over text tokens, sigmoid-gated projection."""

    c1: int
    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = x.shape
        hc = self.c2 // self.nh
        guide_e = nn.Dense(self.ec, name="gl")(guide)  # (B, K, ec)
        guide_e = guide_e.reshape(b, -1, self.nh, hc)
        embed = x if self.c1 == self.ec else ConvBNAct(self.ec, 1, act=False, name="ec")(x, train)
        embed = embed.reshape(b, h, w, self.nh, hc)
        aw = jnp.einsum("bhwmc,bnmc->bmhwn", embed, guide_e)
        aw = jnp.max(aw, axis=-1) / (hc**0.5)  # (B, nh, H, W)
        aw = aw + self.param("bias", nn.initializers.zeros, (self.nh,))[None, :, None, None]
        aw = jax.nn.sigmoid(aw)
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones, (1, self.nh, 1, 1))
        y = ConvBNAct(self.c2, 3, 1, act=False, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * aw.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(b, h, w, self.c2)


class C2fAttn(nn.Module):
    """C2f with a guided-attention tail branch (reference block.py:617-681)."""

    c1: int
    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(
                    ys[-1], train
                )
            )
        ys.append(
            MaxSigmoidAttnBlock(c, c, nh=self.nh, ec=self.ec, gc=self.gc, name="attn")(
                ys[-1], guide, train
            )
        )
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


def _adaptive_max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch AdaptiveMaxPool2d((k, k)) on NHWC: bin edges floor/ceil."""
    b, h, w, c = x.shape
    rows = []
    for i in range(k):
        y0, y1 = (i * h) // k, -(-((i + 1) * h) // k)
        cols = []
        for j in range(k):
            x0, x1 = (j * w) // k, -(-((j + 1) * w) // k)
            cols.append(jnp.max(x[:, y0:y1, x0:x1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, k, k, C)


class ImagePoolingAttn(nn.Module):
    """Image-aware text-embedding enhancement (reference block.py:683-748):
    text queries attend over k*k-pooled multi-level image patches."""

    ec: int
    ch: tuple[int, ...]
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], text: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = xs[0].shape[0]
        patches = []
        for i, x in enumerate(xs):
            p = Conv2d(self.ec, 1, name=f"projections_{i}")(x)
            patches.append(_adaptive_max_pool(p, self.k).reshape(b, self.k * self.k, self.ec))
        img = jnp.concatenate(patches, axis=1)  # (B, nf*k*k, ec)

        q = nn.LayerNorm(name="query_0")(text)
        q = nn.Dense(self.ec, name="query_1")(q)
        kk = nn.LayerNorm(name="key_0")(img)
        kk = nn.Dense(self.ec, name="key_1")(kk)
        v = nn.LayerNorm(name="value_0")(img)
        v = nn.Dense(self.ec, name="value_1")(v)

        hc = self.ec // self.nh
        q = q.reshape(b, -1, self.nh, hc)
        kk = kk.reshape(b, -1, self.nh, hc)
        v = v.reshape(b, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, kk) / (hc**0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(b, -1, self.ec)
        out = nn.Dense(self.ct, name="proj")(out)
        s = self.param("scale", nn.initializers.zeros, (1,)) if self.scale else 1.0
        return out * s + text


class ContrastiveHead(nn.Module):
    """Region-text similarity with l2 normalization (reference block.py:751-785)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bias = self.param("bias", lambda k: jnp.full((1,), -10.0))
        logit_scale = self.param("logit_scale", lambda k: jnp.full((), math.log(1 / 0.07)))
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """Contrastive head normalizing image features with BatchNorm instead of
    l2 (reference block.py:788-820; the worldv2 variant)."""

    embed_dims: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bias = self.param("bias", lambda k: jnp.full((1,), -10.0))
        logit_scale = self.param("logit_scale", lambda k: jnp.full((), -1.0))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="norm"
        )(x)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return sim * jnp.exp(logit_scale) + bias


class WorldDetect(nn.Module):
    """Detect head scoring classes by text-embedding similarity (reference
    head.py:440-505). Box branch = Detect cv2; cls branch = cv3 embedding
    convs -> cv4 contrastive head against ``text``."""

    nc: int
    ch: Sequence[int]
    embed: int = 512
    with_bn: bool = False
    reg_max: int = 16
    strides: Sequence[int] | None = None
    export: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], text: jnp.ndarray, train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        feats = []
        for i, x in enumerate(xs):
            box = ConvBNAct(c2, 3, name=f"cv2_{i}_0")(x, train)
            box = ConvBNAct(c2, 3, name=f"cv2_{i}_1")(box, train)
            box = Conv2d(4 * self.reg_max, 1, name=f"cv2_{i}_2")(box)
            emb = ConvBNAct(c3, 3, name=f"cv3_{i}_0")(x, train)
            emb = ConvBNAct(c3, 3, name=f"cv3_{i}_1")(emb, train)
            emb = Conv2d(self.embed, 1, name=f"cv3_{i}_2")(emb)
            head = (
                BNContrastiveHead(self.embed, name=f"cv4_{i}")
                if self.with_bn
                else ContrastiveHead(name=f"cv4_{i}")
            )
            cls = head(emb, text, train)
            feats.append(jnp.concatenate([box, cls], axis=-1))
        if train:
            return {"feats": feats}

        assert self.strides is not None
        nc = feats[0].shape[-1] - 4 * self.reg_max  # may differ from self.nc at inference
        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1)
        box_logits, cls_logits = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, list(self.strides), 0.5, dtype=jnp.float32)
        dist = dfl_expectation(box_logits.astype(jnp.float32), self.reg_max)
        dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
        preds = jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)
        if self.export:
            return {"preds": preds}
        return {"preds": preds, "feats": feats}

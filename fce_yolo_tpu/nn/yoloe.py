"""YOLOE prompt-based detection modules.

Behavioral parity targets: reference nn/modules/block.py:1847-1947
(SwiGLUFFN, Residual, SAVPE) and nn/modules/head.py:560-812 (YOLOEDetect,
YOLOESegment). YOLOE scores classes against prompt embeddings: text prompts
run through a zero-init SwiGLU residual adapter (get_tpe), visual prompts
(binary masks over the P3 grid) through SAVPE (get_vpe). The LRPC
prompt-free fused path (head.py:684-721) is an inference-time weight-fusion
optimization and is not re-implemented — XLA already folds the contrastive
matmul at compile time.

Like YOLO-World, the blocks are plain tensor programs needing no pretrained
CLIP — only the text ENCODER is environment-gated (nn/text_model.py stub).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fce_yolo_tpu.nn.heads import Proto
from fce_yolo_tpu.nn.modules import Conv2d, ConvBNAct, DWConvBNAct
from fce_yolo_tpu.nn.world import BNContrastiveHead, ContrastiveHead
from fce_yolo_tpu.ops.anchors import dfl_expectation, dist2bbox, make_anchors

__all__ = ["SwiGLUFFN", "Residual", "SAVPE", "YOLOEDetect", "YOLOESegment"]


class SwiGLUFFN(nn.Module):
    """SwiGLU feed-forward (reference block.py:1847-1868)."""

    gc: int
    ec: int
    e: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x12 = nn.Dense(self.e * self.ec, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.ec, name="w3", kernel_init=nn.initializers.zeros)(
            nn.silu(x1) * x2
        )


class Residual(nn.Module):
    """Residual SwiGLU adapter, zero-init so it starts as identity
    (reference block.py:1870-1890)."""

    gc: int
    ec: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return x + SwiGLUFFN(self.gc, self.ec, name="m")(x, train)


class SAVPE(nn.Module):
    """Spatial-aware visual prompt embedding (reference block.py:1892-1947):
    per-query attention over the P3 grid, masked to the prompt's support,
    aggregating 16-way-split embedding channels."""

    ch: Sequence[int]
    c3: int
    embed: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], vp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = 16
        emb, score_feats = [], []
        for i, x in enumerate(xs):
            e = ConvBNAct(self.c3, 3, name=f"cv1_{i}_0")(x, train)
            e = ConvBNAct(self.c3, 3, name=f"cv1_{i}_1")(e, train)
            s = ConvBNAct(self.c3, 1, name=f"cv2_{i}_0")(x, train)
            if i in (1, 2):
                up = 2 * i
                e = jnp.repeat(jnp.repeat(e, up, axis=1), up, axis=2)
                s = jnp.repeat(jnp.repeat(s, up, axis=1), up, axis=2)
            emb.append(e)
            score_feats.append(s)
        x_cat = Conv2d(self.embed, 1, name="cv3")(jnp.concatenate(emb, axis=-1))
        y = Conv2d(c, 3, p=1, name="cv4")(jnp.concatenate(score_feats, axis=-1))

        b, h, w, _ = x_cat.shape
        q = vp.shape[1]
        vp_ = vp.reshape(b * q, h, w, 1).astype(y.dtype)
        y_ = jnp.broadcast_to(y[:, None], (b, q, h, w, c)).reshape(b * q, h, w, c)
        z = jnp.concatenate([y_, Conv2d(c, 3, p=1, name="cv5")(vp_)], axis=-1)
        z = ConvBNAct(c, 3, name="cv6_0")(z, train)
        z = Conv2d(c, 3, p=1, name="cv6_1")(z)

        z = z.reshape(b, q, h * w, c).transpose(0, 1, 3, 2)  # (B, Q, c, HW)
        vpm = vp.reshape(b, q, 1, h * w)
        score = jnp.where(vpm > 0, z * vpm, jnp.finfo(z.dtype).min)
        score = jax.nn.softmax(score, axis=-1)
        xk = x_cat.reshape(b, h * w, c, self.embed // c)  # channel split: 16 groups
        # (B, Q, c, HW) @ (B, HW, c, E/c) -> (B, Q, c, E/c)
        agg = jnp.einsum("bqcn,bncd->bqcd", score, xk)
        out = agg.reshape(b, q, self.embed)
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


class YOLOEDetect(nn.Module):
    """Prompt-embedding detect head (reference head.py:560-744).

    ``__call__(xs, txt_feats)``: text prompts -> reprta adapter -> l2 norm ->
    contrastive scores (get_tpe + forward). Pass ``visual_prompts`` (B, Q,
    H3, W3) binary masks to score against SAVPE visual embeddings instead.
    """

    nc: int
    ch: Sequence[int]
    embed: int = 512
    with_bn: bool = True
    reg_max: int = 16
    strides: Sequence[int] | None = None
    export: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], txt_feats: jnp.ndarray,
                 train: bool = False, visual_prompts: jnp.ndarray | None = None):
        c3 = max(self.ch[0], min(self.nc, 100))
        b = xs[0].shape[0]

        # prompt embeddings (get_tpe / get_vpe, head.py:672-683)
        tpe = Residual(self.embed, self.embed, name="reprta")(txt_feats, train)
        tpe = tpe / jnp.maximum(jnp.linalg.norm(tpe, axis=-1, keepdims=True), 1e-12)
        savpe = SAVPE(tuple(self.ch), c3, self.embed, name="savpe")
        if visual_prompts is not None:
            cls_pe = savpe(xs, visual_prompts, train)
        else:
            # trace SAVPE with a dummy single-query prompt so its params
            # exist for weight import; XLA dead-code-eliminates the branch
            dummy = jnp.ones((b, 1, xs[0].shape[1], xs[0].shape[2]), xs[0].dtype)
            _ = savpe(xs, dummy, train)
            cls_pe = tpe

        feats = []
        for i, x in enumerate(xs):
            box = ConvBNAct(max(16, self.ch[0] // 4, self.reg_max * 4), 3, name=f"cv2_{i}_0")(x, train)
            box = ConvBNAct(max(16, self.ch[0] // 4, self.reg_max * 4), 3, name=f"cv2_{i}_1")(box, train)
            box = Conv2d(4 * self.reg_max, 1, name=f"cv2_{i}_2")(box)
            emb = DWConvBNAct.make(self.ch[i], self.ch[i], 3, name=f"cv3_{i}_0_0")(x, train)
            emb = ConvBNAct(c3, 1, name=f"cv3_{i}_0_1")(emb, train)
            emb = DWConvBNAct.make(c3, c3, 3, name=f"cv3_{i}_1_0")(emb, train)
            emb = ConvBNAct(c3, 1, name=f"cv3_{i}_1_1")(emb, train)
            emb = Conv2d(self.embed, 1, name=f"cv3_{i}_2")(emb)
            head = (
                BNContrastiveHead(self.embed, name=f"cv4_{i}")
                if self.with_bn
                else ContrastiveHead(name=f"cv4_{i}")
            )
            cls = head(emb, cls_pe, train)
            feats.append(jnp.concatenate([box, cls], axis=-1))
        if train:
            return {"feats": feats}

        assert self.strides is not None
        nc = feats[0].shape[-1] - 4 * self.reg_max
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


class YOLOESegment(nn.Module):
    """YOLOE instance segmentation head (reference head.py:746-812):
    YOLOEDetect + Proto masks + per-level coefficient branch cv5."""

    nc: int
    ch: Sequence[int]
    nm: int = 32
    npr: int = 256
    embed: int = 512
    with_bn: bool = True
    reg_max: int = 16
    strides: Sequence[int] | None = None
    export: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], txt_feats: jnp.ndarray,
                 train: bool = False, visual_prompts: jnp.ndarray | None = None):
        proto = Proto(self.npr, self.nm, name="proto")(xs[0], train)
        b = xs[0].shape[0]
        c5 = max(self.ch[0] // 4, self.nm)
        mcs = []
        for i, x in enumerate(xs):
            m = ConvBNAct(c5, 3, name=f"cv5_{i}_0")(x, train)
            m = ConvBNAct(c5, 3, name=f"cv5_{i}_1")(m, train)
            m = Conv2d(self.nm, 1, name=f"cv5_{i}_2")(m)
            mcs.append(m.reshape(b, -1, self.nm))
        mc = jnp.concatenate(mcs, axis=1)  # (B, A, nm)

        det = YOLOEDetect(
            nc=self.nc, ch=self.ch, embed=self.embed, with_bn=self.with_bn,
            reg_max=self.reg_max, strides=self.strides, export=self.export,
            name="detect",
        )
        out = det(list(xs), txt_feats, train, visual_prompts)
        if train:
            out["mask_coefs"] = mc
            out["proto"] = proto
            return out
        preds = jnp.concatenate([out["preds"], mc], axis=-1)
        res = {"preds": preds, "proto": proto}
        if not self.export:
            res["feats"] = out["feats"]
        return res

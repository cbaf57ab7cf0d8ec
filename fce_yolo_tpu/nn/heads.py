"""Task heads beyond detect: Segment / OBB / Pose / Classify (+ Proto).

Behavioral parity targets: reference nn/modules/head.py:215-438 (Segment,
OBB, Pose, Classify) and block.py:83-104 (Proto). Same TPU conventions as
the Detect head (nn/modules.py): NHWC, anchor-major eval outputs, static
decode with constant-folded anchors, torch-compatible submodule naming for
the weight importer (cv4_{i}_{j}, proto/cv1...).

Eval output layouts (anchor-major, trailing feature axis):
- Segment: preds (B, A, 4+nc+nm), proto (B, 4*H3? strictly (B, Hp, Wp, nm))
- OBB:     preds (B, A, 4+nc+1) — rotated cx,cy,w,h + scores + angle
- Pose:    preds (B, A, 4+nc+nk) — decoded keypoints appended
- Classify: probs (B, nc) + logits
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fce_yolo_tpu.nn.modules import Conv2d, ConvBNAct, Detect
from fce_yolo_tpu.ops.anchors import dfl_expectation, dist2bbox, dist2rbox, make_anchors

__all__ = ["Proto", "Segment", "OBB", "Pose", "Classify"]


class Proto(nn.Module):
    """Mask prototype generator (reference block.py:83-104).

    cv1(3x3) -> 2x ConvTranspose upsample -> cv2(3x3) -> cv3(1x1) => nm protos
    at 2x the P3 resolution.
    """

    c_: int = 256
    c2: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNAct(self.c_, 3, name="cv1")(x, train)
        x = nn.ConvTranspose(
            features=self.c_, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
            use_bias=True, name="upsample",
        )(x)
        x = ConvBNAct(self.c_, 3, name="cv2")(x, train)
        return ConvBNAct(self.c2, 1, name="cv3")(x, train)


def _branch4(x, c4: int, out_ch: int, i: int, train: bool):
    """cv4 pattern shared by Segment/OBB/Pose: Conv3x3 -> Conv3x3 -> 1x1."""
    y = ConvBNAct(c4, 3, name=f"cv4_{i}_0")(x, train)
    y = ConvBNAct(c4, 3, name=f"cv4_{i}_1")(y, train)
    return Conv2d(out_ch, 1, name=f"cv4_{i}_2")(y)


class Segment(nn.Module):
    """Instance-segmentation head = Detect + mask coefficients + Proto
    (reference head.py:215-263)."""

    nc: int
    ch: tuple[int, ...]
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    strides: tuple[int, ...] | None = None
    export: bool = False
    legacy: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        b = xs[0].shape[0]
        proto = Proto(self.npr, self.nm, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        mc = [
            _branch4(x, c4, self.nm, i, train).reshape(b, -1, self.nm)
            for i, x in enumerate(xs)
        ]
        mc = jnp.concatenate(mc, axis=1)  # (B, A, nm)
        det = Detect(
            self.nc, self.ch, self.reg_max, self.strides, legacy=self.legacy,
            export=self.export, name="detect"
        )(xs, train)
        if train:
            return {"feats": det["feats"], "mask_coefs": mc, "proto": proto}
        preds = jnp.concatenate([det["preds"], mc.astype(det["preds"].dtype)], axis=-1)
        out = {"preds": preds, "proto": proto}
        if not self.export:
            out["feats"] = det["feats"]
        return out


class OBB(nn.Module):
    """Oriented-box head = Detect + per-anchor angle (reference head.py:265-318).

    angle = (sigmoid(theta) - 0.25) * pi in [-pi/4, 3pi/4]; eval boxes are
    rotated (cx, cy, w, h) decoded via dist2rbox.
    """

    nc: int
    ch: tuple[int, ...]
    ne: int = 1
    reg_max: int = 16
    strides: tuple[int, ...] | None = None
    export: bool = False
    legacy: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        b = xs[0].shape[0]
        c4 = max(self.ch[0] // 4, self.ne)
        ang = [
            _branch4(x, c4, self.ne, i, train).reshape(b, -1, self.ne)
            for i, x in enumerate(xs)
        ]
        angle = (jax.nn.sigmoid(jnp.concatenate(ang, 1)) - 0.25) * math.pi  # (B, A, ne)

        # detect conv trunk; its axis-aligned decode is unused here and XLA
        # dead-code-eliminates it — the rotated decode below replaces it
        det = Detect(self.nc, self.ch, self.reg_max, self.strides, legacy=self.legacy,
                     export=False, name="detect")(xs, train)
        feats = det["feats"]
        if train:
            return {"feats": feats, "angle": angle}

        no = self.nc + self.reg_max * 4
        flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
        box_logits, cls_logits = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, list(self.strides), 0.5, dtype=jnp.float32)
        dist = dfl_expectation(box_logits.astype(jnp.float32), self.reg_max)
        rbox = dist2rbox(dist, angle.astype(jnp.float32), anchors[None]) * stride_t[None]
        preds = jnp.concatenate(
            [rbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32)), angle], axis=-1
        )
        out = {"preds": preds, "angle": angle}
        if not self.export:
            out["feats"] = feats
        return out


class Pose(nn.Module):
    """Keypoint head = Detect + decoded keypoints (reference head.py:319-386)."""

    nc: int
    ch: tuple[int, ...]
    kpt_shape: tuple[int, int] = (17, 3)
    reg_max: int = 16
    strides: tuple[int, ...] | None = None
    export: bool = False
    legacy: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        b = xs[0].shape[0]
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpt = [
            _branch4(x, c4, nk, i, train).reshape(b, -1, nk) for i, x in enumerate(xs)
        ]
        kpt = jnp.concatenate(kpt, axis=1)  # (B, A, nk) raw
        det = Detect(
            self.nc, self.ch, self.reg_max, self.strides, legacy=self.legacy,
            export=self.export, name="detect"
        )(xs, train)
        if train:
            return {"feats": det["feats"], "kpts": kpt}

        shapes = [(f.shape[1], f.shape[2]) for f in det["feats"]]
        anchors, stride_t = make_anchors(shapes, list(self.strides), 0.5, dtype=jnp.float32)
        decoded = self.kpts_decode(kpt.astype(jnp.float32), anchors, stride_t)
        preds = jnp.concatenate([det["preds"], decoded], axis=-1)
        out = {"preds": preds, "kpts": kpt}
        if not self.export:
            out["feats"] = det["feats"]
        return out

    def kpts_decode(self, kpts: jnp.ndarray, anchors: jnp.ndarray, stride_t: jnp.ndarray) -> jnp.ndarray:
        """x,y = (raw*2 + anchor - 0.5) * stride; visibility sigmoid
        (reference head.py:366-386)."""
        nkp, ndim = self.kpt_shape
        b, a, _ = kpts.shape
        y = kpts.reshape(b, a, nkp, ndim)
        xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
        if ndim == 3:
            vis = jax.nn.sigmoid(y[..., 2:3])
            y = jnp.concatenate([xy, vis], axis=-1)
        else:
            y = xy
        return y.reshape(b, a, nkp * ndim)


class Classify(nn.Module):
    """Image classification head (reference head.py:387-438):
    Conv(c_=1280) -> global avg pool -> linear -> probs."""

    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        c_ = 1280
        x = ConvBNAct(c_, self.k, self.s, name="conv")(x, train)
        x = x.mean(axis=(1, 2))  # adaptive avg pool to (B, c_)
        logits = nn.Dense(self.c2, name="linear")(x)
        if train:
            return {"logits": logits}
        return {"probs": jax.nn.softmax(logits, axis=-1), "logits": logits}


class RTDETRDecoder(nn.Module):
    """Real-Time Deformable Transformer Decoder head (reference
    nn/modules/head.py:812-1133).

    Query selection over encoder scores, iterative box refinement through
    ``ndl`` deformable decoder layers, per-layer aux heads for training.
    Anchors are trace-time numpy constants (static shapes), the decoder loop
    unrolls at trace time — one fused XLA graph, no dynamic shape anywhere.

    Inputs are the NHWC P3/P4/P5 maps; outputs:
      train=True  -> {"dec_bboxes" (ndl,B,nq,4) sigmoid-xywh [0,1],
                      "dec_scores" (ndl,B,nq,nc) logits,
                      "enc_bboxes" (B,nq,4), "enc_scores" (B,nq,nc),
                      "dn_meta": None}  (+ cdn queries when batch given)
      train=False -> {"preds": (B, nq, 4+nc) xywh [0,1] + sigmoid scores}
    """

    nc: int = 80
    ch: Sequence[int] = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    eval_idx: int = -1
    learnt_init_query: bool = False
    strides: Sequence[int] | None = None  # unused (anchor-free); parser symmetry
    export: bool = False
    legacy: bool = False

    @staticmethod
    def generate_anchors(shapes, grid_size: float = 0.05, eps: float = 1e-2):
        """Static anchor logits + validity (reference head.py:986-1023)."""
        import numpy as np

        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32), indexing="ij")
            xy = (np.stack([gx, gy], -1) + 0.5) / np.asarray([w, h], np.float32)
            wh = np.ones_like(xy) * grid_size * (2.0 ** i)
            anchors.append(np.concatenate([xy, wh], -1).reshape(h * w, 4))
        a = np.concatenate(anchors, 0)  # (LV, 4)
        valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)  # (LV, 1)
        a = np.log(a / (1 - a))
        a = np.where(valid, a, np.inf)
        return jnp.asarray(a)[None], jnp.asarray(valid.astype(np.float32))[None]

    @nn.compact
    def __call__(self, x: list[jnp.ndarray], train: bool = False,
                 dn_cls=None, dn_bbox=None, attn_mask=None):
        from fce_yolo_tpu.nn.transformer import (
            MLP, DeformableTransformerDecoderLayer, inverse_sigmoid,
        )

        b = x[0].shape[0]
        nl = len(self.ch)
        # --- encoder input: 1x1 proj + BN per level (input_proj.i.{0,1}) ---
        feats, shapes = [], []
        for i, xi in enumerate(x):
            p = Conv2d(c2=self.hd, k=1, use_bias=False, name=f"input_proj_{i}_0")(xi)
            p = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"input_proj_{i}_1")(p)
            h, w = p.shape[1:3]
            shapes.append((h, w))
            feats.append(p.reshape(b, h * w, self.hd))
        feats = jnp.concatenate(feats, axis=1)  # (B, LV, hd)

        anchors, valid_mask = self.generate_anchors(shapes)
        anchors = anchors.astype(feats.dtype)

        # --- encoder head + query selection (head.py:1052-1110) ---
        f = nn.Dense(self.hd, name="enc_output_0")(valid_mask * feats)
        f = nn.LayerNorm(name="enc_output_1")(f)
        enc_scores_all = nn.Dense(self.nc, name="enc_score_head")(f)  # (B, LV, nc)

        nq = min(self.nq, feats.shape[1])  # tiny probe inputs: LV < num_queries
        _, topk_ind = jax.lax.top_k(enc_scores_all.max(-1), nq)  # (B, nq)
        tk = lambda t: jnp.take_along_axis(t, topk_ind[..., None], axis=1)
        top_feats = tk(f)  # (B, nq, hd)
        top_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (b, anchors.shape[1], 4)), topk_ind[..., None], axis=1
        )

        refer = MLP(self.hd, 4, num_layers=3, name="enc_bbox_head")(top_feats) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer)
        enc_scores = tk(enc_scores_all)

        embed = top_feats
        if self.learnt_init_query:
            tgt = self.param("tgt_embed", nn.initializers.xavier_uniform(), (self.nq, self.hd))
            embed = jnp.broadcast_to(tgt[None, :nq], (b, nq, self.hd))
        if train:
            refer = jax.lax.stop_gradient(refer)
            if not self.learnt_init_query:
                embed = jax.lax.stop_gradient(embed)
        # denoising class embedding table: declared unconditionally so weight
        # import and the cdn path share one tree
        dn_table = self.param("denoising_class_embed",
                              nn.initializers.normal(1.0), (self.nc, self.hd))
        # contrastive-denoising queries prepend (models/utils/ops.get_cdn_group:
        # padding_cls = class_embed[dn_cls], zeros at padded slots, ops.py:280-289)
        if dn_bbox is not None:
            valid = (dn_cls >= 0)[..., None]
            dn_embed = jnp.where(
                valid, dn_table[jnp.clip(dn_cls, 0, self.nc - 1)], 0.0
            ).astype(embed.dtype)
            refer = jnp.concatenate([dn_bbox.astype(refer.dtype), refer], axis=1)
            embed = jnp.concatenate([dn_embed, embed], axis=1)

        # --- decoder with iterative refinement (transformer.py:712-793) ---
        pos_mlp = MLP(2 * self.hd, self.hd, num_layers=2, name="query_pos_head")
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx
        refer_sig = jax.nn.sigmoid(refer)
        output = embed
        dec_bboxes, dec_scores = [], []
        last_refined = None
        for i in range(self.ndl):
            layer = DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, nl, self.ndp, name=f"decoder_layers_{i}"
            )
            output = layer(output, refer_sig, feats, shapes, attn_mask, pos_mlp(refer_sig))
            bbox = MLP(self.hd, 4, num_layers=3, name=f"dec_bbox_head_{i}")(output)
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer_sig))
            if train:
                dec_scores.append(nn.Dense(self.nc, name=f"dec_score_head_{i}")(output))
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined)))
            elif i == eval_idx:
                dec_scores.append(nn.Dense(self.nc, name=f"dec_score_head_{i}")(output))
                dec_bboxes.append(refined)
                break
            last_refined = refined
            refer_sig = jax.lax.stop_gradient(refined) if train else refined

        dec_bboxes = jnp.stack(dec_bboxes)  # (ndl|1, B, nq(+dn), 4)
        dec_scores = jnp.stack(dec_scores)
        if train:
            return {
                "dec_bboxes": dec_bboxes, "dec_scores": dec_scores,
                "enc_bboxes": enc_bboxes, "enc_scores": enc_scores,
            }
        preds = jnp.concatenate([dec_bboxes[0], jax.nn.sigmoid(dec_scores[0])], -1)
        return {"preds": preds}


class V10Detect(nn.Module):
    """YOLOv10 NMS-free dual-assignment head (reference head.py:1134-1183 +
    Detect.forward_end2end head.py:122-148).

    Two parallel head sets: one2many (cv2/cv3, trained with topk-10 TAL) and
    one2one (one2one_cv2/one2one_cv3, trained with topk-1 TAL on detached
    features). The cls branch is the v10 "light" head: per-level
    Sequential(Sequential(DW 3x3, 1x1), Sequential(DW 3x3, 1x1), 1x1).

    Train output: {"feats": one2many, "one2one_feats": one2one}.
    Eval output: {"preds6": (B, max_det, 6) xyxy+score+cls — topk selected,
    NO NMS (reference Detect.postprocess head.py:191-212)} plus raw feats.
    """

    nc: int
    ch: Sequence[int]
    reg_max: int = 16
    strides: Sequence[int] | None = None
    max_det: int = 300
    export: bool = False

    def _branches(self, xs, prefix: str, train: bool):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        feats = []
        for i, x in enumerate(xs):
            box = ConvBNAct(c2, 3, name=f"{prefix}cv2_{i}_0")(x, train)
            box = ConvBNAct(c2, 3, name=f"{prefix}cv2_{i}_1")(box, train)
            box = Conv2d(4 * self.reg_max, 1, name=f"{prefix}cv2_{i}_2")(box)
            cls = ConvBNAct(self.ch[i], 3, g=self.ch[i], name=f"{prefix}cv3_{i}_0_0")(x, train)
            cls = ConvBNAct(c3, 1, name=f"{prefix}cv3_{i}_0_1")(cls, train)
            cls = ConvBNAct(c3, 3, g=c3, name=f"{prefix}cv3_{i}_1_0")(cls, train)
            cls = ConvBNAct(c3, 1, name=f"{prefix}cv3_{i}_1_1")(cls, train)
            cls = Conv2d(self.nc, 1, name=f"{prefix}cv3_{i}_2")(cls)
            feats.append(jnp.concatenate([box, cls], axis=-1))
        return feats

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        one2many = self._branches(xs, "", train)
        xs_det = [jax.lax.stop_gradient(x) for x in xs]
        one2one = self._branches(xs_det, "one2one_", train)
        if train:
            return {"feats": one2many, "one2one_feats": one2one}

        assert self.strides is not None
        no = self.nc + self.reg_max * 4
        b = one2one[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, no) for f in one2one], axis=1)
        box_logits, cls_logits = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        shapes = [(f.shape[1], f.shape[2]) for f in one2one]
        anchors, stride_t = make_anchors(shapes, list(self.strides), 0.5, dtype=jnp.float32)
        dist = dfl_expectation(box_logits.astype(jnp.float32), self.reg_max)
        # end2end decodes xyxy, not xywh (reference decode_bboxes head.py:184-190)
        dbox = dist2bbox(dist, anchors[None], xywh=False) * stride_t[None]
        scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

        # Detect.postprocess topk selection (head.py:191-212), static shapes
        k = min(self.max_det, dbox.shape[1])
        best = jnp.max(scores, axis=-1)
        _, idx = jax.lax.top_k(best, k)  # (B, k) anchor ids
        boxes_k = jnp.take_along_axis(dbox, idx[..., None], axis=1)
        scores_k = jnp.take_along_axis(scores, idx[..., None], axis=1)
        flat_scores = scores_k.reshape(b, -1)  # (B, k*nc)
        top_scores, flat_idx = jax.lax.top_k(flat_scores, k)
        sel_anchor = flat_idx // self.nc
        sel_cls = (flat_idx % self.nc).astype(jnp.float32)
        sel_boxes = jnp.take_along_axis(boxes_k, sel_anchor[..., None], axis=1)
        preds6 = jnp.concatenate(
            [sel_boxes, top_scores[..., None], sel_cls[..., None]], axis=-1
        )
        out = {"preds6": preds6}
        if not self.export:
            out["feats"] = one2many
            out["one2one_feats"] = one2one
        return out

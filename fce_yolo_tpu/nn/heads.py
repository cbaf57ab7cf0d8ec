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

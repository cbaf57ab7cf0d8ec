"""Stock YOLO11 module zoo, re-designed for TPU in NHWC flax.linen.

Behavioral parity targets (architecture, channel math, activation placement)
are the reference's nn/modules/{conv,block,head}.py — cited per class. The
implementations are TPU-idiomatic: NHWC layout (feeds the MXU's native conv
layout), explicit symmetric padding matching torch's ``autopad`` so imported
weights reproduce activations bit-for-bit, and static-shape decode in the
Detect head (anchors constant-fold at trace time; no grid caching).

BatchNorm follows the reference's init (eps=1e-3, momentum=0.03 torch
convention => flax momentum 0.97; reference utils/torch_utils.py:463-473).
Under ``jit`` over a sharded batch the BN reduction becomes a global-batch
(sync) reduction via XLA collectives — strictly more accurate than the
reference's per-replica DDP stats.

Naming convention: submodule names mirror the torch attribute paths
(``cv1``, ``m_0`` for ``m.0`` ...) so the .pt weight importer is a pure
name-mapping (see nn/import_torch.py).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fce_yolo_tpu.ops.anchors import dfl_expectation, dist2bbox, make_anchors

# Torch BatchNorm2d momentum 0.03 == flax momentum (running-average decay) 0.97.
BN_MOMENTUM = 0.97
BN_EPS = 1e-3


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels (reference conv.py:30-36)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU — the reference's ``Conv`` (conv.py:39-91).

    NHWC; explicit symmetric padding (matches torch, unlike XLA 'SAME' which
    pads asymmetrically for stride 2). At inference BN folds into a scale+
    shift that XLA fuses into the convolution epilogue, so no separate
    "fused" module is needed (reference forward_fuse, conv.py:81-91).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn"
        )(x)
        return nn.silu(x) if self.act else x


class DWConvBNAct(ConvBNAct):
    """Depthwise Conv+BN+SiLU — the reference's ``DWConv`` (conv.py:186-200).

    Instantiate via ``make`` so groups = gcd(c1, c2) is resolved from the
    static input channel count at graph-build time.
    """

    @staticmethod
    def make(c1: int, c2: int, k: int = 1, s: int = 1, act: bool = True, **kw) -> "DWConvBNAct":
        return DWConvBNAct(c2=c2, k=k, s=s, g=math.gcd(c1, c2), act=act, **kw)


class Conv2d(nn.Module):
    """Plain torch-style Conv2d (bias=True default) in NHWC; no BN/act."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.p if self.p is not None else self.k // 2
        return nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            use_bias=self.use_bias,
            name="conv2d",
        )(x)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py:452-477)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBNAct(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class C3(nn.Module):
    """CSP bottleneck, 3 convs (reference block.py:317-342)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3  # inner Bottleneck kernel; C3 uses ((1,1),(3,3)), C3k uses ((k,k),(k,k))
    c3k_style: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        kk = (self.k, self.k) if self.c3k_style else (1, 3)
        for i in range(self.n):
            a = Bottleneck(c_, c_, self.shortcut, self.g, k=(kk[0], kk[1]), e=1.0, name=f"m_{i}")(
                a, train
            )
        return ConvBNAct(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3k(C3):
    """C3 with configurable kernel (reference block.py:1090-1107)."""

    c3k_style: bool = True


class C3k2(nn.Module):
    """Faster CSP bottleneck, C2f-derived (reference block.py:1064-1088, C2f block.py:283-316).

    cv1 splits into two halves; n inner blocks chain off the second half; all
    intermediate outputs concat into cv2.
    """

    c1: int
    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c, c, 2, self.shortcut, self.g, name=f"m_{i}")
            else:
                m = Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=0.5, name=f"m_{i}")
            ys.append(m(ys[-1], train))
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C2f(nn.Module):
    """Faster CSP bottleneck with 2 convs (reference block.py:283-316; the
    YOLOv8 backbone block — C3k2's parent design)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(
                    ys[-1], train
                )
            )
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


def _max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k stride-1 max pool with symmetric k//2 padding (torch semantics).

    Computed in f32: the TPU backend rejects the bf16 max-pool BACKWARD
    (SelectAndScatter) — pooling is cheap, so upcast locally and cast back.
    """
    pad = k // 2
    dtype = x.dtype
    out = jax.lax.reduce_window(
        x.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return out.astype(dtype)


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (reference block.py:208-233).

    The 3 chained stride-1 max pools are pure VPU reduce_windows; XLA fuses
    the concat + 1x1 conv chain.
    """

    c1: int
    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = self.c1 // 2
        y = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(_max_pool_same(ys[-1], self.k))
        return ConvBNAct(self.c2, 1, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class Attention(nn.Module):
    """PSA self-attention over the flattened H*W grid (reference block.py:1247-1306).

    The (N x N) attention is a pair of MXU matmuls per head; the depthwise
    positional conv rides the VPU. All reshapes preserve the torch
    head-major channel layout so imported weights match.
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        qkv = ConvBNAct(self.dim + nh_kd * 2, 1, act=False, name="qkv")(x, train)
        # (B, N, heads, 2*key_dim + head_dim): same channel->head mapping as
        # torch's view(B, heads, 2kd+hd, N).
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, self.dim)
        pe = ConvBNAct(self.dim, 3, 1, g=self.dim, act=False, name="pe")(
            v.reshape(b, h, w, self.dim), train
        )
        return ConvBNAct(self.dim, 1, act=False, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """Attention + FFN with shortcuts (reference block.py:1307-1360)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = Attention(self.c, self.num_heads, self.attn_ratio, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = ConvBNAct(self.c * 2, 1, name="ffn_0")(x, train)
        f = ConvBNAct(self.c, 1, act=False, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


class C2PSA(nn.Module):
    """CSP wrapper around stacked PSABlocks (reference block.py:1412-1475)."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.c1 == self.c2
        c = int(self.c1 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, attn_ratio=0.5, num_heads=c // 64, name=f"m_{i}")(b, train)
        return ConvBNAct(self.c1, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class Upsample(nn.Module):
    """Nearest-neighbor integer upsample (torch nn.Upsample(scale, 'nearest'))."""

    scale: int = 2
    mode: str = "nearest"

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.mode == "nearest"
        x = jnp.repeat(x, self.scale, axis=1)
        return jnp.repeat(x, self.scale, axis=2)


class Concat(nn.Module):
    """Channel concat of multiple inputs (reference conv.py:616-643); NHWC axis -1."""

    axis: int = -1

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        return jnp.concatenate(list(xs), axis=self.axis)


class Detect(nn.Module):
    """YOLO detect head (reference head.py:26-212).

    Per level: cv2 branch -> 4*reg_max DFL logits, cv3 branch -> nc class
    logits. Training returns raw per-level NHWC maps. Inference additionally
    decodes: DFL expectation -> dist2bbox around constant-folded anchors ->
    pixel xywh + sigmoid class scores, laid out (B, total_anchors, 4+nc)
    (anchor-major — transposed vs the reference's channel-major (B, no, N)).

    ``strides`` must be resolved before inference decode (two-phase build in
    nn/model.py, mirroring the reference's dummy-forward stride probe,
    nn/tasks.py:396-406).
    """

    nc: int
    ch: tuple[int, ...]
    reg_max: int = 16
    strides: tuple[int, ...] | None = None
    legacy: bool = False
    export: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        nl = len(self.ch)
        assert len(xs) == nl
        no = self.nc + self.reg_max * 4
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))

        feats = []
        for i, x in enumerate(xs):
            box = ConvBNAct(c2, 3, name=f"cv2_{i}_0")(x, train)
            box = ConvBNAct(c2, 3, name=f"cv2_{i}_1")(box, train)
            box = Conv2d(4 * self.reg_max, 1, name=f"cv2_{i}_2")(box)
            if self.legacy:
                cls = ConvBNAct(c3, 3, name=f"cv3_{i}_0")(x, train)
                cls = ConvBNAct(c3, 3, name=f"cv3_{i}_1")(cls, train)
            else:
                cls = DWConvBNAct.make(self.ch[i], self.ch[i], 3, name=f"cv3_{i}_0_0")(x, train)
                cls = ConvBNAct(c3, 1, name=f"cv3_{i}_0_1")(cls, train)
                cls = DWConvBNAct.make(c3, c3, 3, name=f"cv3_{i}_1_0")(cls, train)
                cls = ConvBNAct(c3, 1, name=f"cv3_{i}_1_1")(cls, train)
            cls = Conv2d(self.nc, 1, name=f"cv3_{i}_2")(cls)
            feats.append(jnp.concatenate([box, cls], axis=-1))

        if train:
            return {"feats": feats}

        assert self.strides is not None, "Detect.strides unresolved; build via build_model()"
        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)  # (B, N, no)
        box_logits, cls_logits = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, list(self.strides), 0.5, dtype=jnp.float32)
        dist = dfl_expectation(box_logits.astype(jnp.float32), self.reg_max)
        dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
        preds = jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)
        if self.export:
            return {"preds": preds}
        return {"preds": preds, "feats": feats}

    @staticmethod
    def bias_init_fn(variables: dict, nc: int, strides: Sequence[int], prefix: str) -> dict:
        """Set detection-head prior biases (reference head.py:169-188).

        box branch final bias = 1.0; cls branch final bias = log(5/nc/(640/s)^2).
        ``prefix`` is the Detect module's param path (e.g. "layers_23").
        Returns a new variables pytree.
        """
        params = variables["params"]
        head = params
        for kpart in prefix.split("/"):
            head = head[kpart]
        for i, s in enumerate(strides):
            head[f"cv2_{i}_2"]["conv2d"]["bias"] = jnp.ones_like(
                head[f"cv2_{i}_2"]["conv2d"]["bias"]
            )
            cls_b = head[f"cv3_{i}_2"]["conv2d"]["bias"]
            head[f"cv3_{i}_2"]["conv2d"]["bias"] = jnp.full_like(
                cls_b, math.log(5 / nc / (640 / s) ** 2)
            )
        return variables


MODULE_REGISTRY: dict[str, Any] = {}


def register_modules() -> dict[str, Any]:
    """Name -> constructor registry used by the YAML parser."""
    from fce_yolo_tpu.nn import fce, heads, transformer

    MODULE_REGISTRY.update(
        {
            "AIFI": transformer.AIFI,
            "TransformerEncoderLayer": transformer.TransformerEncoderLayer,
            "MLP": transformer.MLP,
            "LayerNorm2d": transformer.LayerNorm2d,
            "Segment": heads.Segment,
            "Pose": heads.Pose,
            "OBB": heads.OBB,
            "Classify": heads.Classify,
            "Proto": heads.Proto,
            "Conv": ConvBNAct,
            "DWConv": DWConvBNAct,
            "Bottleneck": Bottleneck,
            "C3": C3,
            "C3k": C3k,
            "C3k2": C3k2,
            "C2f": C2f,
            "SPPF": SPPF,
            "C2PSA": C2PSA,
            "PSABlock": PSABlock,
            "Attention": Attention,
            "nn.Upsample": Upsample,
            "Upsample": Upsample,
            "Concat": Concat,
            "Detect": Detect,
            "BiFPN_Concat": fce.BiFPN_Concat,
            "CoordAtt": fce.CoordAtt,
            "CoordCrossAtt": fce.CoordCrossAtt,
            "BiCoordCrossAtt": fce.BiCoordCrossAtt,
        }
    )
    return MODULE_REGISTRY

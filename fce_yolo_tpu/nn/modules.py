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

# --- fused Conv+BN inference mode (reference Model.fuse, nn/tasks.py:
# fuse_conv_and_bn). When active at TRACE time, ConvBNAct emits a biased
# conv and no BatchNorm; the variables must have been transformed with
# nn.model.fold_conv_bn first (kernel <- kernel*gamma/sqrt(var+eps),
# bias <- beta - mean*gamma/sqrt(var+eps)). Round-5 motivation: kernel
# traces showed standalone BN normalize kernels + layout copies surviving
# XLA fusion at l/x scales — weight-level folding removes them entirely.
_FUSED_BN_MODE = False


class fused_bn_scope:
    """Context manager: trace ConvBNAct as folded conv(+bias), no BN."""

    def __enter__(self):
        global _FUSED_BN_MODE
        self._prev = _FUSED_BN_MODE
        _FUSED_BN_MODE = True

    def __exit__(self, *exc):
        global _FUSED_BN_MODE
        _FUSED_BN_MODE = self._prev


def fused_bn_active() -> bool:
    return _FUSED_BN_MODE


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels (reference conv.py:30-36)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def apply_act(x: jnp.ndarray, act: Any) -> jnp.ndarray:
    """Resolve the reference's act convention: True -> SiLU (default_act),
    a name ("relu", "gelu", ...) -> that fn, False/None -> identity."""
    if act is True:
        return nn.silu(x)
    if isinstance(act, str):
        return getattr(jax.nn, act.lower())(x)
    return x


def _k2(k) -> tuple[int, int]:
    """Kernel spec -> (kh, kw); accepts int or (kh, kw) (cross convs in C3x)."""
    return (k, k) if isinstance(k, int) else (int(k[0]), int(k[1]))


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU — the reference's ``Conv`` (conv.py:39-91).

    NHWC; explicit symmetric padding (matches torch, unlike XLA 'SAME' which
    pads asymmetrically for stride 2). At inference BN folds into a scale+
    shift that XLA fuses into the convolution epilogue, so no separate
    "fused" module is needed (reference forward_fuse, conv.py:81-91).
    """

    c2: int
    k: Any = 1  # int or (kh, kw)
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: Any = True  # True -> SiLU (reference default_act); "relu"; False -> identity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = _k2(self.k)
        ph = autopad(kh, self.p, self.d)
        pw = autopad(kw, self.p, self.d)
        # folded-weights inference: taken under fused_bn_scope, or AUTO-
        # detected from the variables themselves (fold_conv_bn leaves a
        # conv subtree and no bn — has_variable sees the provided tree at
        # trace time, so validators/exporters handle fused checkpoints with
        # no scope plumbing; at init both probes are False -> unfused path)
        folded_vars = (not self.is_initializing()
                       and self.has_variable("params", "conv")
                       and not self.has_variable("params", "bn"))
        if (_FUSED_BN_MODE or folded_vars) and not train:
            return apply_act(
                nn.Conv(
                    features=self.c2,
                    kernel_size=(kh, kw),
                    strides=(self.s, self.s),
                    padding=[(ph, ph), (pw, pw)],
                    feature_group_count=self.g,
                    kernel_dilation=(self.d, self.d),
                    use_bias=True,
                    name="conv",
                )(x),
                self.act,
            )
        x = nn.Conv(
            features=self.c2,
            kernel_size=(kh, kw),
            strides=(self.s, self.s),
            padding=[(ph, ph), (pw, pw)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn"
        )(x)
        return apply_act(x, self.act)


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


class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise conv (reference conv.py:150-184,
    PaddleDetection HGNetV2)."""

    c1: int
    c2: int
    k: int = 1
    act: Any = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNAct(c2=self.c2, k=1, act=False, name="conv1")(x, train)
        g = math.gcd(self.c2, self.c2)
        return ConvBNAct(c2=self.c2, k=self.k, g=g, act=self.act, name="conv2")(x, train)


class RepConv(nn.Module):
    """RepVGG-style re-parameterizable conv (reference conv.py:353-510).

    Train-mode graph: 3x3 Conv+BN + 1x1 Conv+BN (+ optional identity BN),
    summed before the activation. The torch module fuses the branches into
    one 3x3 for deploy; under XLA the three branches already fuse into one
    conv-add epilogue, so no separate deploy path is required for speed —
    weight import maps conv1/conv2 directly.
    """

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True
    use_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBNAct(c2=self.c2, k=self.k, s=self.s, p=1, g=self.g, act=False, name="conv1")(x, train)
        y = y + ConvBNAct(c2=self.c2, k=1, s=self.s, p=0, g=self.g, act=False, name="conv2")(x, train)
        if self.use_bn and self.c1 == self.c2 and self.s == 1:
            y = y + nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn"
            )(x)
        return apply_act(y, self.act)


class RepC3(nn.Module):
    """CSP-style block of RepConvs (reference block.py:365-392, RT-DETR neck)."""

    c1: int
    c2: int
    n: int = 3
    e: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c2=c_, k=1, name="cv1")(x, train)
        for i in range(self.n):
            y = RepConv(c1=c_, c2=c_, name=f"m_{i}")(y, train)
        y = y + ConvBNAct(c2=c_, k=1, name="cv2")(x, train)
        if c_ != self.c2:
            y = ConvBNAct(c2=self.c2, k=1, name="cv3")(y, train)
        return y


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + asymmetric-pad maxpool (reference
    block.py:104-139). All ReLU."""

    c1: int
    cm: int
    c2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        relu = "relu"
        x = ConvBNAct(c2=self.cm, k=3, s=2, act=relu, name="stem1")(x, train)
        # F.pad [0,1,0,1]: right/bottom by 1 (torch ceil_mode pooling analog)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBNAct(c2=self.cm // 2, k=2, s=1, p=0, act=relu, name="stem2a")(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBNAct(c2=self.cm, k=2, s=1, p=0, act=relu, name="stem2b")(x2, train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1))  # k2 s1 on padded input == ceil_mode
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBNAct(c2=self.cm, k=3, s=2, act=relu, name="stem3")(x, train)
        return ConvBNAct(c2=self.c2, k=1, s=1, act=relu, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 HG block: n chained (Light)Convs, concat, squeeze/excite
    1x1s, optional residual (reference block.py:141-184)."""

    c1: int
    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    act: Any = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ys = [x]
        for i in range(self.n):
            cin = self.c1 if i == 0 else self.cm
            if self.lightconv:
                m = LightConv(c1=cin, c2=self.cm, k=self.k, act=self.act, name=f"m_{i}")
            else:
                m = ConvBNAct(c2=self.cm, k=self.k, act=self.act, name=f"m_{i}")
            ys.append(m(ys[-1], train))
        y = jnp.concatenate(ys, axis=-1)
        y = ConvBNAct(c2=self.c2 // 2, k=1, act=self.act, name="sc")(y, train)
        y = ConvBNAct(c2=self.c2, k=1, act=self.act, name="ec")(y, train)
        return y + x if (self.shortcut and self.c1 == self.c2) else y


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


# ---------------------------------------------------------------------------
# Conv-zoo long tail (reference nn/modules/conv.py)
# ---------------------------------------------------------------------------


class Conv2(nn.Module):
    """RepConv-lite: parallel 3x3 + 1x1 convs summed before one shared BN+act
    (reference conv.py:92-149). XLA fuses the two convs' epilogues; no deploy
    re-param needed."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = autopad(self.k, self.p, self.d)
        y = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=self.g,
                    use_bias=False, name="conv")(x)
        y = y + Conv2d(self.c2, 1, self.s, autopad(1, self.p, self.d), self.g,
                       use_bias=False, name="cv2")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(y)
        return apply_act(y, self.act)


class ConvTranspose(nn.Module):
    """ConvTranspose2d + BN + SiLU (reference conv.py:219-270)."""

    c1: int
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.ConvTranspose(
            features=self.c2, kernel_size=(self.k, self.k), strides=(self.s, self.s),
            padding="VALID", use_bias=not self.bn, name="conv_transpose",
        )(x)
        # VALID gives (H-1)*s + k; torch subtracts 2p — slice it off
        if self.p:
            y = y[:, self.p : y.shape[1] - self.p, self.p : y.shape[2] - self.p, :]
        if self.bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, name="bn")(y)
        return apply_act(y, self.act)


class Focus(nn.Module):
    """Space-to-depth 2x2 slice + Conv (reference conv.py:271-310). Slice
    concat order (even/even, odd/even, even/odd, odd/odd in (H, W)) matches
    torch for weight import."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBNAct(self.c2, self.k, self.s, self.p, self.g, act=self.act, name="conv")(
            y, train
        )


class GhostConv(nn.Module):
    """Ghost convolution: primary conv + cheap depthwise 5x5 on its output,
    concatenated (reference conv.py:311-352)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = self.c2 // 2
        y = ConvBNAct(c_, self.k, self.s, None, self.g, act=self.act, name="cv1")(x, train)
        y2 = ConvBNAct(c_, 5, 1, None, c_, act=self.act, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class ChannelAttention(nn.Module):
    """Global-avg-pool channel gate (reference conv.py:512-548)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = Conv2d(self.channels, 1, use_bias=True, name="fc")(pooled)
        return x * jax.nn.sigmoid(gate)


class SpatialAttention(nn.Module):
    """Mean/max channel-stats spatial gate (reference conv.py:549-582)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stats = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True), jnp.max(x, axis=-1, keepdims=True)], axis=-1
        )
        pad = 3 if self.kernel_size == 7 else 1
        gate = Conv2d(1, self.kernel_size, p=pad, use_bias=False, name="cv1")(stats)
        return x * jax.nn.sigmoid(gate)


class CBAM(nn.Module):
    """Channel then spatial attention (reference conv.py:583-615)."""

    c1: int
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ChannelAttention(self.c1, name="channel_attention")(x, train)
        return SpatialAttention(self.kernel_size, name="spatial_attention")(x, train)


class Index(nn.Module):
    """Select one tensor from a list input (reference conv.py:644-669)."""

    index: int = 0

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        return xs[self.index]


# ---------------------------------------------------------------------------
# Legacy / CSP block long tail (reference nn/modules/block.py)
# ---------------------------------------------------------------------------


class SPP(nn.Module):
    """Classic parallel-kernel spatial pyramid pooling (reference block.py:185-207)."""

    c1: int
    c2: int
    k: tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = self.c1 // 2
        y = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        ys = [y] + [_max_pool_same(y, k) for k in self.k]
        return ConvBNAct(self.c2, 1, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py:235-255)."""

    c1: int
    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBNAct(self.c2, 1, 1, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = ConvBNAct(self.c2, 3, name=f"m_{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py:256-282)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(a, train)
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C3x(C3):
    """C3 with cross convs (1,3)/(3,1) (reference block.py:343-364)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, c_, self.shortcut, self.g, k=((1, 3), (3, 1)), e=1.0,
                           name=f"m_{i}")(a, train)
        return ConvBNAct(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference block.py:424-451). Sequential names conv_0/1/2,
    shortcut_0/1 mirror the torch Sequential indices."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = self.c2 // 2
        y = GhostConv(self.c1, c_, 1, 1, name="conv_0")(x, train)
        if self.s == 2:
            y = ConvBNAct(c_, self.k, self.s, g=math.gcd(c_, c_), act=False, name="conv_1")(
                y, train
            )
        y = GhostConv(c_, self.c2, 1, 1, act=False, name="conv_2")(y, train)
        if self.s == 2:
            sc = ConvBNAct(self.c1, self.k, self.s, g=self.c1, act=False, name="shortcut_0")(
                x, train
            )
            sc = ConvBNAct(self.c2, 1, 1, act=False, name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottleneck inner blocks (reference block.py:405-423)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, c_, name=f"m_{i}")(a, train)
        return ConvBNAct(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference block.py:479-511)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")(a, train)
        y1 = Conv2d(c_, 1, use_bias=False, name="cv3")(a)
        y2 = Conv2d(c_, 1, use_bias=False, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(y)
        return ConvBNAct(self.c2, 1, 1, name="cv4")(nn.silu(y), train)


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block (reference block.py:534-565)."""

    c1: int
    c2: int
    s: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c3 = self.e * self.c2
        y = ConvBNAct(self.c2, 1, 1, name="cv1")(x, train)
        y = ConvBNAct(self.c2, 3, self.s, p=1, name="cv2")(y, train)
        y = ConvBNAct(c3, 1, act=False, name="cv3")(y, train)
        if self.s != 1 or self.c1 != c3:
            sc = ConvBNAct(c3, 1, self.s, act=False, name="shortcut_0")(x, train)
        else:
            sc = x
        return jax.nn.relu(y + sc)


class ResNetLayer(nn.Module):
    """Stacked ResNet blocks / stem (reference block.py:566-616)."""

    c1: int
    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.is_first:
            x = ConvBNAct(self.c2, 7, 2, p=3, name="layer_0")(x, train)
            x = jax.lax.reduce_window(
                x.astype(jnp.float32), -jnp.inf, jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
            ).astype(x.dtype)
            return x
        x = ResNetBlock(self.c1, self.c2, self.s, self.e, name="layer_0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.e * self.c2, self.c2, 1, self.e, name=f"layer_{i}")(x, train)
        return x


# ---------------------------------------------------------------------------
# v9 blocks (reference block.py:823-1035)
# ---------------------------------------------------------------------------


class RepBottleneck(nn.Module):
    """Bottleneck with a RepConv first conv (reference block.py:823-842)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = RepConv(self.c1, c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBNAct(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class RepCSP(nn.Module):
    """C3 with RepBottleneck inner blocks (reference block.py:844-861)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = RepBottleneck(c_, c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")(a, train)
        return ConvBNAct(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN (reference block.py:863-893). cv2/cv3 are Sequential(RepCSP,
    Conv) -> names cv2_0/cv2_1, cv3_0/cv3_1."""

    c1: int
    c2: int
    c3: int
    c4: int
    n: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.c3 // 2
        y = ConvBNAct(self.c3, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        z = RepCSP(c, self.c4, self.n, name="cv2_0")(ys[-1], train)
        z = ConvBNAct(self.c4, 3, 1, name="cv2_1")(z, train)
        ys.append(z)
        z = RepCSP(self.c4, self.c4, self.n, name="cv3_0")(z, train)
        z = ConvBNAct(self.c4, 3, 1, name="cv3_1")(z, train)
        ys.append(z)
        return ConvBNAct(self.c2, 1, 1, name="cv4")(jnp.concatenate(ys, axis=-1), train)


class ELAN1(nn.Module):
    """ELAN with 4 plain convs (reference block.py:896-914)."""

    c1: int
    c2: int
    c3: int
    c4: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.c3 // 2
        y = ConvBNAct(self.c3, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        ys.append(ConvBNAct(self.c4, 3, 1, name="cv2")(ys[-1], train))
        ys.append(ConvBNAct(self.c4, 3, 1, name="cv3")(ys[-1], train))
        return ConvBNAct(self.c2, 1, 1, name="cv4")(jnp.concatenate(ys, axis=-1), train)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-1 unpadded average pool (torch avg_pool2d(x, 2, 1, 0))."""
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID"
    )
    return (s / 4.0).astype(x.dtype)


class AConv(nn.Module):
    """Avg-pool + strided conv downsample (reference block.py:916-933)."""

    c1: int
    c2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return ConvBNAct(self.c2, 3, 2, p=1, name="cv1")(_avg_pool2(x), train)


class ADown(nn.Module):
    """Dual-branch downsample (reference block.py:935-962)."""

    c1: int
    c2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.c2 // 2
        x = _avg_pool2(x)
        half = self.c1 // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = ConvBNAct(c, 3, 2, p=1, name="cv1")(x1, train)
        x2 = jax.lax.reduce_window(
            x2.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        ).astype(x2.dtype)
        x2 = ConvBNAct(c, 1, 1, p=0, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference block.py:964-990)."""

    c1: int
    c2: int
    c3: int
    k: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBNAct(self.c3, 1, 1, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(_max_pool_same(ys[-1], self.k))
        return ConvBNAct(self.c2, 1, 1, name="cv5")(jnp.concatenate(ys, axis=-1), train)


class CBLinear(nn.Module):
    """Conv that splits its output channels into a tuple of feature maps
    (reference block.py:992-1011). Downstream CBFuse indexes the tuple."""

    c1: int
    c2s: tuple[int, ...]
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        pad = autopad(self.k, self.p)
        y = nn.Conv(sum(self.c2s), (self.k, self.k), (self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=self.g,
                    use_bias=True, name="conv")(x)
        splits = []
        off = 0
        for c in self.c2s:
            splits.append(y[..., off : off + c])
            off += c
        return tuple(splits)


class CBFuse(nn.Module):
    """Sum selected per-source feature maps, nearest-resized to the last
    input's spatial size (reference block.py:1013-1035)."""

    idx: tuple[int, ...]

    def __call__(self, xs: Sequence[Any], train: bool = False) -> jnp.ndarray:
        target = xs[-1]
        th, tw = target.shape[1], target.shape[2]
        out = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]]
            sel = jax.image.resize(sel, (sel.shape[0], th, tw, sel.shape[3]), method="nearest")
            out = out + sel
        return out


# ---------------------------------------------------------------------------
# v10 blocks (reference block.py:1108-1552)
# ---------------------------------------------------------------------------


class RepVGGDW(nn.Module):
    """Parallel 7x7 + 3x3 depthwise convs, summed then SiLU (reference
    block.py:1108-1170). XLA fuses the add; no deploy re-param needed."""

    ed: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = ConvBNAct(self.ed, 7, 1, p=3, g=self.ed, act=False, name="conv")(x, train)
        b = ConvBNAct(self.ed, 3, 1, p=1, g=self.ed, act=False, name="conv1")(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Compact inverted block (reference block.py:1172-1214). cv1 Sequential
    -> names cv1_0..cv1_4."""

    c1: int
    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(self.c1, 3, g=self.c1, name="cv1_0")(x, train)
        y = ConvBNAct(2 * c_, 1, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, name="cv1_2")(y, train)
        else:
            y = ConvBNAct(2 * c_, 3, g=2 * c_, name="cv1_2")(y, train)
        y = ConvBNAct(self.c2, 1, name="cv1_3")(y, train)
        y = ConvBNAct(self.c2, 3, g=self.c2, name="cv1_4")(y, train)
        return x + y if self.shortcut and self.c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks (reference block.py:1216-1245)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(CIB(c, c, self.shortcut, e=1.0, lk=self.lk, name=f"m_{i}")(ys[-1], train))
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class PSA(nn.Module):
    """Position-sensitive attention block (reference block.py:1362-1411)."""

    c1: int
    c2: int
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.c1 == self.c2
        c = int(self.c1 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, num_heads=c // 64, attn_ratio=0.5, name="attn")(b, train)
        f = ConvBNAct(c * 2, 1, name="ffn_0")(b, train)
        f = ConvBNAct(c, 1, act=False, name="ffn_1")(f, train)
        b = b + f
        return ConvBNAct(self.c1, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2fPSA(nn.Module):
    """C2f with PSABlock inner blocks (reference block.py:1477-1504)."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.c1 == self.c2
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                PSABlock(c, attn_ratio=0.5, num_heads=c // 64, name=f"m_{i}")(ys[-1], train)
            )
        return ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SCDown(nn.Module):
    """Separable-conv downsample (reference block.py:1506-1552)."""

    c1: int
    c2: int
    k: int
    s: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNAct(self.c2, 1, 1, name="cv1")(x, train)
        return ConvBNAct(self.c2, self.k, self.s, g=self.c2, act=False, name="cv2")(x, train)


# ---------------------------------------------------------------------------
# v12 area-attention blocks (reference block.py:1617-1846)
# ---------------------------------------------------------------------------


class AAttn(nn.Module):
    """Area attention: full attention within `area` horizontal slabs of the
    flattened grid (reference block.py:1617-1697). NHWC makes the reference's
    flatten/transpose dance a pair of reshapes; per-head qkv channel layout
    is head-major to match torch weight import."""

    dim: int
    num_heads: int
    area: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads
        qkv = ConvBNAct(self.dim * 3, 1, act=False, name="qkv")(x, train)
        qkv = qkv.reshape(b * self.area, n // self.area, self.num_heads, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        vmap = v.reshape(b, h, w, self.dim)
        pe = ConvBNAct(self.dim, 7, 1, p=3, g=self.dim, act=False, name="pe")(vmap, train)
        return ConvBNAct(self.dim, 1, act=False, name="proj")(out + pe, train)


class ABlock(nn.Module):
    """Area-attention + conv MLP with residuals (reference block.py:1699-1745)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x + AAttn(self.dim, self.num_heads, self.area, name="attn")(x, train)
        hid = int(self.dim * self.mlp_ratio)
        y = ConvBNAct(hid, 1, name="mlp_0")(x, train)
        y = ConvBNAct(self.dim, 1, act=False, name="mlp_1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """Area-attention C2f (reference block.py:1747-1846). Each m_i is a
    Sequential of two ABlocks (names m_{i}_0/m_{i}_1) when a2, else a C3k."""

    c1: int
    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        assert c_ % 32 == 0, "A2C2f hidden dim must be a multiple of 32"
        y = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            z = ys[-1]
            if self.a2:
                z = ABlock(c_, c_ // 32, self.mlp_ratio, self.area, name=f"m_{i}_0")(z, train)
                z = ABlock(c_, c_ // 32, self.mlp_ratio, self.area, name=f"m_{i}_1")(z, train)
            else:
                z = C3k(c_, c_, 2, self.shortcut, self.g, name=f"m_{i}")(z, train)
            ys.append(z)
        out = ConvBNAct(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", lambda k: 0.01 * jnp.ones((self.c2,)))
            return x + gamma[None, None, None, :] * out
        return out


# ---------------------------------------------------------------------------
# torch.nn passthrough wrappers used by legacy YAMLs (v3/v5/v6)
# ---------------------------------------------------------------------------


class MaxPool2d(nn.Module):
    """torch nn.MaxPool2d(k, s, p) semantics."""

    k: int
    s: int | None = None
    p: int = 0

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = self.s if self.s is not None else self.k
        return jax.lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (1, self.k, self.k, 1), (1, s, s, 1),
            ((0, 0), (self.p, self.p), (self.p, self.p), (0, 0)),
        ).astype(x.dtype)


class ConvTranspose2d(nn.Module):
    """torch nn.ConvTranspose2d(c1, c2, k, s, p) (bias=True)."""

    c1: int
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.ConvTranspose(self.c2, (self.k, self.k), (self.s, self.s),
                             padding="VALID", use_bias=True, name="conv_transpose2d")(x)
        if self.p:
            y = y[:, self.p : y.shape[1] - self.p, self.p : y.shape[2] - self.p, :]
        return y


class Identity(nn.Module):
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return x


class ZeroPad2d(nn.Module):
    """torch nn.ZeroPad2d(padding) — (left, right, top, bottom) or int."""

    padding: Any = 0

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.padding
        if isinstance(p, int):
            left = right = top = bottom = p
        else:
            left, right, top, bottom = p
        return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))


MODULE_REGISTRY: dict[str, Any] = {}


def register_modules() -> dict[str, Any]:
    """Name -> constructor registry used by the YAML parser."""
    from fce_yolo_tpu.nn import fce, heads, resnet, transformer, world

    MODULE_REGISTRY.update(
        {
            "TorchVision": resnet.TorchVision,
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
            "Conv2": Conv2,
            "ConvTranspose": ConvTranspose,
            "Focus": Focus,
            "GhostConv": GhostConv,
            "GhostBottleneck": GhostBottleneck,
            "ChannelAttention": ChannelAttention,
            "SpatialAttention": SpatialAttention,
            "CBAM": CBAM,
            "Index": Index,
            "SPP": SPP,
            "C1": C1,
            "C2": C2,
            "C3x": C3x,
            "C3Ghost": C3Ghost,
            "BottleneckCSP": BottleneckCSP,
            "ResNetLayer": ResNetLayer,
            "RepConv": RepConv,
            "RepC3": RepC3,
            "RepBottleneck": RepBottleneck,
            "RepCSP": RepCSP,
            "RepNCSPELAN4": RepNCSPELAN4,
            "ELAN1": ELAN1,
            "AConv": AConv,
            "ADown": ADown,
            "SPPELAN": SPPELAN,
            "CBLinear": CBLinear,
            "CBFuse": CBFuse,
            "RepVGGDW": RepVGGDW,
            "CIB": CIB,
            "C2fCIB": C2fCIB,
            "PSA": PSA,
            "C2fPSA": C2fPSA,
            "SCDown": SCDown,
            "AAttn": AAttn,
            "ABlock": ABlock,
            "A2C2f": A2C2f,
            "HGStem": HGStem,
            "HGBlock": HGBlock,
            "LightConv": LightConv,
            "v10Detect": heads.V10Detect,
            "RTDETRDecoder": heads.RTDETRDecoder,
            "nn.MaxPool2d": MaxPool2d,
            "nn.ConvTranspose2d": ConvTranspose2d,
            "nn.Identity": Identity,
            "nn.ZeroPad2d": ZeroPad2d,
            "AGLU": AGLU,
            "C3TR": C3TR,
            "DWConvTranspose2d": DWConvTranspose2d,
            "TransformerLayer": transformer.TransformerLayer,
            "TransformerBlock": transformer.TransformerBlock,
            "C2fAttn": world.C2fAttn,
            "ImagePoolingAttn": world.ImagePoolingAttn,
            "WorldDetect": world.WorldDetect,
            "MaxSigmoidAttnBlock": world.MaxSigmoidAttnBlock,
            "ContrastiveHead": world.ContrastiveHead,
            "BNContrastiveHead": world.BNContrastiveHead,
        }
    )
    return MODULE_REGISTRY


class AGLU(nn.Module):
    """Adaptive Gated Linear Unit activation (reference nn/modules/
    activation.py:8-55): exp((1/lambda) * softplus_{beta=-1}(kappa*x -
    log(lambda))) with learnable scalar lambda/kappa."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        lambd = self.param("lambd", lambda k: jax.random.uniform(k, (1,)))
        kappa = self.param("kappa", lambda k: jax.random.uniform(k, (1,)))
        lam = jnp.clip(lambd, 0.0001, None)
        # torch Softplus(beta=-1): -log(1 + exp(-x))
        y = self.kappa_softplus(kappa * x - jnp.log(lam))
        return jnp.exp(y / lam)

    @staticmethod
    def kappa_softplus(x):
        return -jnp.log1p(jnp.exp(-x))


class C3TR(C3):
    """C3 with a TransformerBlock inner (reference block.py:394-404)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from fce_yolo_tpu.nn.transformer import TransformerBlock

        c_ = int(self.c2 * self.e)
        a = ConvBNAct(c_, 1, 1, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, 1, name="cv2")(x, train)
        a = TransformerBlock(c_, c_, 4, self.n, name="m")(a, train)
        return ConvBNAct(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class DWConvTranspose2d(nn.Module):
    """Depthwise transposed conv (reference conv.py:202-218)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    p2: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # flax ConvTranspose has no grouping — run per-group slices (the
        # depthwise case is tiny; this module exists for API completeness)
        g = math.gcd(self.c1, self.c2)
        cin, cout = self.c1 // g, self.c2 // g
        parts = []
        for gi in range(g):
            parts.append(nn.ConvTranspose(
                cout, (self.k, self.k), (self.s, self.s), padding="VALID",
                use_bias=True, name=f"conv_transpose2d_g{gi}",
            )(x[..., gi * cin : (gi + 1) * cin]))
        y = jnp.concatenate(parts, axis=-1)
        if self.p1:
            y = y[:, self.p1 : y.shape[1] - self.p1, self.p1 : y.shape[2] - self.p1, :]
        if self.p2:
            y = jnp.pad(y, ((0, 0), (0, self.p2), (0, self.p2), (0, 0)))
        return y

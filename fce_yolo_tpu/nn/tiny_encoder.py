"""TinyViT image encoder — the Mobile-SAM trunk, TPU-native flax.

Parity target (random-weight activation parity in tests/test_sam.py):
  - TinyViT               models/sam/modules/tiny_encoder.py:753-996
  - Conv2d_BN             tiny_encoder.py:24-72   (folded at import; see below)
  - PatchEmbed            tiny_encoder.py:74-120
  - MBConv                tiny_encoder.py:123-189
  - PatchMerging          tiny_encoder.py:191-252
  - ConvLayer/BasicLayer  tiny_encoder.py:253-336, 650-751
  - Attention (LeViT bias)tiny_encoder.py:396-506
  - TinyViTBlock          tiny_encoder.py:509-647

TPU re-design notes:
  - NHWC end to end; the torch code round-trips tokens<->NCHW around every
    local conv and patch merge. Here the running tensor stays a spatial NHWC
    map and is flattened to tokens only inside windowed attention — window
    partition is a free reshape/transpose for XLA.
  - Conv2d_BN is an inference-time construct (its BN is folded into the conv
    at weight-import time, the same fuse the reference applies via fuse_bn),
    so each Conv2d_BN lands on the MXU as a single biased conv.
  - The LeViT-style attention bias table is gathered with a static index
    matrix computed at build time from the (static) window resolution — the
    gather constant-folds; no per-step index math.
  - No `input_resolution` bookkeeping / `set_imgsz`: every spatial size is
    read off the traced shapes, so one module serves any image size the
    caller compiles for.
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fce_yolo_tpu.nn.sam import LayerNorm2d


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default."""
    return nn.gelu(x, approximate=False)


class ConvBN(nn.Module):
    """Conv2d+BN folded to one biased conv (reference Conv2d_BN, eval mode)."""

    features: int
    kernel: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            feature_group_count=self.groups,
            use_bias=True,
            name="conv",
        )(x)


class PatchEmbedTiny(nn.Module):
    """Two stride-2 3x3 convs: (B,H,W,3) -> (B,H/4,W/4,C) (ref :74-120)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBN(self.embed_dim // 2, kernel=3, stride=2, pad=1, name="conv0")(x)
        x = _gelu(x)
        return ConvBN(self.embed_dim, kernel=3, stride=2, pad=1, name="conv1")(x)


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with residual (ref MBConv :123-189)."""

    dim: int
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.expand_ratio)
        shortcut = x
        x = _gelu(ConvBN(hidden, name="conv1")(x))
        x = _gelu(ConvBN(hidden, kernel=3, pad=1, groups=hidden, name="conv2")(x))
        x = ConvBN(self.dim, name="conv3")(x)
        return _gelu(x + shortcut)


class PatchMergingTiny(nn.Module):
    """1x1 -> dw3x3 (stride 2, or 1 for dims {320,448,576}) -> 1x1
    (ref PatchMerging :191-252). Keeps the NHWC map; the reference's
    token-flatten at the end is deferred to attention."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = _gelu(ConvBN(self.out_dim, name="conv1")(x))
        x = _gelu(
            ConvBN(self.out_dim, kernel=3, stride=stride, pad=1,
                   groups=self.out_dim, name="conv2")(x)
        )
        return ConvBN(self.out_dim, name="conv3")(x)


class TinyAttention(nn.Module):
    """LeViT-style MHA with a learned per-offset bias table over a static
    window grid (ref Attention :396-506). Token input (B, N, C)."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = x.shape
        kd, h = self.key_dim, self.num_heads
        d = int(self.attn_ratio * self.key_dim)

        # static bias index grid: offset -> table column (ref :466-478)
        points = list(itertools.product(range(self.resolution[0]),
                                        range(self.resolution[1])))
        offsets: dict[tuple[int, int], int] = {}
        idxs = []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                offsets.setdefault(off, len(offsets))
                idxs.append(offsets[off])
        idx = np.asarray(idxs, np.int32).reshape(len(points), len(points))
        biases = self.param(
            "attention_biases", nn.initializers.zeros, (h, len(offsets))
        )

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(h * (2 * kd + d), name="qkv")(x)
        qkv = qkv.reshape(b, n, h, 2 * kd + d)
        q, k, v = qkv[..., :kd], qkv[..., kd:2 * kd], qkv[..., 2 * kd:]
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * (kd ** -0.5)
        attn = attn + biases[:, idx][None]
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, h * d)
        return nn.Dense(self.dim, name="proj")(out)


class TinyMLP(nn.Module):
    """Pre-norm 2-layer GELU MLP (ref MLP :337-394)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = _gelu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.out, name="fc2")(x)


class TinyViTBlock(nn.Module):
    """Windowed attention + depthwise local conv + MLP (ref :509-647).
    Input/output: spatial NHWC (B, H, W, C)."""

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    local_conv_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        ws = self.window_size
        attn = TinyAttention(
            dim=self.dim,
            key_dim=self.dim // self.num_heads,
            num_heads=self.num_heads,
            attn_ratio=1.0,
            resolution=(ws, ws),
            name="attn",
        )
        res = x
        if hh == ws and ww == ws:
            x = attn(x.reshape(b, hh * ww, c)).reshape(b, hh, ww, c)
        else:
            pad_b = (ws - hh % ws) % ws
            pad_r = (ws - ww % ws) % ws
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            ph, pw = hh + pad_b, ww + pad_r
            nh, nw = ph // ws, pw // ws
            x = (
                x.reshape(b, nh, ws, nw, ws, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b * nh * nw, ws * ws, c)
            )
            x = attn(x)
            x = (
                x.reshape(b, nh, nw, ws, ws, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, ph, pw, c)
            )
            if pad_b or pad_r:
                x = x[:, :hh, :ww]
        x = res + x
        x = ConvBN(
            self.dim,
            kernel=self.local_conv_size,
            pad=self.local_conv_size // 2,
            groups=self.dim,
            name="local_conv",
        )(x)
        mlp = TinyMLP(int(self.dim * self.mlp_ratio), self.dim, name="mlp")
        return x + mlp(x)


class TinyViT(nn.Module):
    """Mobile-SAM trunk: conv stage + 3 transformer stages + 256-ch neck
    (ref TinyViT :753-996). (B, H, W, 3) -> (B, H/16, W/16, 256)."""

    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    neck_chans: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = PatchEmbedTiny(self.embed_dims[0], name="patch_embed")(x)
        for i, depth in enumerate(self.depths):
            if i == 0:
                for j in range(depth):
                    x = MBConvBlock(
                        self.embed_dims[0],
                        expand_ratio=self.mbconv_expand_ratio,
                        name=f"layers_0_blocks_{j}",
                    )(x)
            else:
                for j in range(depth):
                    x = TinyViTBlock(
                        dim=self.embed_dims[i],
                        num_heads=self.num_heads[i],
                        window_size=self.window_sizes[i],
                        mlp_ratio=self.mlp_ratio,
                        local_conv_size=self.local_conv_size,
                        name=f"layers_{i}_blocks_{j}",
                    )(x)
            if i < len(self.depths) - 1:
                x = PatchMergingTiny(
                    self.embed_dims[i + 1], name=f"layers_{i}_downsample"
                )(x)
        x = nn.Conv(self.neck_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = LayerNorm2d(self.neck_chans, name="neck_1")(x)
        x = nn.Conv(self.neck_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_2")(x)
        return LayerNorm2d(self.neck_chans, name="neck_3")(x)


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------


def tinyvit_state_dict_to_params(sd: dict[str, Any]) -> dict:
    """Map a torch TinyViT state_dict (keys WITHOUT the 'image_encoder.'
    prefix) onto :class:`TinyViT` params. Conv2d_BN pairs are folded into a
    single biased conv (eval-mode BN fuse, eps 1e-5)."""

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: dict[str, Any] = {}

    def put(path: list[str], value: np.ndarray):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = jnp.asarray(value)

    def fold(prefix: str) -> tuple[np.ndarray, np.ndarray]:
        w = to_np(sd[f"{prefix}.c.weight"])  # (O, I/g, kh, kw)
        g = to_np(sd[f"{prefix}.bn.weight"])
        b = to_np(sd[f"{prefix}.bn.bias"])
        mu = to_np(sd[f"{prefix}.bn.running_mean"])
        var = to_np(sd[f"{prefix}.bn.running_var"])
        s = g / np.sqrt(var + 1e-5)
        return w * s[:, None, None, None], b - mu * s

    done: set[str] = set()
    for key in sd:
        base = key.rsplit(".", 1)[0]
        mod = base.rsplit(".", 1)[0] if base.endswith((".c", ".bn")) else None
        if mod is not None:
            if mod in done:
                continue
            done.add(mod)
            w, bias = fold(mod)
            toks = mod.split(".")
            if toks[0] == "patch_embed":  # patch_embed.seq.{0,2}
                name = ["patch_embed", f"conv{int(toks[2]) // 2}", "conv"]
            else:  # layers.L.blocks.B.convN / local_conv / layers.L.downsample.convN
                if toks[2] == "downsample":
                    name = [f"layers_{toks[1]}_downsample", toks[3], "conv"]
                else:
                    name = [f"layers_{toks[1]}_blocks_{toks[3]}", toks[4], "conv"]
            put(name + ["kernel"], w.transpose(2, 3, 1, 0))
            put(name + ["bias"], bias)
            continue
        toks = key.split(".")
        if toks[0] in ("norm_head", "head"):  # classifier head: unused by SAM
            continue
        if toks[0] == "neck":  # neck.0/2 conv (no bias), neck.1/3 LayerNorm2d
            v = to_np(sd[key])
            if toks[2] == "weight" and v.ndim == 4:
                put([f"neck_{toks[1]}", "kernel"], v.transpose(2, 3, 1, 0))
            else:
                put([f"neck_{toks[1]}", "scale" if toks[2] == "weight" else "bias"], v)
            continue
        if toks[0] == "layers":  # attention / mlp leaves
            block = f"layers_{toks[1]}_blocks_{toks[3]}"
            sub, leaf = toks[4], toks[-1]
            v = to_np(sd[key])
            if leaf == "attention_biases":
                put([block, sub, "attention_biases"], v)
            elif leaf == "attention_bias_idxs":
                continue  # static, recomputed
            else:
                inner = toks[5]  # norm/qkv/proj or norm/fc1/fc2
                if leaf == "weight":
                    put([block, sub, inner, "kernel" if v.ndim == 2 else "scale"],
                        v.T if v.ndim == 2 else v)
                else:
                    put([block, sub, inner, "bias"], v)
            continue
        raise KeyError(f"unmapped TinyViT key: {key}")
    return params

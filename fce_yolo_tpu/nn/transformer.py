"""Transformer modules (RT-DETR foundation).

Parity targets: reference nn/modules/transformer.py — TransformerEncoderLayer
(:32, post/pre-norm MHA + FFN), AIFI (:171, 2D sin-cos positional encoding
over the flattened grid), MLP (:348), LayerNorm2d (:415). NHWC throughout;
attention is a pair of MXU matmuls per head.

Parameter naming mirrors the torch attribute paths so nn/import_torch.py
maps reference weights directly: ma.in_proj_weight/in_proj_bias (packed
(3C, C) torch layout kept verbatim), ma.out_proj, fc1/fc2, norm1/norm2.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "TransformerEncoderLayer", "AIFI", "MLP", "LayerNorm2d",
    "MSDeformAttn", "DeformableTransformerDecoderLayer",
]


class _TorchMHA(nn.Module):
    """Multi-head self-attention with torch nn.MultiheadAttention's packed
    parameter layout (in_proj_weight (3C, C), out_proj Linear)."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask: jnp.ndarray | None = None):
        c, h = self.c, self.num_heads
        hd = c // h
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        wq, wk, wv = jnp.split(w_in, 3, axis=0)  # each (C, C), torch (out, in)
        bq, bk, bv = jnp.split(b_in, 3)
        B, N, _ = q.shape

        def heads(x, w, b):
            y = x @ w.T + b
            return y.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)  # (B, h, N, hd)

        qh, kh, vh = heads(q, wq, bq), heads(k, wk, bk), heads(v, wv, bv)
        logits = qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(hd)
        if attn_mask is not None:  # torch convention: True = blocked
            logits = jnp.where(attn_mask[None, None], -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, -1, c)
        w_out = self.param("out_proj_weight", nn.initializers.xavier_uniform(), (c, c))
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (c,))
        return out @ w_out.T + b_out


class TransformerEncoderLayer(nn.Module):
    """MHA + FFN encoder layer (reference transformer.py:32-170)."""

    c1: int
    cm: int = 2048
    num_heads: int = 8
    normalize_before: bool = False
    act: str = "gelu"

    @nn.compact
    def __call__(self, src: jnp.ndarray, pos: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        act = getattr(jax.nn, self.act)
        ma = _TorchMHA(self.c1, self.num_heads, name="ma")
        fc1 = nn.Dense(self.cm, name="fc1")
        fc2 = nn.Dense(self.c1, name="fc2")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        add_pos = lambda t: t if pos is None else t + pos
        if self.normalize_before:
            s2 = norm1(src)
            q = k = add_pos(s2)
            src = src + ma(q, k, s2)
            s2 = norm2(src)
            return src + fc2(act(fc1(s2)))
        q = k = add_pos(src)
        src = norm1(src + ma(q, k, src))
        return norm2(src + fc2(act(fc1(src))))


class AIFI(TransformerEncoderLayer):
    """Attention over the flattened 2D grid with sin-cos positions
    (reference transformer.py:171-250). Input/output NHWC."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        pos = build_2d_sincos_pos_embed(w, h, c).astype(x.dtype)
        y = TransformerEncoderLayer.__call__(self, x.reshape(b, h * w, c), pos=pos)
        return y.reshape(b, h, w, c)


def build_2d_sincos_pos_embed(w: int, h: int, embed_dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """(1, h*w, embed_dim) 2D sine-cosine embedding (reference AIFI
    build_2d_sincos_position_embedding; same [sin_w, cos_w, sin_h, cos_h]
    channel order)."""
    assert embed_dim % 4 == 0
    # NOTE: the reference builds the grid with meshgrid(w, h, indexing="ij")
    # and flattens it w-major even though features flatten h-major — replicate
    # that exact (quirky) orientation for weight-import parity
    gw, gh = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij"
    )  # (w, h)
    pos_dim = embed_dim // 4
    omega = 1.0 / temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim)
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    emb = np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1)
    return jnp.asarray(emb)[None]


class MLP(nn.Module):
    """Stacked-linear MLP head (reference transformer.py:348-414)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    act: str = "relu"
    sigmoid_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = getattr(jax.nn, self.act)
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = act(x)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC maps (reference transformer.py:415-457)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.LayerNorm(name="ln")(x)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with the reference's clamping (nn/modules/utils.py:79-100)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def _sampling_offsets_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference MSDeformAttn._reset_parameters grid init (transformer.py:
    511-528): per-head unit directions scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (nh, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (reference transformer.py:458-580,
    Deformable-DETR / PaddleDetection).

    TPU re-design: torch routes sampling through ``F.grid_sample`` per level;
    here bilinear sampling is four corner gathers with zero-padding masks —
    all static shapes, fused by XLA. The sample count is tiny
    (nq * nh * np per level, ~10k), so gathers are cheap.

    Submodule names mirror torch (sampling_offsets / attention_weights /
    value_proj / output_proj) for weight import.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, nq, C)
        refer_bbox: jnp.ndarray,  # (B, nq, n_levels, 2 or 4) in [0, 1]
        value: jnp.ndarray,  # (B, LV, C), LV = sum(H*W)
        value_shapes: list,  # static [(H, W)] * n_levels
    ) -> jnp.ndarray:
        c, nh, nl, npts = self.d_model, self.n_heads, self.n_levels, self.n_points
        hd = c // nh
        b, nq = query.shape[:2]

        v = nn.Dense(c, name="value_proj")(value).reshape(b, -1, nh, hd)
        offsets = nn.Dense(
            nh * nl * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offsets_bias_init(nh, nl, npts),
            name="sampling_offsets",
        )(query).reshape(b, nq, nh, nl, npts, 2)
        attn = nn.Dense(
            nh * nl * npts,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, nq, nh, nl * npts)
        attn = jax.nn.softmax(attn, -1).reshape(b, nq, nh, nl, npts)

        num_points = refer_bbox.shape[-1]
        if num_points == 2:
            norm = jnp.asarray([[wl, hl] for hl, wl in value_shapes], query.dtype)
            loc = refer_bbox[:, :, None, :, None, :] + offsets / norm[None, None, None, :, None, :]
        else:  # 4: xywh reference boxes scale the offsets (transformer.py:574)
            loc = (
                refer_bbox[:, :, None, :, None, :2]
                + offsets / npts * refer_bbox[:, :, None, :, None, 2:] * 0.5
            )

        out = jnp.zeros((b, nq, nh, hd), query.dtype)
        start = 0
        for lvl, (hl, wl) in enumerate(value_shapes):
            v_l = v[:, start : start + hl * wl]  # (B, H*W, nh, hd)
            start += hl * wl
            # grid_sample(align_corners=False, padding zeros) equivalence
            px = loc[:, :, :, lvl, :, 0] * wl - 0.5  # (B, nq, nh, np)
            py = loc[:, :, :, lvl, :, 1] * hl - 0.5
            x0, y0 = jnp.floor(px), jnp.floor(py)
            v_t = v_l.transpose(0, 2, 1, 3)  # (B, nh, H*W, hd)
            acc = 0.0
            for dx in (0.0, 1.0):
                for dy in (0.0, 1.0):
                    xi, yi = x0 + dx, y0 + dy
                    w = (1 - jnp.abs(px - xi)) * (1 - jnp.abs(py - yi))
                    ok = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
                    flat = (
                        jnp.clip(yi, 0, hl - 1).astype(jnp.int32) * wl
                        + jnp.clip(xi, 0, wl - 1).astype(jnp.int32)
                    )  # (B, nq, nh, np)
                    idx = flat.transpose(0, 2, 1, 3).reshape(b, nh, nq * npts)
                    g = jnp.take_along_axis(v_t, idx[..., None], axis=2)
                    g = g.reshape(b, nh, nq, npts, hd).transpose(0, 2, 1, 3, 4)
                    acc = acc + g * (w * ok)[..., None]
            out = out + (acc * attn[:, :, :, lvl, :, None]).sum(axis=3)

        return nn.Dense(c, name="output_proj")(out.reshape(b, nq, c))


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN decoder layer (reference
    transformer.py:581-708). Submodule names mirror torch; dropout = 0."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    act: str = "relu"

    @nn.compact
    def __call__(
        self,
        embed: jnp.ndarray,  # (B, nq, C)
        refer_bbox: jnp.ndarray,  # (B, nq, 4) sigmoid space
        feats: jnp.ndarray,  # (B, LV, C)
        shapes: list,
        attn_mask: jnp.ndarray | None = None,
        query_pos: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        add_pos = lambda t: t if query_pos is None else t + query_pos
        q = k = add_pos(embed)
        tgt = _TorchMHA(self.d_model, self.n_heads, name="self_attn")(q, k, embed, attn_mask)
        embed = nn.LayerNorm(name="norm1")(embed + tgt)

        tgt = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, name="cross_attn"
        )(add_pos(embed), refer_bbox[:, :, None, :], feats, shapes)
        embed = nn.LayerNorm(name="norm2")(embed + tgt)

        ffn = nn.Dense(self.d_ffn, name="linear1")(embed)
        ffn = nn.Dense(self.d_model, name="linear2")(getattr(jax.nn, self.act)(ffn))
        return nn.LayerNorm(name="norm3")(embed + ffn)


class TransformerLayer(nn.Module):
    """LayerNorm-free ViT layer (reference transformer.py:243-271): separate
    q/k/v Linears feeding a torch-layout MHA, then a bias-free 2-layer FFN,
    both with residuals."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        q = nn.Dense(self.c, use_bias=False, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, name="v")(x)
        x = _TorchMHA(self.c, self.num_heads, name="ma")(q, k, v) + x
        y = nn.Dense(self.c, use_bias=False, name="fc1")(x)
        return nn.Dense(self.c, use_bias=False, name="fc2")(y) + x


class TransformerBlock(nn.Module):
    """ViT block over the flattened grid (reference transformer.py:274-330):
    optional channel-matching Conv, learned position embedding Linear, then
    n TransformerLayers."""

    c1: int
    c2: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from fce_yolo_tpu.nn.modules import ConvBNAct

        if self.c1 != self.c2:
            x = ConvBNAct(self.c2, 1, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(self.c2, name="linear")(p)  # learned position embedding
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, name=f"tr_{i}")(p, train)
        return p.reshape(b, h, w, self.c2)

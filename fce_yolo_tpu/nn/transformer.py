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

__all__ = ["TransformerEncoderLayer", "AIFI", "MLP", "LayerNorm2d"]


class _TorchMHA(nn.Module):
    """Multi-head self-attention with torch nn.MultiheadAttention's packed
    parameter layout (in_proj_weight (3C, C), out_proj Linear)."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v):
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
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(hd), axis=-1)
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

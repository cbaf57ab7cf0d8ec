"""SAM3 (concept-promptable segmentation) — TPU-native flax modules.

SAM3 detects and segments EVERY instance of a concept given a text phrase
and/or box exemplars: a ViTDet backbone fused with text through a
GroundingDINO-style encoder, a DETR decoder with box-relative position bias,
and a maskformer segmentation head.

Parity targets (reference, random-weight activation parity in
tests/test_sam3.py):
  - ViT (ViTDet + RoPE)       models/sam/sam3/vitdet.py:41-547
  - Sam3DualViTDetNeck        models/sam/sam3/necks.py:15-160
  - VETextEncoder             models/sam/sam3/text_encoder_ve.py:17-307
  - TransformerEncoderFusion  models/sam/sam3/encoder.py:15-529
  - TransformerDecoder (+RPB) models/sam/sam3/decoder.py:23-546
  - SequenceGeometryEncoder   models/sam/sam3/geometry_encoders.py:179-415
  - DotProductScoring         models/sam/sam3/model_misc.py:16-78
  - PixelDecoder/UniversalSegmentationHead  models/sam/sam3/maskformer_segmentation.py:143-286
  - SAM3SemanticModel         models/sam/sam3/sam3_image.py:30-333
  - build wiring              models/sam/build_sam3.py:26-240

TPU re-design notes:
  - NHWC feature maps; seq-first torch conventions become batch-first.
  - RoPE is the shared real-valued trace-time table (nn/sam2.py), with the
    ViTDet scale_pos interpolation.
  - The boxRPB attention bias (decoder.py:313-374) is computed as two small
    MLPs over static coordinate grids — fully fused by XLA, no coord cache.
  - roi_align uses a STATIC sampling_ratio (default 2) instead of
    torchvision's data-dependent ceil(bin_size) — torch parity is exact for
    rois whose bin size is in (1, 2] and approximate otherwise (documented
    in PARITY.md).
  - Text arrives through the offline hash tokenizer (nn/text_model.py) —
    CLIP BPE assets need egress; the encoder architecture itself is exact.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fce_yolo_tpu.nn.sam import MLP, PromptEncoder, window_partition, window_unpartition
from fce_yolo_tpu.nn.sam2 import (
    MemoryAttention,
    SAM2MaskDecoder,
    SAM2Model,
    _apply_rope,
    axial_rope_cos_sin,
    get_1d_sine_pe,
    sine_pos_embed,
)
from fce_yolo_tpu.nn.sam2 import MemoryEncoder as SAM2MemoryEncoder

__all__ = ["SAM3SemanticModel", "sam3_state_dict_to_variables"]


# ---------------------------------------------------------------------------
# shared attention (torch nn.MultiheadAttention twin with masks)
# ---------------------------------------------------------------------------


class MHA(nn.Module):
    """Batch-first multi-head attention with torch's packed in_proj layout
    (imports nn.MultiheadAttention weights verbatim) plus attn/key-padding
    masks. True in ``key_padding_mask`` = blocked (torch convention)."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, key_padding_mask=None):
        c, h = self.embed_dim, self.num_heads
        hd = c // h
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        wq, wk, wv = jnp.split(w_in, 3, axis=0)
        bq, bk, bv = jnp.split(b_in, 3)
        b = q.shape[0]

        def heads(x, w, bias):
            y = x @ w.T + bias
            return y.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q, wq, bq), heads(k, wk, bk), heads(v, wv, bv)
        logits = jnp.einsum("bhqc,bhkc->bhqk", qh, kh) / math.sqrt(hd)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                am = jnp.where(attn_mask, -jnp.inf, 0.0)
            else:
                am = attn_mask
            if am.ndim == 2:  # (L, S)
                am = am[None, None]
            elif am.ndim == 3:  # (B*h, L, S) torch layout
                am = am.reshape(b, h, am.shape[-2], am.shape[-1])
            logits = logits + am
        if key_padding_mask is not None:  # (B, S) True = pad
            logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = jnp.where(jnp.isnan(attn), 0.0, attn)  # fully-masked rows
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, c)
        w_out = self.param("out_proj_weight", nn.initializers.xavier_uniform(), (c, c))
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (c,))
        return out @ w_out.T + b_out


def gen_sineembed_for_position(pos: jnp.ndarray, num_feats: int = 256) -> jnp.ndarray:
    """Sine embedding of (B, nq, 2|4) coords (reference model_misc.py:141-199).
    Returns (B, nq, num_feats) for 2D, (B, nq, 2*num_feats) for 4D."""
    nf = num_feats // 2
    scale = 2 * math.pi
    dim_t = jnp.arange(nf, dtype=pos.dtype)
    dim_t = 10000 ** (2 * (dim_t // 2) / nf)

    def enc(v):
        p = v[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], -1
                         ).reshape(p.shape[:-1] + (-1,))

    parts = [enc(pos[..., 1]), enc(pos[..., 0])]  # (y, x)
    if pos.shape[-1] == 4:
        parts += [enc(pos[..., 2]), enc(pos[..., 3])]  # (w, h)
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# ViTDet trunk + dual neck
# ---------------------------------------------------------------------------


class ViTDetAttention(nn.Module):
    """ViTDet attention with 2d-RoPE (reference vitdet.py:41-215)."""

    dim: int
    num_heads: int
    input_size: tuple[int, int]  # (h, w) of the attended grid
    rope_pt_size: tuple[int, int] | None = None
    rope_interp: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hgt, wdt, _ = x.shape
        h, hd = self.num_heads, self.dim // self.num_heads
        l = hgt * wdt
        qkv = nn.Dense(3 * self.dim, name="qkv")(x).reshape(b, l, 3, h, hd)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]

        pt = self.rope_pt_size or self.input_size
        scale = pt[0] / self.input_size[0] if self.rope_interp else 1.0
        cos_np, sin_np = axial_rope_cos_sin(
            hd, self.input_size[1], self.input_size[0], scale_pos=scale)
        cos, sin = jnp.asarray(cos_np, q.dtype), jnp.asarray(sin_np, q.dtype)
        q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)

        attn = jax.nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, hgt, wdt, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class ViTDetBlock(nn.Module):
    """Pre-norm ViT block with optional windowing (vitdet.py:217-312).
    The MLP is timm's Mlp (fc1/fc2, GELU)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int  # 0 = global
    grid_size: tuple[int, int]
    rope_pt: int = 0  # the TRUNK window size: rope_pt_size for ALL blocks
    # (build_sam3 passes rope_pt_size=window_size unconditionally, so global
    # blocks interpolate rope by window/grid — vitdet.py:455-458)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            hh, ww = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)
            attn_size = (ws, ws)
        else:
            attn_size = self.grid_size
        x = ViTDetAttention(self.dim, self.num_heads, attn_size,
                            rope_pt_size=(self.rope_pt, self.rope_pt),
                            name="attn")(x)
        if ws > 0:
            x = window_unpartition(x, ws, pad_hw, (hh, ww))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class ViTDet(nn.Module):
    """Plain ViT backbone (ViTDet) with tiled abs pos + RoPE
    (reference vitdet.py:313-547). Returns the single final stride-14 map."""

    img_size: int = 1008
    pretrain_img_size: int = 336
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.625
    global_att_blocks: Sequence[int] = (7, 15, 23, 31)
    window_size: int = 24
    pretrain_use_cls_token: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", use_bias=False, name="patch_embed")(x)
        h, w = x.shape[1:3]

        # tiled absolute pos embed (get_abs_pos with tiling=True,
        # modules/utils.py:389-445); pretrain grid 24x24 (+cls dropped)
        n_pre = self.pretrain_img_size // self.patch_size
        n_pos = n_pre * n_pre + (1 if self.pretrain_use_cls_token else 0)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_pos, self.embed_dim))
        grid = pos[0, 1:] if self.pretrain_use_cls_token else pos[0]
        grid = grid.reshape(n_pre, n_pre, self.embed_dim)
        if (h, w) != (n_pre, n_pre):
            reps = (h // n_pre + 1, w // n_pre + 1)
            grid = jnp.tile(grid, (reps[0], reps[1], 1))[:h, :w]
        x = x + grid[None].astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.depth):
            ws = 0 if i in self.global_att_blocks else self.window_size
            x = ViTDetBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                            window_size=ws, grid_size=(h, w),
                            rope_pt=self.window_size,
                            name=f"blocks_{i}")(x)
        # ln_post is Identity in the SAM3 build (build_sam3.py:56)
        return x


class _NeckPath(nn.Module):
    """One scale path of the ViTDet SimpleFPN neck (necks.py:44-98)."""

    scale: float
    d_model: int
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from fce_yolo_tpu.nn.sam import _PixelShuffleUp

        if self.scale == 4.0:
            x = _PixelShuffleUp(self.dim // 2, name="dconv_2x2_0")(x)
            x = nn.gelu(x, approximate=False)
            x = _PixelShuffleUp(self.dim // 4, name="dconv_2x2_1")(x)
        elif self.scale == 2.0:
            x = _PixelShuffleUp(self.dim // 2, name="dconv_2x2")(x)
        elif self.scale == 0.5:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.d_model, (1, 1), name="conv_1x1")(x)
        return nn.Conv(self.d_model, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_3x3")(x)


class Sam3DualViTDetNeck(nn.Module):
    """SimpleFPN neck over the single trunk output, with an optional cloned
    SAM2 neck (necks.py:15-160). Returns ([feats fine->coarse], [pos])."""

    trunk_cfg: dict
    d_model: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    add_sam2_neck: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, branch: str = "sam3"):
        feat = ViTDet(**self.trunk_cfg, name="trunk")(x)
        dim = self.trunk_cfg.get("embed_dim", 1024)
        prefix = "convs" if branch == "sam3" else "sam2_convs"
        outs, poss = [], []
        for i, s in enumerate(self.scale_factors):
            f = _NeckPath(s, self.d_model, dim, name=f"{prefix}_{i}")(feat)
            outs.append(f)
            poss.append(jnp.asarray(
                sine_pos_embed(f.shape[1], f.shape[2], self.d_model), f.dtype))
        return outs, poss


# ---------------------------------------------------------------------------
# text encoder
# ---------------------------------------------------------------------------


class _ResidualAttentionBlock(nn.Module):
    """CLIP-style pre-norm block (text_encoder_ve.py:17-75)."""

    width: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask=None) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + MHA(self.width, self.heads, name="attn")(y, y, y, attn_mask=attn_mask)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(int(self.width * self.mlp_ratio), name="mlp_c_fc")(y)
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(self.width, name="mlp_c_proj")(y)


class VETextEncoder(nn.Module):
    """Causal text transformer + resizer to d_model
    (text_encoder_ve.py:145-307). Tokens come from the offline hash
    tokenizer — the architecture and weight layout match the reference."""

    d_model: int = 256
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 32
    vocab_size: int = 49408

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        """tokens (B, L) int32, 0 = pad. Returns (text_mask (B, L) True=pad,
        text_feats (B, L, d_model))."""
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        l = tokens.shape[1]
        x = emb[tokens] + pos[:l]
        causal = jnp.triu(jnp.full((l, l), -jnp.inf), k=1)
        for i in range(self.layers):
            x = _ResidualAttentionBlock(self.width, self.heads,
                                        name=f"resblocks_{i}")(x, attn_mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        x = nn.Dense(self.d_model, name="resizer")(x)
        return tokens == 0, x


# ---------------------------------------------------------------------------
# fusion encoder (GroundingDINO-style)
# ---------------------------------------------------------------------------


class FusionEncoderLayer(nn.Module):
    """Pre-norm self-attn + cross-attn + FFN (reference encoder.py
    TransformerEncoderLayer forward_pre:137-195). The fusion encoder runs it
    with pos_enc_at_attn=True over image tokens; the geometry encoder with
    pos_enc_at_cross_attn_keys=True over prompt tokens."""

    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 8
    pos_enc_at_attn: bool = True
    pos_enc_at_cross_attn_keys: bool = False

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, memory_pos=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None):
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        q = t2 + query_pos if (self.pos_enc_at_attn and query_pos is not None) else t2
        t2 = MHA(self.d_model, self.num_heads, name="self_attn")(
            q, q, t2, key_padding_mask=tgt_key_padding_mask)
        tgt = tgt + t2
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        k = memory + memory_pos if (self.pos_enc_at_cross_attn_keys
                                    and memory_pos is not None) else memory
        t2 = MHA(self.d_model, self.num_heads, name="cross_attn_image")(
            t2, k, memory, key_padding_mask=memory_key_padding_mask)
        tgt = tgt + t2
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        t2 = nn.Dense(self.d_model, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(t2)))
        return tgt + t2


class TransformerEncoderFusion(nn.Module):
    """Stack of fusion layers over the flattened single-level image tokens
    (encoder.py:253-500; num_feature_levels=1, no pooled-text add)."""

    d_model: int = 256
    num_layers: int = 6
    dim_feedforward: int = 2048
    num_heads: int = 8

    @nn.compact
    def __call__(self, src, pos, prompt, prompt_mask):
        """src/pos: (B, HW, C); prompt: (B, S, C); prompt_mask (B, S) True=pad.
        Returns encoded image tokens (B, HW, C)."""
        out = src
        for i in range(self.num_layers):
            out = FusionEncoderLayer(
                self.d_model, self.dim_feedforward, self.num_heads,
                name=f"layers_{i}",
            )(out, prompt, query_pos=pos, memory_key_padding_mask=prompt_mask)
        return out


# ---------------------------------------------------------------------------
# DETR decoder with box-relative position bias + presence token + DAC
# ---------------------------------------------------------------------------


class DecoderLayer(nn.Module):
    """Self-attn (presence token + DAC split) -> text cross-attn -> image
    cross-attn (boxRPB bias) -> FFN (reference decoder.py:23-180)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 8

    @nn.compact
    def __call__(self, tgt, query_pos, memory, memory_pos, text, text_mask,
                 cross_attn_bias, presence, dac: bool = True):
        """All batch-first. tgt (B, 2nq, C) when dac; presence (B, 1, C);
        cross_attn_bias (B, nh, 1+2nq, HW) additive."""
        nq2 = tgt.shape[1]
        if dac:
            nq = nq2 // 2
            o2o, o2m = tgt[:, :nq], tgt[:, nq:]
            qp_o2o = query_pos[:, :nq]
        else:
            o2o, o2m, qp_o2o = tgt, None, query_pos
        # presence token rides in front of the o2o queries (decoder.py:148-176)
        o2o = jnp.concatenate([presence, o2o], axis=1)
        qp = jnp.concatenate([jnp.zeros_like(presence), qp_o2o], axis=1)
        q = o2o + qp
        a = MHA(self.d_model, self.num_heads, name="self_attn")(q, q, o2o)
        o2o = o2o + a
        presence, o2o = o2o[:, :1], o2o[:, 1:]
        tgt = jnp.concatenate([o2o, o2m], axis=1) if dac else o2o
        # dac_use_selfatt_ln=True: one LN over the recombined queries;
        # the presence token is normalized alongside (it re-enters below)
        both = jnp.concatenate([presence, tgt], axis=1)
        both = nn.LayerNorm(epsilon=1e-5, name="norm2")(both)
        presence, tgt = both[:, :1], both[:, 1:]

        # text cross-attention (use_text_cross_attention=True)
        full = jnp.concatenate([presence, tgt], axis=1)
        full_pos = jnp.concatenate([jnp.zeros_like(presence), query_pos], axis=1)
        a = MHA(self.d_model, self.num_heads, name="ca_text")(
            full + full_pos, text, text, key_padding_mask=text_mask)
        full = full + a
        full = nn.LayerNorm(epsilon=1e-5, name="catext_norm")(full)

        # image cross-attention with the RPB additive bias
        a = MHA(self.d_model, self.num_heads, name="cross_attn")(
            full + full_pos, memory + memory_pos, memory,
            attn_mask=cross_attn_bias)
        full = full + a
        full = nn.LayerNorm(epsilon=1e-5, name="norm1")(full)

        y = nn.Dense(self.d_model, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(full)))
        full = full + y
        full = nn.LayerNorm(epsilon=1e-5, name="norm3")(full)
        return full[:, 1:], full[:, :1]


class TransformerDecoder(nn.Module):
    """Box-refining DETR decoder with presence token, DAC query duplication
    and log-boxRPB (reference decoder.py:183-546; build decoder flags)."""

    d_model: int = 256
    num_layers: int = 6
    num_queries: int = 200
    num_heads: int = 8
    dim_feedforward: int = 2048
    dac: bool = True

    @staticmethod
    def _rpb(boxes, feat_hw, embed_x, embed_y, num_heads):
        """Log-scale box-relative position bias (decoder.py:313-374).
        boxes (B, nq, 4) cxcywh sigmoid space -> (B, nh, nq, H*W)."""
        h, w = feat_hw
        cx, cy, bw, bh = [boxes[..., i] for i in range(4)]
        x1, y1, x2, y2 = cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2
        coords_h = jnp.arange(h, dtype=boxes.dtype) / h
        coords_w = jnp.arange(w, dtype=boxes.dtype) / w
        dy = coords_h[None, None, :, None] - jnp.stack([y1, y2], -1)[:, :, None, :]
        dx = coords_w[None, None, :, None] - jnp.stack([x1, x2], -1)[:, :, None, :]

        def logmap(d):
            d = d * 8
            return jnp.sign(d) * jnp.log2(jnp.abs(d) + 1.0) / math.log2(8)

        ex = embed_x(logmap(dx))  # (B, nq, W, nh)
        ey = embed_y(logmap(dy))  # (B, nq, H, nh)
        b_mat = ey[:, :, :, None, :] + ex[:, :, None, :, :]  # (B, nq, H, W, nh)
        return b_mat.reshape(b_mat.shape[0], b_mat.shape[1], h * w,
                             num_heads).transpose(0, 3, 1, 2)

    @nn.compact
    def __call__(self, memory, memory_pos, text, text_mask, feat_hw):
        """memory/(pos): (B, HW, C) encoded image tokens. Returns
        (hs (L, B, 2nq, C) normed, ref_boxes (L, B, 2nq, 4),
        presence_logits (L, B, 1))."""
        bs = memory.shape[0]
        nq = self.num_queries
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (nq, self.d_model))
        ref_points = self.param("reference_points", nn.initializers.normal(1.0),
                                (nq, 4))
        presence_tok = self.param("presence_token", nn.initializers.normal(1.0),
                                  (1, self.d_model))
        # shared (called every layer)
        ref_point_head = MLP(self.d_model, self.d_model, 2, name="ref_point_head")
        bbox_embed = MLP(self.d_model, 4, 3, name="bbox_embed")
        out_norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        p_norm = nn.LayerNorm(epsilon=1e-5, name="presence_token_out_norm")
        p_head = MLP(self.d_model, 1, 3, name="presence_token_head")
        rpb_x = MLP(self.d_model, self.num_heads, 2, name="boxRPB_embed_x")
        rpb_y = MLP(self.d_model, self.num_heads, 2, name="boxRPB_embed_y")

        tgt = jnp.broadcast_to(query_embed[None], (bs, nq, self.d_model))
        boxes = jax.nn.sigmoid(jnp.broadcast_to(ref_points[None], (bs, nq, 4)))
        if self.dac:  # duplicate queries: o2o half self-attends, o2m doesn't
            tgt = jnp.tile(tgt, (1, 2, 1))
            boxes = jnp.tile(boxes, (1, 2, 1))
        presence = jnp.broadcast_to(presence_tok[None], (bs, 1, self.d_model))

        hs_all, coords_all, presence_all = [], [], []
        for i in range(self.num_layers):
            sine = gen_sineembed_for_position(boxes, self.d_model)  # (B, 2nq, 2C)
            query_pos = ref_point_head(sine)
            bias = self._rpb(boxes, feat_hw, rpb_x, rpb_y, self.num_heads)
            bias = jnp.concatenate(  # presence row attends everywhere
                [jnp.zeros_like(bias[:, :, :1]), bias], axis=2)
            tgt, presence = DecoderLayer(
                self.d_model, self.dim_feedforward, self.num_heads,
                name=f"layers_{i}",
            )(tgt, query_pos, memory, memory_pos, text, text_mask, bias,
              presence, dac=self.dac)
            normed = out_norm(tgt)
            # box refinement off the normed output
            # (use_normed_output_consistently=True, decoder.py:497-501)
            delta = bbox_embed(normed)
            new_boxes = jax.nn.sigmoid(delta + _inverse_sigmoid(boxes))
            boxes = jax.lax.stop_gradient(new_boxes)
            # new_boxes IS the reference's outputs_coord for this layer:
            # sam3_image.py:232-238 recomputes sigmoid(inv_sig(ref_l) +
            # bbox_embed(hs_l)) with the same weights, which equals it
            coords_all.append(new_boxes)
            hs_all.append(normed)
            presence_all.append(p_head(p_norm(presence))[:, 0])
        return jnp.stack(hs_all), jnp.stack(coords_all), jnp.stack(presence_all)


def _inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Reference nn/modules/utils.py inverse_sigmoid: clamp to [0,1] then
    log(max(x,eps)/max(1-x,eps))."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.maximum(x, eps) / jnp.maximum(1.0 - x, eps))


# ---------------------------------------------------------------------------
# geometry (box exemplar) encoder
# ---------------------------------------------------------------------------


def roi_align(feat: jnp.ndarray, boxes_xyxy: jnp.ndarray, out_size: int = 7,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """Bilinear RoI-align over an NHWC map (torchvision roi_align,
    aligned=False). ``sampling_ratio`` is STATIC (torchvision's -1 resolves
    to ceil(bin) per-roi, which is data-dependent and unjittable; parity is
    exact for rois whose bin size is in (sampling_ratio-1, sampling_ratio]).

    feat: (B, H, W, C); boxes_xyxy: (B, N, 4) in feature-pixel units.
    Returns (B, N, out_size, out_size, C).
    """
    b, h, w, c = feat.shape
    n = boxes_xyxy.shape[1]
    x1, y1, x2, y2 = [boxes_xyxy[..., i] for i in range(4)]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w, bin_h = roi_w / out_size, roi_h / out_size
    s = sampling_ratio
    # sample grid: (out, s) offsets within each bin
    off = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s
    iy = y1[..., None, None] + (jnp.arange(out_size, dtype=feat.dtype)[:, None]
                                + off[None, :]) * bin_h[..., None, None]
    ix = x1[..., None, None] + (jnp.arange(out_size, dtype=feat.dtype)[:, None]
                                + off[None, :]) * bin_w[..., None, None]

    def bilinear(img, ys, xs):
        # torchvision: points with y < -1 or y > H contribute 0; others clamp
        oob = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
        ys = jnp.clip(ys, 0.0, h - 1)
        xs = jnp.clip(xs, 0.0, w - 1)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy, wx = ys - y0, xs - x0
        v00, v01 = img[y0, x0], img[y0, x1i]
        v10, v11 = img[y1i, x0], img[y1i, x1i]
        v = (v00 * ((1 - wy) * (1 - wx))[..., None]
             + v01 * ((1 - wy) * wx)[..., None]
             + v10 * (wy * (1 - wx))[..., None]
             + v11 * (wy * wx)[..., None])
        return jnp.where(oob[..., None], 0.0, v)

    def per_image(img, iy_i, ix_i):
        # iy_i/ix_i: (N, out, s); full grid (N, out, s, out, s)
        ys = jnp.broadcast_to(iy_i[:, :, :, None, None],
                              (n, out_size, s, out_size, s))
        xs = jnp.broadcast_to(ix_i[:, None, None, :, :],
                              (n, out_size, s, out_size, s))
        v = bilinear(img, ys, xs)  # (N, out, s, out, s, C)
        return v.mean(axis=(2, 4))  # (N, out, out, C)

    return jax.vmap(per_image)(feat, iy, ix)


class SequenceGeometryEncoder(nn.Module):
    """Encode box exemplars: direct xywh projection + RoI-pooled features +
    sine box pos enc, a CLS token, then transformer layers cross-attending
    the image (reference geometry_encoders.py:179-415; build flags
    boxes_direct_project/pool/pos_enc all True, add_cls, post prj)."""

    d_model: int = 256
    num_layers: int = 3
    dim_feedforward: int = 2048
    num_heads: int = 8
    roi_size: int = 7

    @nn.compact
    def __call__(self, boxes, boxes_mask, boxes_labels, img_feat, img_pos):
        """boxes (B, N, 4) normalized cxcywh; boxes_mask (B, N) True = pad;
        boxes_labels (B, N) {0 neg, 1 pos}; img_feat/img_pos (B, H, W, C).
        Returns (prompt (B, N+1, C), prompt_mask (B, N+1))."""
        b, n = boxes.shape[:2]
        h, w = img_feat.shape[1:3]
        label_embed = self.param("label_embed", nn.initializers.normal(1.0),
                                 (2, self.d_model))
        emb = nn.Dense(self.d_model, name="boxes_direct_project")(boxes)

        # RoI pooling path (img pre-norm -> align -> conv head)
        pre = nn.LayerNorm(epsilon=1e-5, name="img_pre_norm")(img_feat)
        cx, cy, bw, bh = [boxes[..., i] for i in range(4)]
        scale = jnp.asarray([w, h, w, h], boxes.dtype)
        xyxy = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1) * scale
        pooled = roi_align(pre, xyxy, self.roi_size)  # (B, N, 7, 7, C)
        # boxes_pool_project: Conv2d(C, C, 7) VALID == dense over the window
        pw = self.param("boxes_pool_project_kernel",
                        nn.initializers.lecun_normal(),
                        (self.roi_size, self.roi_size, self.d_model, self.d_model))
        pb = self.param("boxes_pool_project_bias", nn.initializers.zeros,
                        (self.d_model,))
        emb = emb + jnp.einsum("bnhwc,hwcd->bnd", pooled, pw) + pb

        # sine box positional encoding (PositionEmbeddingSine.encode_boxes:
        # cat(pos_y, pos_x, h, w) -> Linear)
        pe = _encode_box_sine(cx, cy, bw, bh, self.d_model)
        emb = emb + nn.Dense(self.d_model, name="boxes_pos_enc_project")(pe)

        emb = emb + label_embed[jnp.clip(boxes_labels, 0, 1)]

        cls = self.param("cls_embed", nn.initializers.normal(1.0),
                         (1, self.d_model))
        emb = jnp.concatenate(
            [emb, jnp.broadcast_to(cls[None], (b, 1, self.d_model))], axis=1)
        mask = jnp.concatenate(
            [boxes_mask, jnp.zeros((b, 1), boxes_mask.dtype)], axis=1)

        emb = nn.LayerNorm(epsilon=1e-5, name="norm")(
            nn.Dense(self.d_model, name="final_proj")(emb))

        img_tok = img_feat.reshape(b, h * w, self.d_model)
        pos_tok = jnp.broadcast_to(
            img_pos.reshape(-1, h * w, self.d_model), img_tok.shape)
        for i in range(self.num_layers):
            emb = FusionEncoderLayer(
                self.d_model, self.dim_feedforward, self.num_heads,
                pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
                name=f"encode_{i}",
            )(emb, img_tok, memory_pos=pos_tok, tgt_key_padding_mask=mask)
        emb = nn.LayerNorm(epsilon=1e-5, name="encode_norm")(emb)
        return emb, mask


def _encode_box_sine(cx, cy, w, h, num_pos_feats: int) -> jnp.ndarray:
    """PositionEmbeddingSine.encode_boxes (blocks.py:729-734):
    cat(pos_y(cy), pos_x(cx), h, w) with per-axis dim num_pos_feats//2."""
    npf = num_pos_feats // 2
    scale = 2 * math.pi
    dim_t = jnp.arange(npf, dtype=cx.dtype)
    dim_t = 10000 ** (2 * (dim_t // 2) / npf)

    def enc(v):
        p = (v * scale)[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], -1
                         ).reshape(p.shape[:-1] + (-1,))

    return jnp.concatenate([enc(cy), enc(cx), h[..., None], w[..., None]], -1)


# ---------------------------------------------------------------------------
# scoring + segmentation heads
# ---------------------------------------------------------------------------


class DotProductScoring(nn.Module):
    """Dot-product scores between queries and the mean-pooled prompt
    (reference model_misc.py:16-78; build uses a residual 2-layer prompt MLP
    with output LayerNorm)."""

    d_model: int = 256
    d_proj: int = 256
    mlp_hidden: int = 2048
    clamp_max_val: float = 12.0

    @nn.compact
    def __call__(self, hs, prompt, prompt_mask):
        """hs (L, B, nq, C); prompt (B, S, C); prompt_mask (B, S) True=pad."""
        # prompt_mlp: MLP(256, 2048, 256, 2, residual=True, out_norm=LN)
        y = nn.Dense(self.mlp_hidden, name="prompt_mlp_layers_0")(prompt)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, name="prompt_mlp_layers_1")(y)
        prompt = nn.LayerNorm(epsilon=1e-5, name="prompt_mlp_out_norm")(prompt + y)

        valid = (~prompt_mask).astype(prompt.dtype)[..., None]
        pooled = (prompt * valid).sum(1) / jnp.maximum(valid.sum(1), 1.0)
        pooled = nn.Dense(self.d_proj, name="prompt_proj")(pooled)  # (B, P)
        q = nn.Dense(self.d_proj, name="hs_proj")(hs)  # (L, B, nq, P)
        scores = jnp.einsum("lbqp,bp->lbq", q, pooled)[..., None]
        scores = scores / math.sqrt(self.d_proj)
        return jnp.clip(scores, -self.clamp_max_val, self.clamp_max_val)


class PixelDecoder(nn.Module):
    """FPN-style upsampler over backbone feats (maskformer_segmentation.py:
    143-189): top-down nearest upsample + conv + GroupNorm(8) + relu."""

    hidden_dim: int = 256
    num_upsampling_stages: int = 3

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> jnp.ndarray:
        prev = feats[-1]
        for li, f in enumerate(feats[:-1][::-1]):
            th, tw = f.shape[1:3]
            ph, pw = prev.shape[1:3]
            up = jnp.repeat(jnp.repeat(prev, th // ph, axis=1), tw // pw, axis=2)
            prev = f + up
            prev = nn.Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                           name=f"conv_layers_{li}")(prev)
            prev = nn.relu(nn.GroupNorm(num_groups=8, epsilon=1e-5,
                                        name=f"norms_{li}")(prev))
        return prev


class UniversalSegmentationHead(nn.Module):
    """Mask head: cross-attend encoder tokens to the prompt, pixel-decode,
    then hypernetwork mask prediction + semantic map
    (maskformer_segmentation.py:191-286)."""

    hidden_dim: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, backbone_feats, obj_queries, encoder_hidden_states,
                 prompt, prompt_mask, feat_hw):
        """backbone_feats: [s4, s8, s14] NHWC; obj_queries (B, nq, C) (last
        decoder layer); encoder_hidden_states (B, HW, C)."""
        t2 = nn.LayerNorm(epsilon=1e-5, name="cross_attn_norm")(encoder_hidden_states)
        t2 = MHA(self.hidden_dim, self.num_heads, name="cross_attend_prompt")(
            t2, prompt, prompt, key_padding_mask=prompt_mask)
        enc = t2 + encoder_hidden_states

        h, w = feat_hw
        b = enc.shape[0]
        feats = list(backbone_feats)
        feats[-1] = enc.reshape(b, h, w, self.hidden_dim)
        pixel = PixelDecoder(self.hidden_dim, name="pixel_decoder")(feats)

        inst = nn.Conv(self.hidden_dim, (1, 1), name="instance_seg_head")(pixel)
        sem = nn.Conv(1, (1, 1), name="semantic_seg_head")(pixel)
        # MaskPredictor: MLP on queries x instance embeddings
        q = MLP(self.hidden_dim, self.hidden_dim, 3,
                name="mask_predictor_mask_embed")(obj_queries)
        masks = jnp.einsum("bqc,bhwc->bqhw", q, inst)
        return {"pred_masks": masks, "semantic_seg": sem.transpose(0, 3, 1, 2)}


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class SAM3SemanticModel(nn.Module):
    """Concept-promptable detection + segmentation (reference
    sam3_image.py:30-333 + build_sam3.py wiring). Text and/or box-exemplar
    prompts -> per-query boxes, scores and masks.

    Method-dispatched stages:
      - encode_image: ViTDet + SAM3 neck -> [s4, s8, s14] feats + pos
      - encode_text:  tokens -> (mask, feats)
      - forward_grounding: feats + prompt -> boxes/scores/masks
    """

    # trunk (sam3 defaults; shrink for tests)
    img_size: int = 1008
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.625
    global_att_blocks: Sequence[int] = (7, 15, 23, 31)
    window_size: int = 24
    pretrain_img_size: int = 336
    # text
    text_width: int = 1024
    text_heads: int = 16
    text_layers: int = 24
    context_length: int = 32
    vocab_size: int = 49408
    # transformer
    d_model: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 200
    ffn_dim: int = 2048

    def setup(self):
        self.vision_backbone = Sam3DualViTDetNeck(
            trunk_cfg=dict(
                img_size=self.img_size, patch_size=self.patch_size,
                embed_dim=self.embed_dim, depth=self.depth,
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                global_att_blocks=tuple(self.global_att_blocks),
                window_size=self.window_size,
                pretrain_img_size=self.pretrain_img_size,
            ),
            d_model=self.d_model,
        )
        self.language_backbone = VETextEncoder(
            d_model=self.d_model, width=self.text_width, heads=self.text_heads,
            layers=self.text_layers, context_length=self.context_length,
            vocab_size=self.vocab_size)
        self.encoder = TransformerEncoderFusion(
            self.d_model, self.enc_layers, self.ffn_dim)
        self.decoder = TransformerDecoder(
            self.d_model, self.dec_layers, self.num_queries,
            dim_feedforward=self.ffn_dim)
        self.geometry_encoder = SequenceGeometryEncoder(
            self.d_model, dim_feedforward=self.ffn_dim)
        self.dot_prod_scoring = DotProductScoring(
            self.d_model, self.d_model, mlp_hidden=self.ffn_dim)
        self.segmentation_head = UniversalSegmentationHead(self.d_model)

    def encode_image(self, x: jnp.ndarray):
        """VL backbone image side, scalp=1 drops the coarsest level
        (vl_combiner.py:76-108)."""
        feats, pos = self.vision_backbone(x)
        return {"backbone_fpn": feats[:-1], "vision_pos_enc": pos[:-1]}

    def encode_text(self, tokens: jnp.ndarray):
        return self.language_backbone(tokens)

    def forward_grounding(self, backbone_out: dict, text_mask, text_feats,
                          geo_boxes=None, geo_mask=None, geo_labels=None):
        """Text (+ optional box exemplars) -> detection/segmentation outputs
        (sam3_image.py:285-333)."""
        feats = backbone_out["backbone_fpn"]
        pos = backbone_out["vision_pos_enc"]
        f16, p16 = feats[-1], pos[-1]
        b, h, w, c = f16.shape

        # geometry prompt (always runs so the param tree is total; an empty
        # all-padded box set contributes only the CLS token, masked rows die
        # in attention)
        if geo_boxes is None:
            geo_boxes = jnp.zeros((b, 1, 4), f16.dtype)
            geo_mask = jnp.ones((b, 1), bool)
            geo_labels = jnp.ones((b, 1), jnp.int32)
        geo_feats, geo_m = self.geometry_encoder(
            geo_boxes, geo_mask, geo_labels, f16,
            jnp.broadcast_to(p16[None] if p16.ndim == 3 else p16, f16.shape))

        prompt = jnp.concatenate([text_feats, geo_feats], axis=1)
        prompt_mask = jnp.concatenate([text_mask, geo_m], axis=1)

        src = f16.reshape(b, h * w, c)
        pos_t = jnp.broadcast_to(
            p16.reshape(-1, h * w, c), src.shape)
        memory = self.encoder(src, pos_t, prompt, prompt_mask)

        hs, coords, presence = self.decoder(
            memory, pos_t, prompt, prompt_mask, (h, w))

        # scores + boxes (sam3_image.py:217-255; joint supervision off;
        # coords ARE the per-layer bbox_embed refinements — see decoder)
        scores = self.dot_prod_scoring(hs, prompt, prompt_mask)
        nq = self.num_queries
        out = {
            "pred_logits": scores[-1, :, :nq],
            "pred_boxes": coords[-1, :, :nq],
            "presence_logit_dec": presence[-1],
            "aux_logits": scores[:-1, :, :, 0],
            "aux_boxes": coords[:-1],
        }
        seg = self.segmentation_head(
            feats, hs[-1], memory, prompt, prompt_mask, (h, w))
        out["pred_masks"] = seg["pred_masks"][:, :nq]
        out["semantic_seg"] = seg["semantic_seg"]
        return out

    def __call__(self, x: jnp.ndarray, tokens: jnp.ndarray,
                 geo_boxes=None, geo_mask=None, geo_labels=None):
        backbone_out = self.encode_image(x)
        text_mask, text_feats = self.encode_text(tokens)
        return self.forward_grounding(backbone_out, text_mask, text_feats,
                                      geo_boxes, geo_mask, geo_labels)


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------

_EMBED_LEAVES = {  # torch nn.Embedding/Parameter tables imported verbatim
    "query_embed", "reference_points", "presence_token", "label_embed",
    "cls_embed", "token_embedding", "positional_embedding", "pos_embed",
}
_MHA_NAMES = {"self_attn", "cross_attn_image", "cross_attn", "ca_text",
              "attn", "cross_attend_prompt"}


def sam3_state_dict_to_variables(sd: dict[str, Any]) -> dict:
    """Map a reference SAM3SemanticModel state_dict to flax variables for
    :class:`SAM3SemanticModel` (name rewrite + layout transposes; see
    sam_state_dict_to_variables for the conventions)."""
    params: dict[str, Any] = {}

    def put(path, value):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = jnp.asarray(value)

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, val in sd.items():
        if "text_projection" in key or key.endswith("attn_mask"):
            continue  # dead weights / buffers (tokens are pre-projection)
        v = to_np(val)
        parts = key.split(".")
        # structural strips: backbone. / encoder wrapper / transformer wrapper
        out: list[str] = []
        i = 0
        while i < len(parts):
            t = parts[i]
            nxt = parts[i + 1] if i + 1 < len(parts) else None
            if t == "backbone" and nxt in ("vision_backbone", "language_backbone"):
                i += 1
                continue
            if t == "language_backbone" and nxt == "encoder":
                out.append(t)
                i += 2
                continue
            if t == "transformer" and nxt in ("encoder", "decoder", "resblocks"):
                if nxt == "resblocks":
                    i += 1  # text transformer wrapper
                    continue
                i += 1
                continue
            if t == "patch_embed" and nxt == "proj":
                out.append(t)
                i += 2
                continue
            if t == "mask_predictor" and nxt == "mask_embed":
                out.append("mask_predictor_mask_embed")
                i += 2
                continue
            if t == "prompt_mlp" and nxt in ("layers", "out_norm"):
                if nxt == "out_norm":
                    out.append("prompt_mlp_out_norm")
                    i += 2
                else:
                    out.append(f"prompt_mlp_layers_{parts[i + 2]}")
                    i += 3
                continue
            if t == "mlp" and nxt in ("fc1", "fc2", "c_fc", "c_proj"):
                out.append(f"mlp_{nxt}")
                i += 2
                continue
            if t in ("convs", "sam2_convs", "encode", "resblocks") and nxt and nxt.isdigit():
                out.append(f"{t}_{nxt}")
                i += 2
                continue
            if t.isdigit() and out:
                out[-1] = f"{out[-1]}_{t}"
                i += 1
                continue
            out.append(t)
            i += 1
        leaf, body = out[-1], out[:-1]

        # embeddings / verbatim tables
        if leaf == "weight" and body and body[-1] in _EMBED_LEAVES:
            put(body, v)
            continue
        if leaf in _EMBED_LEAVES:
            put(body + [leaf], v)
            continue
        # MHA packed projections
        if leaf in ("in_proj_weight", "in_proj_bias"):
            put(body + [leaf], v)
            continue
        if body and body[-1] == "out_proj" and len(body) >= 2 and body[-2] in _MHA_NAMES:
            put(body[:-1] + [f"out_proj_{leaf}"], v)
            continue
        # ConvTranspose2d neck deconvs -> _PixelShuffleUp verbatim
        if body and body[-1].startswith("dconv_2x2"):
            put(body + ["kernel" if leaf == "weight" else "bias"], v)
            continue
        # geometry RoI-pool conv head -> custom einsum kernel
        if body and body[-1] == "boxes_pool_project":
            if leaf == "weight":
                put(body[:-1] + ["boxes_pool_project_kernel"], v.transpose(2, 3, 1, 0))
            else:
                put(body[:-1] + ["boxes_pool_project_bias"], v)
            continue

        if leaf == "weight":
            if v.ndim == 4:
                put(body + ["kernel"], v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:
                put(body + ["kernel"], v.T)
            else:
                put(body + ["scale"], v)
        elif leaf == "bias":
            put(body + ["bias"], v)
        else:
            put(body + [leaf], v)
    return {"params": params}


# ---------------------------------------------------------------------------
# SAM3 video tracker (SAM2 memory machinery over the ViTDet trunk)
# ---------------------------------------------------------------------------


class SAM3TrackerModel(SAM2Model):
    """SAM3 interactive video tracker (reference sam.py:1026-1160 SAM3Model,
    wiring build_sam3.py:258-343): the SAM2 streaming-memory machinery driven
    by the ViTDet trunk's cloned SAM2 neck (``forward_image_sam2``,
    vl_combiner.py:110-129), image_size 1008 / stride 14 (72-token grid),
    with the sam2.1-era refinements SAM3 enables:

      - signed + PROJECTED temporal pos enc on object pointers
        (use_signed_tpos_enc_to_obj_ptrs + proj_tpos_enc_in_obj_ptrs,
        sam.py:725-753): sine pe at d_model then a Dense to mem_dim;
      - a no-object spatial embedding added to memories of occluded frames
        (no_obj_embed_spatial, sam.py:829-833);
      - mask resize to stride*16/14 before the memory downsampler
        (MaskDownSampler.interpol_size, blocks.py:116-123).

    Everything else (fixed-capacity memory bank, masked attention, RoPE at
    the 72x72 grid) is inherited from :class:`SAM2Model`.
    """

    image_size: int = 1008
    backbone_stride: int = 14
    trunk_cfg: Any = None

    def setup(self):
        tc = self.trunk_cfg or dict(
            img_size=self.image_size, patch_size=14, embed_dim=1024,
            depth=32, num_heads=16, mlp_ratio=4.625,
            global_att_blocks=(7, 15, 23, 31), window_size=24,
            pretrain_img_size=336)
        self.vision_backbone = Sam3DualViTDetNeck(
            trunk_cfg=tc, d_model=self.d_model, add_sam2_neck=True)
        self.memory_attention = MemoryAttention(
            self.d_model, num_layers=self.mem_attn_layers,
            dim_feedforward=self.mem_ffn, mem_dim=self.mem_dim)
        grid = self.image_size // self.backbone_stride
        self.memory_encoder = SAM2MemoryEncoder(
            out_dim=self.mem_dim, in_dim=self.d_model,
            interpol_size=(grid * 16, grid * 16))
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.d_model,
            input_image_size=(self.image_size, self.image_size),
            image_embedding_size=(grid, grid),
        )
        self.sam_mask_decoder = SAM2MaskDecoder(transformer_dim=self.d_model)
        self.conv_s0 = nn.Conv(self.d_model // 8, (1, 1))
        self.conv_s1 = nn.Conv(self.d_model // 4, (1, 1))
        self.obj_ptr_proj = MLP(self.d_model, self.d_model, 3)
        self.obj_ptr_tpos_proj = nn.Dense(self.mem_dim)
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (self.num_maskmem, 1, 1, self.mem_dim))
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, self.d_model))
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.normal(0.02), (1, 1, self.d_model))
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.normal(0.02), (1, self.d_model))
        self.no_obj_embed_spatial = self.param(
            "no_obj_embed_spatial", nn.initializers.normal(0.02),
            (1, self.mem_dim))

    def encode_image(self, x: jnp.ndarray) -> dict:
        """forward_image_sam2 (vl_combiner.py:110-129) + the decoder's
        high-res skip projections (SAM3Model.forward_image, sam.py:1124-1132).
        scalp=1 drops the coarsest of the 4 SimpleFPN levels -> [s~4, s~8,
        s14] in trunk-stride units (288/144/72 at 1008 px)."""
        feats, poss = self.vision_backbone(x, branch="sam2")
        feats, poss = list(feats[:-1]), list(poss[:-1])
        feats[0] = self.conv_s0(feats[0])
        feats[1] = self.conv_s1(feats[1])
        return {"backbone_fpn": feats, "vision_pos_enc": poss}

    def tpos_embed_obj_ptrs(self, t_diffs: jnp.ndarray,
                            t_max: jnp.ndarray | float) -> jnp.ndarray:
        """Signed temporal sine embedding at d_model, projected to mem_dim
        (proj_tpos_enc_in_obj_ptrs=True, sam.py:749-753). ``t_diffs`` carries
        sign when tracking in reverse (use_signed_tpos_enc_to_obj_ptrs)."""
        pe = get_1d_sine_pe(t_diffs / t_max, dim=self.d_model)
        return self.obj_ptr_tpos_proj(pe)

    def encode_memory(self, feat_s16, high_res_masks, obj_score_logits=None):
        """_encode_new_memory + the no-object spatial embedding for occluded
        frames (sam.py:827-833)."""
        if high_res_masks.ndim == 4 and high_res_masks.shape[1] == 1:
            high_res_masks = high_res_masks[:, 0, :, :, None]
        mask_for_mem = jax.nn.sigmoid(high_res_masks)
        mask_for_mem = mask_for_mem * self.sigmoid_scale_for_mem_enc \
            + self.sigmoid_bias_for_mem_enc
        feats, pos = self.memory_encoder(feat_s16, mask_for_mem,
                                         skip_mask_sigmoid=True)
        if obj_score_logits is not None:
            is_obj = (obj_score_logits > 0).astype(feats.dtype)  # (B, 1)
            feats = feats + (1.0 - is_obj)[:, :, None, None] \
                * self.no_obj_embed_spatial[0]
        return feats, pos

    def init_all(self, x: jnp.ndarray):
        cond = SAM2Model.init_all(self, x)
        self.tpos_embed_obj_ptrs(jnp.zeros((2,), jnp.float32), 15.0)
        return cond

    # --- multi-object postprocessing (SAM3Model._suppress_* , sam.py:1139-1160)
    @staticmethod
    def apply_non_overlapping_constraints(pred_masks: jnp.ndarray) -> jnp.ndarray:
        """Keep each pixel only for the object with the highest mask logit
        (SAM2Model._apply_non_overlapping_constraints): losers are clamped to
        <= -10. pred_masks: (N_obj, 1, H, W)."""
        best = jnp.argmax(pred_masks, axis=0, keepdims=True)
        keep = jnp.arange(pred_masks.shape[0])[:, None, None, None] == best
        return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))

    @staticmethod
    def suppress_shrinked_masks(pred_masks: jnp.ndarray,
                                new_pred_masks: jnp.ndarray,
                                shrink_threshold: float = 0.3) -> jnp.ndarray:
        """Fully suppress masks whose area shrank by > (1-threshold) under
        the pixelwise non-overlap constraint (SAM3Model, sam.py:1140-1151)."""
        area_before = jnp.clip((pred_masks > 0).sum(axis=(-1, -2)), min=1.0)
        area_after = (new_pred_masks > 0).sum(axis=(-1, -2))
        keep = (area_after / area_before) >= shrink_threshold
        return jnp.where(keep[..., None, None], pred_masks,
                         jnp.clip(pred_masks, max=-10.0))

    @classmethod
    def suppress_object_pw_area_shrinkage(cls, pred_masks: jnp.ndarray) -> jnp.ndarray:
        """Pixelwise non-overlap, then kill high-shrinkage (noisy) masks
        (SAM3Model._suppress_object_pw_area_shrinkage, sam.py:1153-1160)."""
        non_overlap = cls.apply_non_overlapping_constraints(pred_masks)
        return cls.suppress_shrinked_masks(pred_masks, non_overlap)


def sam3_tracker_state_dict_to_variables(sd: dict[str, Any]) -> dict:
    """Map a reference SAM3Model (video tracker) state_dict to flax variables
    for :class:`SAM3TrackerModel`.

    The encoder subtree (``image_encoder.vision_backbone.*``) follows the
    semantic model's ViTDet conventions; everything else is SAM2Model
    machinery. The tracker only runs the SAM2 branch of the dual neck
    (forward_image_sam2), so the SAM3-branch ``convs.*`` weights are skipped.
    """
    from fce_yolo_tpu.nn.sam2 import sam2_state_dict_to_variables

    enc_sd, rest_sd = {}, {}
    for k, v in sd.items():
        if k.startswith("image_encoder.vision_backbone."):
            sub = k[len("image_encoder.vision_backbone."):]
            if sub.startswith("convs."):
                continue
            enc_sd["backbone.vision_backbone." + sub] = v
        elif k.startswith("image_encoder."):
            continue  # language_backbone is None in the tracker build
        else:
            rest_sd[k] = v
    params = sam2_state_dict_to_variables(rest_sd)["params"]
    params.update(sam3_state_dict_to_variables(enc_sd)["params"])
    return {"params": params}

"""SAM2 (Segment Anything 2) — TPU-native flax modules with streaming-video
memory attention.

Parity targets (reference, random-weight activation parity tested in
tests/test_sam2.py):
  - Hiera trunk            models/sam/modules/encoders.py:617-794 +
                           blocks.py MultiScaleBlock:550-662 / MultiScaleAttention:471-548
  - FpnNeck / ImageEncoder encoders.py:413-616
  - MemoryEncoder          encoders.py:333-411 (+ MaskDownSampler blocks.py:53-125,
                           CXBlock:127-211, Fuser:212-258)
  - MemoryAttention(Layer) memory_attention.py:13-298
  - RoPEAttention          blocks.py:380-455 (+ utils.py compute_axial_cis:119-149,
                           apply_rotary_enc:175-223)
  - SAM2MaskDecoder        decoders.py:170-495
  - SAM2Model              sam.py:91-1160 (_forward_sam_heads:404-553,
                           _prepare_memory_conditioned_features:637-792,
                           _encode_new_memory:794-836, track_step:919-981)

TPU re-design notes:
  - NHWC end to end; Hiera is already channels-last internally, so the torch
    permute round-trips around pooling/FPN vanish.
  - RoPE is real-valued cos/sin rotation precomputed at trace time from the
    STATIC token grid — no runtime freq recompute, no complex dtype.
  - The memory bank is a FIXED-CAPACITY tensor (num_maskmem spatial slots +
    max_obj_ptrs pointer tokens) with a validity mask lowered into the
    attention logits. The reference concatenates a python list of variable
    length (sam.py:780) and would recompile per frame count under jit; here
    every video frame after the first runs ONE compiled program.
  - Bicubic pos-embed interpolation (Hiera._get_pos_embed, encoders.py:771)
    is two static interpolation matrices (torch a=-0.75 half-pixel cubic)
    applied as einsums — exact to the reference and differentiable.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fce_yolo_tpu.nn.sam import (
    MLP,
    LayerNorm2d,
    PromptEncoder,
    TwoWayTransformer,
    _PixelShuffleUp,
    window_partition,
    window_unpartition,
)

NO_OBJ_SCORE = -1024.0  # reference sam.py:22


# ---------------------------------------------------------------------------
# static positional encodings (pure numpy at trace time)
# ---------------------------------------------------------------------------


def sine_pos_embed(h: int, w: int, num_pos_feats: int = 256,
                   temperature: int = 10000) -> np.ndarray:
    """PositionEmbeddingSine.forward (blocks.py:664-776), normalized variant.
    Returns (h, w, num_pos_feats) with channel order [y-feats | x-feats]."""
    npf = num_pos_feats // 2
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([py, px], -1)


def get_1d_sine_pe(pos: jnp.ndarray, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """1D sine embedding for object-pointer temporal positions
    (reference utils.py:64-86)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch bicubic convolution kernel (a=-0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False) with border clamp."""
    scale = n_in / n_out
    out = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = math.floor(x)
        for t in range(-1, 3):
            idx = min(max(x0 + t, 0), n_in - 1)
            out[i, idx] += _cubic_kernel(np.float64(x - (x0 + t)))
    return out


# ---------------------------------------------------------------------------
# RoPE attention
# ---------------------------------------------------------------------------


def axial_rope_cos_sin(head_dim: int, w: int, h: int, theta: float = 10000.0,
                       scale_pos: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Real form of compute_axial_cis (utils.py:119-149): (h*w, head_dim//2)
    angles — first head_dim//4 from x (fast axis), rest from y. ``scale_pos``
    rescales coordinates (SAM3 ViTDet rope interpolation, vitdet.py:141)."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[: head_dim // 4].astype(np.float32) / head_dim))
    t = np.arange(w * h, dtype=np.float32)
    tx, ty = (t % w) * scale_pos, (t // w) * scale_pos
    ang = np.concatenate([np.outer(tx, freqs), np.outer(ty, freqs)], -1)  # (HW, hd/2)
    return np.cos(ang), np.sin(ang)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate consecutive feature pairs of (B, nh, N, hd) by the (N, hd/2)
    angle grids (reference apply_rotary_enc, utils.py:175-223)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    xr = x1 * cos - x2 * sin
    xi = x1 * sin + x2 * cos
    return jnp.stack([xr, xi], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    """Attention with rotary position encoding on the token grid
    (reference blocks.py:380-455). ``kv_in_dim`` supports the 64-ch memory
    keys; ``num_k_exclude_rope`` skips the trailing object-pointer tokens;
    ``key_mask`` (B, S) lowers memory-slot validity into the logits (the
    fixed-capacity TPU memory bank — see module docstring)."""

    embedding_dim: int
    num_heads: int = 1
    downsample_rate: int = 1
    kv_in_dim: int | None = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False

    @nn.compact
    def __call__(self, q, k, v, q_hw: tuple[int, int],
                 num_k_exclude_rope: int = 0,
                 key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        d = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = d // nh
        b, nq, _ = q.shape
        q = nn.Dense(d, name="q_proj")(q)
        k = nn.Dense(d, name="k_proj")(k)
        v = nn.Dense(d, name="v_proj")(v)
        q = q.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        w_, h_ = q_hw
        cos_np, sin_np = axial_rope_cos_sin(hd, w_, h_, self.rope_theta)
        cos, sin = jnp.asarray(cos_np, q.dtype), jnp.asarray(sin_np, q.dtype)
        nk = k.shape[2]
        num_k_rope = nk - num_k_exclude_rope
        q = _apply_rope(q, cos, sin)
        if num_k_rope > 0:
            r = num_k_rope // nq
            if r > 1:
                assert self.rope_k_repeat and r * nq == num_k_rope
                cos_k, sin_k = jnp.tile(cos, (r, 1)), jnp.tile(sin, (r, 1))
            else:
                cos_k, sin_k = cos[:num_k_rope], sin[:num_k_rope]
            k = jnp.concatenate(
                [_apply_rope(k[:, :, :num_k_rope], cos_k, sin_k), k[:, :, num_k_rope:]],
                axis=2,
            )

        logits = jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, d)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------


class MemoryAttentionLayer(nn.Module):
    """Self-attn (RoPE) + cross-attn to memories (RoPE, 64-ch kv) + FFN
    (reference memory_attention.py:13-169). Pre-norm; eval-time (dropout 0)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    mem_dim: int = 64
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, q_hw,
                 num_k_exclude_rope: int = 0, key_mask=None):
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        q = t2 + query_pos if self.pos_enc_at_attn else t2
        t2 = RoPEAttention(self.d_model, num_heads=1, name="self_attn")(
            q, q, t2, q_hw=q_hw)
        tgt = tgt + t2

        t2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        t2 = RoPEAttention(
            self.d_model, num_heads=1, kv_in_dim=self.mem_dim,
            rope_k_repeat=True, name="cross_attn_image",
        )(
            t2 + query_pos if self.pos_enc_at_cross_attn_queries else t2,
            memory + pos if self.pos_enc_at_cross_attn_keys else memory,
            memory,
            q_hw=q_hw,
            num_k_exclude_rope=num_k_exclude_rope,
            key_mask=key_mask,
        )
        tgt = tgt + t2

        t2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        t2 = nn.Dense(self.d_model, name="linear2")(
            nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(t2)))
        return tgt + t2


class MemoryAttention(nn.Module):
    """Stack of memory-attention layers (memory_attention.py:171-298)."""

    d_model: int = 256
    num_layers: int = 4
    dim_feedforward: int = 2048
    mem_dim: int = 64
    pos_enc_at_input: bool = True

    @nn.compact
    def __call__(self, curr, memory, curr_pos, memory_pos, q_hw,
                 num_obj_ptr_tokens: int = 0, key_mask=None):
        out = curr
        if self.pos_enc_at_input and curr_pos is not None:
            out = out + 0.1 * curr_pos
        for i in range(self.num_layers):
            out = MemoryAttentionLayer(
                self.d_model, self.dim_feedforward, mem_dim=self.mem_dim,
                name=f"layers_{i}",
            )(out, memory, memory_pos, curr_pos, q_hw,
              num_k_exclude_rope=num_obj_ptr_tokens, key_mask=key_mask)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out)


# ---------------------------------------------------------------------------
# Hiera trunk + FPN neck
# ---------------------------------------------------------------------------


class MultiScaleAttention(nn.Module):
    """Windowed/global attention with optional 2x2 query max-pool
    (reference blocks.py:471-548)."""

    dim: int
    dim_out: int
    num_heads: int
    q_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        nh = self.num_heads
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x).reshape(b, h * w, 3, nh, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = q.reshape(b, h, w, -1)
            q = nn.max_pool(q, (2, 2), strides=(2, 2))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, nh, -1)
        hd = self.dim_out // nh
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: window partition + attention (+q-pool at stage shifts)
    + MLP (reference blocks.py:550-662)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: bool = False  # 2x2 maxpool stage shift
    window_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim != self.dim_out:
            s = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_stride:
                s = nn.max_pool(s, (2, 2), strides=(2, 2))
            shortcut = s

        ws = self.window_size
        if ws > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)

        x = MultiScaleAttention(
            self.dim, self.dim_out, self.num_heads, q_pool=self.q_stride, name="attn"
        )(x)
        if self.q_stride:
            ws = self.window_size // 2
            h, w = shortcut.shape[1:3]
            pad_hw = (h + (ws - h % ws) % ws if ws else h,
                      w + (ws - w % ws) % ws if ws else w)
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (h, w))

        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLP(int(self.dim_out * self.mlp_ratio), self.dim_out, 2,
                act="gelu", name="mlp")(y)
        return x + y


class Hiera(nn.Module):
    """Hierarchical ViT trunk (reference encoders.py:617-794). Returns the
    four stage outputs fine -> coarse, NHWC."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (2, 3, 16, 3)
    q_pool: int = 3
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: tuple[int, int] = (14, 14)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    global_att_blocks: Sequence[int] = (12, 16, 20)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]

        x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4),
                    padding=((3, 3), (3, 3)), name="patch_embed")(x)
        h, w = x.shape[1:3]

        # windowed pos embed (encoders.py:771-778): bicubic-resized background
        # + tiled window embed, as two static einsum matrices
        bh, bw = self.window_pos_embed_bkg_spatial_size
        ws0 = self.window_spec[0]
        pos_bkg = self.param("pos_embed", nn.initializers.zeros,
                             (1, self.embed_dim, bh, bw))
        pos_win = self.param("pos_embed_window", nn.initializers.zeros,
                             (1, self.embed_dim, ws0, ws0))
        ah = jnp.asarray(bicubic_matrix(bh, h))
        aw = jnp.asarray(bicubic_matrix(bw, w))
        pe = jnp.einsum("Hh,ichw,Ww->icHW", ah, pos_bkg.astype(jnp.float32), aw)
        pe = pe + jnp.tile(pos_win, (1, 1, h // ws0, w // ws0))
        x = x + pe[0].transpose(1, 2, 0).astype(x.dtype)

        outputs = []
        dim, heads = self.embed_dim, self.num_heads
        cur_stage = 1
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if self.global_att_blocks is not None and i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim, dim_out, heads, q_stride=(i in q_pool_blocks),
                window_size=window_size, name=f"blocks_{i}",
            )(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs


class FpnNeck(nn.Module):
    """FPN neck with nearest top-down fusion on the coarse levels
    (reference encoders.py:563-616). Input fine -> coarse; output
    [(feat, pos)] in the same order."""

    d_model: int = 256
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)  # coarse->fine
    fpn_top_down_levels: Sequence[int] = (2, 3)

    @nn.compact
    def __call__(self, xs: list[jnp.ndarray]):
        n = len(xs) - 1
        out: list[Any] = [None] * len(xs)
        pos: list[Any] = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), name=f"convs_{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)  # nearest 2x
                prev = lateral + up.astype(lateral.dtype)
            else:
                prev = lateral
            out[i] = prev
            pos[i] = jnp.asarray(
                sine_pos_embed(prev.shape[1], prev.shape[2], self.d_model),
                prev.dtype,
            )
        return out, pos


class ImageEncoder(nn.Module):
    """Hiera trunk + FPN neck, scalp drops the coarsest level
    (reference encoders.py:413-490)."""

    trunk_cfg: dict
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    d_model: int = 256
    scalp: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = Hiera(**self.trunk_cfg, name="trunk")(x)
        out, pos = FpnNeck(self.d_model, self.backbone_channel_list, name="neck")(feats)
        if self.scalp > 0:
            out, pos = out[: -self.scalp], pos[: -self.scalp]
        return {"backbone_fpn": out, "vision_pos_enc": pos}


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------


class MaskDownSampler(nn.Module):
    """4x stride-2 conv/LN/GELU pyramid + 1x1 head (blocks.py:53-125).
    Channel ladder 1 -> 4 -> 16 -> 64 -> 256 -> embed_dim.

    ``interpol_size``: optional pre-resize of the mask before the conv
    pyramid (blocks.py:106-123) — SAM3's stride-14 trunk feeds 1008-px masks
    that must land on the 72-token grid, so they are first resized to
    1152 = 1008/14*16 (bilinear; SAM3 only ever upsamples here, where
    torch's antialias flag is inert)."""

    embed_dim: int = 256
    total_stride: int = 16
    interpol_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.interpol_size is not None and \
                tuple(x.shape[1:3]) != tuple(self.interpol_size):
            b, _, _, c = x.shape
            x = jax.image.resize(
                x.astype(jnp.float32),
                (b, self.interpol_size[0], self.interpol_size[1], c),
                "bilinear").astype(x.dtype)
        num_layers = int(math.log2(self.total_stride))
        cin = 1
        for li in range(num_layers):
            cout = cin * 4
            x = nn.Conv(cout, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"encoder_{3 * li}")(x)
            x = LayerNorm2d(cout, name=f"encoder_{3 * li + 1}")(x)
            x = nn.gelu(x, approximate=False)
            cin = cout
        return nn.Conv(self.embed_dim, (1, 1), name=f"encoder_{3 * num_layers}")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (blocks.py:127-211): 7x7 depthwise + LN + 4x MLP with
    layer scale, residual."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, name="dwconv")(x)
        x = LayerNorm2d(self.dim, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return inp + gamma * x


class MemoryEncoder(nn.Module):
    """Fuse pixel features + predicted mask into a compact 64-ch memory
    (reference encoders.py:333-411)."""

    out_dim: int = 64
    in_dim: int = 256
    interpol_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, pix_feat: jnp.ndarray, masks: jnp.ndarray,
                 skip_mask_sigmoid: bool = False):
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(self.in_dim, interpol_size=self.interpol_size,
                                name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), name="pix_feat_proj")(pix_feat)
        x = x + masks
        for i in range(2):
            x = CXBlock(self.in_dim, name=f"fuser_layers_{i}")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), name="out_proj")(x)
        pos = jnp.asarray(sine_pos_embed(x.shape[1], x.shape[2], self.out_dim), x.dtype)
        return x, pos


# ---------------------------------------------------------------------------
# SAM2 mask decoder
# ---------------------------------------------------------------------------


class SAM2MaskDecoder(nn.Module):
    """SAM2 decoder: obj-score token, sigmoid IoU head, high-res skip
    features, dynamic multimask stability (reference decoders.py:170-495)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    def _stability(self, logits: jnp.ndarray) -> jnp.ndarray:
        f = logits.reshape(logits.shape[:-2] + (-1,))
        d = self.dynamic_multimask_stability_delta
        ai = (f > d).sum(-1).astype(jnp.float32)
        au = (f > -d).sum(-1).astype(jnp.float32)
        return jnp.where(au > 0, ai / au, 1.0)

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool, high_res_features=None):
        nt = self.num_mask_tokens
        td = self.transformer_dim
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, td))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nt, td))
        toks = [iou_token, mask_tokens]
        s = 0
        if self.pred_obj_scores:
            obj_token = self.param("obj_score_token", nn.initializers.normal(1.0), (1, td))
            toks = [obj_token] + toks
            s = 1
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate(toks, axis=0)[None], (b, s + 1 + nt, td))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = jnp.broadcast_to(image_embeddings, (b,) + image_embeddings.shape[1:]) \
            + dense_prompt
        h, w = src.shape[1], src.shape[2]
        hs, src = TwoWayTransformer(
            depth=2, embedding_dim=td, num_heads=8, mlp_dim=2048, name="transformer"
        )(src, image_pe, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1: s + 1 + nt]

        src = src.reshape(b, h, w, td)
        x = _PixelShuffleUp(td // 4, name="output_upscaling_0")(src)
        if self.use_high_res_features and high_res_features is not None:
            feat_s0, feat_s1 = high_res_features  # stride4 (td//8), stride8 (td//4)
            x = x + feat_s1
        x = LayerNorm2d(td // 4, name="output_upscaling_1")(x)
        x = nn.gelu(x, approximate=False)
        x = _PixelShuffleUp(td // 8, name="output_upscaling_3")(x)
        if self.use_high_res_features and high_res_features is not None:
            x = x + feat_s0
        upscaled = nn.gelu(x, approximate=False)

        hyper = jnp.stack(
            [MLP(td, td // 8, 3, name=f"output_hypernetworks_mlps_{i}")(mask_tokens_out[:, i])
             for i in range(nt)], axis=1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, upscaled)
        iou_pred = MLP(self.iou_head_hidden_dim, nt, self.iou_head_depth,
                       sigmoid=self.iou_prediction_use_sigmoid,
                       name="iou_prediction_head")(iou_token_out)
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                obj_logits = MLP(td, 1, 3, name="pred_obj_score_head")(hs[:, 0])
            else:
                obj_logits = nn.Dense(1, name="pred_obj_score_head")(hs[:, 0])
        else:
            obj_logits = 10.0 * jnp.ones((b, 1), iou_pred.dtype)

        if multimask_output:
            out_masks, out_iou = masks[:, 1:], iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability:
            # eval-time fallback to the best multimask when token-0 unstable
            multi, multi_iou = masks[:, 1:], iou_pred[:, 1:]
            best = jnp.argmax(multi_iou, axis=-1)
            ab = jnp.arange(b)
            best_m = multi[ab, best][:, None]
            best_i = multi_iou[ab, best][:, None]
            stable = (self._stability(masks[:, 0:1])
                      >= self.dynamic_multimask_stability_thresh)
            out_masks = jnp.where(stable[..., None, None], masks[:, 0:1], best_m)
            out_iou = jnp.where(stable, iou_pred[:, 0:1], best_i)
        else:
            out_masks, out_iou = masks[:, 0:1], iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, obj_logits


# ---------------------------------------------------------------------------
# full SAM2 model
# ---------------------------------------------------------------------------


class SAM2Model(nn.Module):
    """SAM2 with memory-conditioned video tracking (reference sam.py:91-1160).

    Exposed as method-dispatched pure functions so the predictor can jit
    each stage once:
      - encode_image:      image -> 3-level FPN feats (+ decoder high-res proj)
      - forward_sam_heads: conditioned s16 features + prompts -> masks/ptr
      - condition_features: fuse current frame with the (fixed-size) memory
      - encode_memory:     pixel feats + mask -> 64-ch memory + pos
    """

    # Hiera trunk config (sam2_t defaults)
    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    window_pos_embed_bkg_spatial_size: tuple[int, int] = (14, 14)
    # memory machinery
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs_in_encoder: int = 16
    mem_attn_layers: int = 4
    mem_ffn: int = 2048
    image_size: int = 1024
    backbone_stride: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0

    def setup(self):
        self.image_encoder = ImageEncoder(
            trunk_cfg=dict(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                stages=tuple(self.stages),
                global_att_blocks=tuple(self.global_att_blocks),
                window_spec=tuple(self.window_spec),
                window_pos_embed_bkg_spatial_size=self.window_pos_embed_bkg_spatial_size,
            ),
            backbone_channel_list=tuple(self.backbone_channel_list),
            d_model=self.d_model,
        )
        self.memory_attention = MemoryAttention(
            self.d_model, num_layers=self.mem_attn_layers,
            dim_feedforward=self.mem_ffn, mem_dim=self.mem_dim)
        self.memory_encoder = MemoryEncoder(out_dim=self.mem_dim, in_dim=self.d_model)
        grid = self.image_size // self.backbone_stride
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.d_model,
            input_image_size=(self.image_size, self.image_size),
            image_embedding_size=(grid, grid),
        )
        self.sam_mask_decoder = SAM2MaskDecoder(transformer_dim=self.d_model)
        # decoder high-res skip projections (applied in forward_image,
        # reference sam.py:602-607; torch stores them inside the decoder —
        # the importer strips the sam_mask_decoder prefix)
        self.conv_s0 = nn.Conv(self.d_model // 8, (1, 1))
        self.conv_s1 = nn.Conv(self.d_model // 4, (1, 1))
        self.obj_ptr_proj = MLP(self.d_model, self.d_model, 3)
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

    # ------------------------------------------------------------- stages
    def encode_image(self, x: jnp.ndarray) -> dict:
        """forward_image (sam.py:598-608): FPN feats with decoder high-res
        projections pre-applied. Returns dict of [s4, s8, s16] NHWC feats +
        sine pos embeds."""
        out = self.image_encoder(x)
        feats = list(out["backbone_fpn"])
        feats[0] = self.conv_s0(feats[0])
        feats[1] = self.conv_s1(feats[1])
        return {"backbone_fpn": feats, "vision_pos_enc": out["vision_pos_enc"]}

    def no_mem_features(self, feat_s16: jnp.ndarray) -> jnp.ndarray:
        """Initial conditioning frame: directly add the no-memory embedding
        (directly_add_no_mem_embed=True, sam.py:767-771)."""
        b, h, w, c = feat_s16.shape
        x = feat_s16.reshape(b, h * w, c) + self.no_mem_embed
        return x.reshape(b, h, w, c)

    def condition_features(self, feat_s16, pos_s16, memory, memory_pos,
                           num_obj_ptr_tokens: int = 0, key_mask=None):
        """Memory attention over a (fixed-size) bank
        (_prepare_memory_conditioned_features, sam.py:637-792).

        memory/(memory_pos): (B, S, mem_dim) where S = spatial-memory tokens
        followed by ``num_obj_ptr_tokens`` pointer tokens; ``key_mask``
        (B, S) marks live slots."""
        b, h, w, c = feat_s16.shape
        cur = feat_s16.reshape(b, h * w, c)
        cur_pos = pos_s16.reshape(1, h * w, c) if pos_s16.ndim == 3 else \
            pos_s16.reshape(b, h * w, c)
        out = self.memory_attention(
            cur, memory, cur_pos, memory_pos, q_hw=(w, h),
            num_obj_ptr_tokens=num_obj_ptr_tokens, key_mask=key_mask)
        return out.reshape(b, h, w, c)

    def forward_sam_heads(self, feat_s16, points=None, mask_inputs=None,
                          high_res_features=None, multimask_output: bool = False):
        """_forward_sam_heads (sam.py:404-553). ``points`` = (coords (B,P,2),
        labels (B,P)); returns (low_res_multi, high_res_multi, ious,
        low_res, high_res, obj_ptr, obj_score_logits)."""
        b = feat_s16.shape[0]
        if points is None:
            coords = jnp.zeros((b, 1, 2), feat_s16.dtype)
            labels = -jnp.ones((b, 1), jnp.int32)
        else:
            coords, labels = points
        if mask_inputs is not None:
            ms = self.sam_prompt_encoder.image_embedding_size[0] * 4
            if mask_inputs.shape[1] != ms:
                mask_inputs = jax.image.resize(
                    mask_inputs, (b, ms, ms, 1), "bilinear")
            sam_mask_prompt = mask_inputs
        else:
            sam_mask_prompt = None
        sparse, dense = self.sam_prompt_encoder(
            points=(coords, labels), masks=sam_mask_prompt)
        low_multi, ious, sam_tokens, obj_logits = self.sam_mask_decoder(
            feat_s16, self.sam_prompt_encoder.dense_pe(), sparse, dense,
            multimask_output=multimask_output, high_res_features=high_res_features)
        is_obj = obj_logits > 0
        low_multi = jnp.where(is_obj[:, None, None], low_multi, NO_OBJ_SCORE)
        high_multi = jax.image.resize(
            low_multi.astype(jnp.float32),
            (b, low_multi.shape[1], self.image_size, self.image_size), "bilinear")

        sam_token = sam_tokens[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            ab = jnp.arange(b)
            low = low_multi[ab, best][:, None]
            high = high_multi[ab, best][:, None]
            if sam_tokens.shape[1] > 1:
                sam_token = sam_tokens[ab, best]
        else:
            low, high = low_multi, high_multi

        obj_ptr = self.obj_ptr_proj(sam_token)
        lam = is_obj.astype(obj_ptr.dtype)  # (B, 1); soft_no_obj_ptr=False
        obj_ptr = lam * obj_ptr  # fixed_no_obj_ptr=True
        obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr
        return low_multi, high_multi, ious, low, high, obj_ptr, obj_logits

    def encode_memory(self, feat_s16, high_res_masks, obj_score_logits=None):
        """_encode_new_memory (sam.py:794-836): sigmoid-scaled mask + pixel
        features -> 64-ch memory and its sine pos enc. ``high_res_masks``
        arrives mask-stacked (B, 1, H, W) as the decoder emits it."""
        if high_res_masks.ndim == 4 and high_res_masks.shape[1] == 1:
            high_res_masks = high_res_masks[:, 0, :, :, None]  # -> NHWC
        mask_for_mem = jax.nn.sigmoid(high_res_masks)
        mask_for_mem = mask_for_mem * self.sigmoid_scale_for_mem_enc \
            + self.sigmoid_bias_for_mem_enc
        feats, pos = self.memory_encoder(feat_s16, mask_for_mem,
                                         skip_mask_sigmoid=True)
        return feats, pos

    def tpos_embed_obj_ptrs(self, t_diffs: jnp.ndarray,
                            t_max: jnp.ndarray | float) -> jnp.ndarray:
        """Temporal sine embedding for object pointers (sam.py:748-757),
        add_tpos_enc_to_obj_ptrs=True, no extra projection (sam2.0).
        ``t_max`` = min(num_frames, max_obj_ptrs_in_encoder) - 1."""
        return get_1d_sine_pe(t_diffs / t_max, dim=self.mem_dim)

    def use_mask_as_output(self, mask_inputs, feat_s16=None,
                           high_res_features=None):
        """Treat a given mask directly as the tracking output, bypassing the
        SAM decoder for the mask itself (_use_mask_as_output, sam.py:553-599;
        use_mask_input_as_output_without_sam=True): ±10 logits from the
        binary mask, a dummy IoU of 1, and an object pointer produced by the
        SAM decoder fed the 4x-downsampled mask as a dense prompt.

        mask_inputs: (B, H, W, 1) NHWC at image resolution, float or bool.
        Returns the forward_sam_heads 7-tuple.
        """
        out_scale, out_bias = 20.0, -10.0
        m = mask_inputs.astype(jnp.float32)
        high = m * out_scale + out_bias                       # (B, H, W, 1)
        b, h, w, _ = m.shape
        low = jax.image.resize(high, (b, h // 4, w // 4, 1), "bilinear")
        # channel-stacked (B, 1, H, W) like the decoder emits
        low_m = low[..., 0][:, None]
        high_m = high[..., 0][:, None]
        ious = jnp.ones((b, 1), jnp.float32)
        if feat_s16 is None or high_res_features is None:
            obj_ptr = jnp.zeros((b, self.d_model), jnp.float32)
        else:
            down = self.mask_downsample(m)                    # (B, H/4, W/4, 1)
            obj_ptr = self.forward_sam_heads(
                feat_s16, mask_inputs=down,
                high_res_features=high_res_features)[5]
        is_obj = jnp.any(m.reshape(b, -1) > 0.0, axis=1)[:, None]
        lam = is_obj.astype(jnp.float32)
        obj_logits = out_scale * lam + out_bias
        obj_ptr = lam * obj_ptr + (1.0 - lam) * self.no_obj_ptr
        return low_m, high_m, ious, low_m, high_m, obj_ptr, obj_logits

    def __call__(self, x: jnp.ndarray, points=None, multimask_output: bool = True):
        """Single-image promptable segmentation (init cond frame path)."""
        enc = self.encode_image(x)
        f0, f1, f16 = enc["backbone_fpn"]
        feat = self.no_mem_features(f16)
        return self.forward_sam_heads(
            feat, points=points, high_res_features=[f0, f1],
            multimask_output=multimask_output)

    def init_all(self, x: jnp.ndarray):
        """Trace every stage once so `init` creates the full parameter tree
        (image + prompt + decoder + memory encoder + memory attention)."""
        enc = self.encode_image(x)
        f0, f1, f16 = enc["backbone_fpn"]
        feat = self.no_mem_features(f16)
        outs = self.forward_sam_heads(
            feat, high_res_features=[f0, f1], multimask_output=False)
        mem, mem_pos = self.encode_memory(f16, outs[4], outs[6])
        b, h, w, _ = f16.shape
        mem_t = mem.reshape(b, h * w, self.mem_dim)
        pos_t = jnp.broadcast_to(
            mem_pos.reshape(1, h * w, self.mem_dim), mem_t.shape)
        cond = self.condition_features(f16, enc["vision_pos_enc"][-1],
                                       mem_t, pos_t)
        # mask-prompt path: mask_downsample + prompt-encoder mask_downscaling
        self.use_mask_as_output(outs[4][:, 0, :, :, None], f16, [f0, f1])
        return cond


SAM2_CONFIGS = {
    # reference build.py:84-135
    "sam2_t": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                   global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_s": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                   global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_b": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                   global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7),
                   window_pos_embed_bkg_spatial_size=(14, 14),
                   backbone_channel_list=(896, 448, 224, 112)),
    "sam2_l": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                   global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8),
                   backbone_channel_list=(1152, 576, 288, 144)),
}


def build_sam2(variant: str = "sam2_t", image_size: int = 1024) -> SAM2Model:
    cfg = SAM2_CONFIGS[variant.replace(".pt", "").replace("-", "_").replace("sam2.1", "sam2")]
    return SAM2Model(image_size=image_size, **cfg)


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------

_VERBATIM_LEAVES = {
    "pos_embed", "pos_embed_window", "maskmem_tpos_enc", "no_mem_embed",
    "no_mem_pos_enc", "no_obj_ptr", "gamma",
}


def sam2_state_dict_to_variables(sd: dict[str, Any], image_size: int = 1024) -> dict:
    """Map a reference SAM2Model state_dict to flax variables for
    :class:`SAM2Model`. Name rewrite + layout transposes; see
    sam_state_dict_to_variables for the conventions."""
    params: dict[str, Any] = {}

    def put(path: list[str], value):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = jnp.asarray(value)

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    point_rows: dict[int, np.ndarray] = {}
    for key, val in sd.items():
        v = to_np(val)
        parts = key.split(".")
        toks: list[str] = []
        for t in parts:
            if t.isdigit() and toks:
                toks[-1] = f"{toks[-1]}_{t}"
            else:
                toks.append(t)
        # structural renames ------------------------------------------------
        ren: list[str] = []
        for t in toks:
            if t == "sam_prompt_encoder":
                ren.append("sam_prompt_encoder")
            elif t == "patch_embed":
                ren.append("patch_embed")
            else:
                ren.append(t)
        toks = ren
        # flatten torch wrappers: neck convs "convs_N.conv" -> "convs_N";
        # patch_embed.proj -> patch_embed; fuser.layers_N -> fuser_layers_N;
        # memory_encoder.mask_downsampler.encoder_N stays
        flat: list[str] = []
        i = 0
        while i < len(toks):
            t = toks[i]
            if t.startswith("convs_") and i + 1 < len(toks) and toks[i + 1] == "conv":
                flat.append(t)
                i += 2
                continue
            if t == "patch_embed" and i + 1 < len(toks) and toks[i + 1] == "proj":
                flat.append(t)
                i += 2
                continue
            if t == "fuser" and i + 1 < len(toks) and toks[i + 1].startswith("layers_"):
                flat.append(f"fuser_{toks[i + 1]}")
                i += 2
                continue
            flat.append(t)
            i += 1
        toks = flat
        leaf, body = toks[-1], toks[:-1]

        # conv_s0/s1 live on the flax model, not inside the decoder
        if len(toks) >= 2 and toks[0] == "sam_mask_decoder" and toks[1] in ("conv_s0", "conv_s1"):
            toks = toks[1:]
            leaf, body = toks[-1], toks[:-1]

        # prompt-encoder specials (same contract as SAM1 import)
        if body and body[0] == "sam_prompt_encoder":
            if body[-1].startswith("point_embeddings_"):
                point_rows[int(body[-1].split("_")[-1])] = v[0]
                continue
            if body[-1] in ("not_a_point_embed", "no_mask_embed"):
                put(["sam_prompt_encoder", body[-1]], v)
                continue
            if body[-1] == "pe_layer":
                put(["sam_prompt_encoder", "positional_encoding_gaussian_matrix"], v)
                continue
        if body and body[-1] in ("iou_token", "mask_tokens", "obj_score_token"):
            put(body[:-1] + [body[-1]], v)
            continue
        if leaf in _VERBATIM_LEAVES:
            put(body + [leaf], v)
            continue
        # SAM2 two-way blocks name their MLP "mlp.layers.{0,1}" while the
        # flax TwoWayAttentionBlock uses MLPBlock lin1/lin2 (same math)
        if len(body) >= 2 and body[-2] == "mlp" and body[-1] in ("layers_0", "layers_1") \
                and "transformer" in body:
            lin = "lin1" if body[-1] == "layers_0" else "lin2"
            put(body[:-1] + [lin, "kernel" if leaf == "weight" else "bias"],
                v.T if leaf == "weight" else v)
            continue
        if body and body[-1] in ("output_upscaling_0", "output_upscaling_3"):
            # ConvTranspose2d (I, O, 2, 2) imports verbatim into _PixelShuffleUp
            put(body + ["kernel" if leaf == "weight" else "bias"], v)
            continue

        if leaf == "weight":
            if v.ndim == 4:
                if body and body[-1] == "dwconv":  # depthwise (C,1,kh,kw)
                    put(body + ["kernel"], v.transpose(2, 3, 1, 0))
                else:
                    put(body + ["kernel"], v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:
                put(body + ["kernel"], v.T)
            else:
                put(body + ["scale"], v)
        elif leaf == "bias":
            put(body + ["bias"], v)
        else:
            put(body + [leaf], v)

    if point_rows:
        put(["sam_prompt_encoder", "point_embeddings"],
            np.stack([point_rows[i] for i in sorted(point_rows)]))
    return {"params": params}

"""SAM (Segment Anything) family — TPU-native flax modules.

Parity targets (reference, random-weight activation parity tested in
tests/test_sam.py):
  - ImageEncoderViT      models/sam/modules/encoders.py:23-148
  - PromptEncoder        models/sam/modules/encoders.py:150-335
  - MaskDecoder          models/sam/modules/decoders.py:11-170
  - TwoWayTransformer    models/sam/modules/transformer.py:13-123
  - TwoWayAttentionBlock models/sam/modules/transformer.py:125-238
  - Attention            models/sam/modules/transformer.py:240-344
  - ViT Block/REAttention/PatchEmbed  models/sam/modules/blocks.py:844-1067
  - PositionEmbeddingRandom           models/sam/modules/blocks.py:778-842
  - SAMModel             models/sam/modules/sam.py:25-90

TPU re-design notes:
  - NHWC end to end (PatchEmbed's conv output stays channel-last; the torch
    code permutes back and forth around its NCHW necks).
  - All attention runs as batched MXU matmuls; the decomposed relative
    position bias is two small einsums (the MVITv2 form the reference uses).
  - The 2x2-stride-2 output upscaling ConvTranspose is a "pixel-shuffle
    matmul": one einsum over the channel dim followed by a reshape — exactly
    torch's non-overlapping ConvTranspose2d, but expressed as a dense matmul
    the MXU likes.
  - Prompts are static-shape: points arrive padded to a fixed N with label
    -1 sentinels (the reference itself uses -1 for its pad point); boxes
    become two points with labels 2/3 (its _embed_boxes corner encoding).
  - The whole prompt->mask path (prompt encode + two-way transformer +
    upscale + hypernetwork product) jits as one program; the image encoder
    jits separately so one embedding serves many prompt batches
    (reference Predictor caches "features" the same way).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# small shared pieces
# ---------------------------------------------------------------------------


class LayerNorm2d(nn.Module):
    """Channel layernorm over NHWC (reference nn/modules/conv LayerNorm2d:
    normalizes over C with learned scale/bias, eps 1e-6)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        u = x.mean(-1, keepdims=True)
        s = ((x - u) ** 2).mean(-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + self.eps)
        w = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * w + b


class MLPBlock(nn.Module):
    """lin1 -> act -> lin2 (reference nn/modules/transformer.py:320-345)."""

    mlp_dim: int
    out_dim: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return nn.Dense(self.out_dim, name="lin2")(x)


class MLP(nn.Module):
    """N-layer MLP with act between layers (reference transformer.py:348-404;
    Hiera blocks use act='gelu')."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            x = nn.Dense(d, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.gelu(x, approximate=False) if self.act == "gelu" else nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


# ---------------------------------------------------------------------------
# image encoder (ViT)
# ---------------------------------------------------------------------------


def window_partition(x: jnp.ndarray, ws: int) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(B, H, W, C) -> (B*nw, ws, ws, C) with bottom/right zero pad
    (reference modules/utils.py:225-252)."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(
    win: jnp.ndarray, ws: int, pad_hw: tuple[int, int], hw: tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition (reference modules/utils.py:255-289)."""
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """(L, C) table -> (q, k, C) relative embeddings (utils.py:292-330).
    Linear-resize when the stored table length mismatches 2*max-1."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]), "linear")
    qc = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qc - kc) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class REAttention(nn.Module):
    """ViT self-attention with decomposed relative position bias
    (reference blocks.py:935-1016; MVITv2 add_decomposed_rel_pos)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: tuple[int, int] | None = None
    # grid the stored rel-pos tables were trained at (like pos_embed's
    # pretrain grid): checkpoints always carry 2*table_size-1 rows and
    # _get_rel_pos resizes to the runtime grid, exactly the reference's
    # on-the-fly interpolation (utils.py:292-330). None -> input_size.
    table_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, HW, hd)

        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (hd**-0.5), k)
        if self.use_rel_pos:
            ts = self.table_size or self.input_size
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * ts[0] - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * ts[1] - 1, hd)
            )
            rh = _get_rel_pos(h, h, rel_h)  # (h, h, hd)
            rw = _get_rel_pos(w, w, rel_w)
            rq = q.reshape(b, nh, h, w, hd)
            bias_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh)
            bias_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw)
            attn = (
                attn.reshape(b, nh, h, w, h, w)
                + bias_h[..., :, None]
                + bias_w[..., None, :]
            ).reshape(b, nh, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional window attention
    (reference blocks.py:844-933)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: tuple[int, int] | None = None
    # rel-pos table grid for GLOBAL attention (checkpoint pretrain grid);
    # window blocks always store window-sized tables
    global_table_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        attn_size = (
            (self.window_size, self.window_size)
            if self.window_size > 0
            else self.input_size
        )
        x = REAttention(
            self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=attn_size,
            table_size=None if self.window_size > 0 else self.global_table_size,
            name="attn",
        )(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """ViT image encoder -> (B, H/16, W/16, out_chans) embedding
    (reference encoders.py:23-148). NHWC; neck LayerNorm2d convs."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Sequence[int] = ()
    # pos_embed grid the checkpoint was trained at (all released SAM
    # checkpoints: 1024 px / 64x64); resized when img_size differs
    # (reference encoders.py:139-143 set_imgsz path)
    pretrain_img_size: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID", name="patch_embed"
        )(x)  # (B, H/p, W/p, E)
        grid = self.img_size // p
        g0 = self.pretrain_img_size // p  # checkpoint grid (64 for 1024px)
        if self.use_abs_pos:
            # stored at the pretrain grid; rescaled torch-nearest
            # (src = floor(dst * in/out)) for other image sizes — bit-matches
            # the reference's F.interpolate default (encoders.py:139-143)
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (1, g0, g0, self.embed_dim)
            )
            gh, gw = x.shape[1], x.shape[2]
            if gh != g0 or gw != g0:
                pos = pos[:, (np.arange(gh) * g0) // gh][:, :, (np.arange(gw) * g0) // gw]
            x = x + pos
        for i in range(self.depth):
            x = ViTBlock(
                self.embed_dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=0 if i in tuple(self.global_attn_indexes) else self.window_size,
                input_size=(x.shape[1], x.shape[2]),
                # global rel-pos tables live at the checkpoint's pretrain
                # grid (like pos_embed) and resize at runtime
                global_table_size=(g0, g0),
                name=f"blocks_{i}",
            )(x)
        # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (both convs bias-free)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = LayerNorm2d(self.out_chans, name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, name="neck_2")(x)
        return LayerNorm2d(self.out_chans, name="neck_3")(x)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) + dense (mask) prompt embeddings
    (reference encoders.py:150-335).

    Point labels: -1 pad, 0 negative, 1 positive, 2/3 box corners.
    """

    embed_dim: int = 256
    input_image_size: tuple[int, int] = (1024, 1024)
    image_embedding_size: tuple[int, int] = (64, 64)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_gaussian = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.embed_dim // 2),
        )
        # 4 reference nn.Embedding(1, E) tables stacked into one (4, E)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        c = self.mask_in_chans
        self.mask_down = [
            nn.Conv(c // 4, (2, 2), strides=(2, 2), name="mask_downscaling_0"),
            LayerNorm2d(c // 4, name="mask_downscaling_1"),
            nn.Conv(c, (2, 2), strides=(2, 2), name="mask_downscaling_3"),
            LayerNorm2d(c, name="mask_downscaling_4"),
            nn.Conv(self.embed_dim, (1, 1), name="mask_downscaling_6"),
        ]

    def _pe_encoding(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Fourier-feature encode [0,1] coords (blocks.py:811-819)."""
        coords = 2.0 * coords - 1.0
        coords = (2.0 * np.pi) * (coords @ self.pe_gaussian)
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def dense_pe(self) -> jnp.ndarray:
        """(1, H, W, E) image-grid positional encoding (get_dense_pe)."""
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.tile(xs[None, :], (h, 1)), jnp.tile(ys[:, None], (1, w))], axis=-1
        )
        return self._pe_encoding(grid)[None]

    def embed_points(self, coords: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """(B, N, 2) pixel coords + (B, N) labels -> (B, N, E) sparse tokens
        (encoders.py:240-256). Pad points (label -1) contribute the
        not_a_point embedding with zeroed positional term."""
        h, w = self.input_image_size
        pts = (coords + 0.5) / jnp.asarray([w, h], coords.dtype)
        pe = self._pe_encoding(pts)
        lab = labels.astype(jnp.int32)
        pe = jnp.where((lab == -1)[..., None], 0.0, pe)
        table = jnp.concatenate([self.not_a_point_embed, self.point_embeddings], axis=0)
        sel = jax.nn.one_hot(lab + 1, 5, dtype=pe.dtype) @ table  # (B, N, E)
        return pe + sel

    def embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """(B, Nb, 4) xyxy -> (B, Nb*2, E) corner tokens (encoders.py:258-265)."""
        b, nb = boxes.shape[0], boxes.shape[1]
        coords = boxes.reshape(b, nb * 2, 2)
        labels = jnp.tile(jnp.asarray([2, 3], jnp.int32), (b, nb))
        # corner embedding: pe + point_embeddings[2|3], never the pad branch
        return self.embed_points(coords, labels)

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """(B, 4H, 4W, 1) mask -> (B, H, W, E) dense embedding."""
        x = masks
        x = self.mask_down[0](x)
        x = self.mask_down[1](x)
        x = nn.gelu(x, approximate=False)
        x = self.mask_down[2](x)
        x = self.mask_down[3](x)
        x = nn.gelu(x, approximate=False)
        return self.mask_down[4](x)

    def no_mask_dense(self, batch: int) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), (batch, h, w, self.embed_dim)
        )

    def __call__(
        self,
        points: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        boxes: jnp.ndarray | None = None,
        masks: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse (B, N, E), dense (B, H, W, E)) embeddings
        (encoders.py:283-335). With points and no boxes, a pad point is
        appended (the reference's `pad=boxes is None`)."""
        parts = []
        bs = 1
        if points is not None:
            coords, labels = points
            bs = coords.shape[0]
            if boxes is None:
                coords = jnp.concatenate(
                    [coords, jnp.zeros((bs, 1, 2), coords.dtype)], axis=1
                )
                labels = jnp.concatenate(
                    [labels, -jnp.ones((bs, 1), labels.dtype)], axis=1
                )
            parts.append(self.embed_points(coords, labels))
        if boxes is not None:
            bs = boxes.shape[0]
            parts.append(self.embed_boxes(boxes))
        sparse = (
            jnp.concatenate(parts, axis=1)
            if parts
            else jnp.zeros((bs, 0, self.embed_dim))
        )
        dense = self.embed_masks(masks) if masks is not None else self.no_mask_dense(bs)
        return sparse, dense


# ---------------------------------------------------------------------------
# two-way transformer + mask decoder
# ---------------------------------------------------------------------------


class DownsampleAttention(nn.Module):
    """MHA with internal-dim downsampling (reference transformer.py:240-344)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        d = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = d // nh
        q = nn.Dense(d, name="q_proj")(q)
        k = nn.Dense(d, name="k_proj")(k)
        v = nn.Dense(d, name="v_proj")(v)
        b = q.shape[0]
        q = q.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd), axis=-1
        )
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, d)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Self-attn + token->image + MLP + image->token (transformer.py:125-238)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampleAttention(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampleAttention(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampleAttention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, self.embedding_dim, act="relu", name="mlp")(
            queries
        )
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampleAttention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Stack of two-way blocks + final token->image attention
    (transformer.py:13-123)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim,
                self.num_heads,
                self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampleAttention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        return nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries), keys


class _PixelShuffleUp(nn.Module):
    """2x2-stride-2 ConvTranspose as an einsum + reshape (non-overlapping
    kernel == per-pixel matmul; torch weight (I, O, 2, 2) imports directly)."""

    out_chans: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, ci = x.shape
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (ci, self.out_chans, 2, 2),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_chans,))
        y = jnp.einsum("bhwi,ioyx->bhywxo", x, kern)
        return y.reshape(b, h * 2, w * 2, self.out_chans) + bias


class MaskDecoder(nn.Module):
    """Mask + IoU prediction from image/prompt embeddings
    (reference decoders.py:11-170)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # (1|B, H, W, C)
        image_pe: jnp.ndarray,  # (1, H, W, C)
        sparse_prompt: jnp.ndarray,  # (B, N, C)
        dense_prompt: jnp.ndarray,  # (B, H, W, C)
        multimask_output: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (masks (B, nm, 4H, 4W), iou_pred (B, nm))."""
        nt = self.num_mask_tokens
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (nt, self.transformer_dim)
        )
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None],
            (b, 1 + nt, self.transformer_dim),
        )
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = jnp.broadcast_to(
            image_embeddings, (b,) + image_embeddings.shape[1:]
        ) + dense_prompt
        h, w = src.shape[1], src.shape[2]

        hs, src = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=self.transformer_dim,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            name="transformer",
        )(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + nt]

        src = src.reshape(b, h, w, self.transformer_dim)
        x = _PixelShuffleUp(self.transformer_dim // 4, name="output_upscaling_0")(src)
        x = LayerNorm2d(self.transformer_dim // 4, name="output_upscaling_1")(x)
        x = nn.gelu(x, approximate=False)
        x = _PixelShuffleUp(self.transformer_dim // 8, name="output_upscaling_3")(x)
        upscaled = nn.gelu(x, approximate=False)  # (B, 4H, 4W, C/8)

        hyper = jnp.stack(
            [
                MLP(
                    self.transformer_dim,
                    self.transformer_dim // 8,
                    3,
                    name=f"output_hypernetworks_mlps_{i}",
                )(mask_tokens_out[:, i])
                for i in range(nt)
            ],
            axis=1,
        )  # (B, nt, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, upscaled)
        iou_pred = MLP(
            self.iou_head_hidden_dim,
            nt,
            self.iou_head_depth,
            name="iou_prediction_head",
        )(iou_token_out)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]


# ---------------------------------------------------------------------------
# full model + builders
# ---------------------------------------------------------------------------


class SAMModel(nn.Module):
    """Image encoder + prompt encoder + mask decoder (reference sam.py:25-90).

    Methods are exposed via flax's `method=` apply mechanism so the predictor
    can jit image encoding once and run many prompt batches against the
    cached embedding.
    """

    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    img_size: int = 1024
    prompt_embed_dim: int = 256
    mobile: bool = False  # Mobile-SAM: TinyViT trunk (build.py:72-82)

    pixel_mean: tuple[float, ...] = (123.675, 116.28, 103.53)
    pixel_std: tuple[float, ...] = (58.395, 57.12, 57.375)

    def setup(self):
        grid = self.img_size // 16
        if self.mobile:
            from fce_yolo_tpu.nn.tiny_encoder import TinyViT

            self.image_encoder = TinyViT(neck_chans=self.prompt_embed_dim)
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size,
                embed_dim=self.encoder_embed_dim,
                depth=self.encoder_depth,
                num_heads=self.encoder_num_heads,
                global_attn_indexes=tuple(self.encoder_global_attn_indexes),
                out_chans=self.prompt_embed_dim,
            )
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim,
            input_image_size=(self.img_size, self.img_size),
            image_embedding_size=(grid, grid),
        )
        self.mask_decoder = MaskDecoder(transformer_dim=self.prompt_embed_dim)

    def preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        """Normalize (B, H, W, 3) uint8/float pixels (sam.py:78-80 buffers)."""
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return (x.astype(jnp.float32) - mean) / std

    def encode_image(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.image_encoder(self.preprocess(x))

    def prompt_and_decode(
        self,
        image_embeddings: jnp.ndarray,
        points: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        boxes: jnp.ndarray | None = None,
        masks: jnp.ndarray | None = None,
        multimask_output: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes, masks=masks)
        return self.mask_decoder(
            image_embeddings,
            self.prompt_encoder.dense_pe(),
            sparse,
            dense,
            multimask_output=multimask_output,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        points: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        boxes: jnp.ndarray | None = None,
        multimask_output: bool = True,
    ):
        emb = self.encode_image(x)
        return self.prompt_and_decode(
            emb, points=points, boxes=boxes, multimask_output=multimask_output
        )


SAM_CONFIGS = {
    # reference build.py:39-70
    "sam_h": dict(encoder_embed_dim=1280, encoder_depth=32, encoder_num_heads=16,
                  encoder_global_attn_indexes=(7, 15, 23, 31)),
    "sam_l": dict(encoder_embed_dim=1024, encoder_depth=24, encoder_num_heads=16,
                  encoder_global_attn_indexes=(5, 11, 17, 23)),
    "sam_b": dict(encoder_embed_dim=768, encoder_depth=12, encoder_num_heads=12,
                  encoder_global_attn_indexes=(2, 5, 8, 11)),
    # reference build.py:72-82 — TinyViT [64,128,160,320] trunk
    "mobile_sam": dict(mobile=True),
}


def build_sam(variant: str = "sam_b", img_size: int = 1024) -> SAMModel:
    """Build a SAM model by variant name (reference build.py:137-226)."""
    cfg = SAM_CONFIGS[variant.replace(".pt", "").replace("-", "_")]
    return SAMModel(img_size=img_size, **cfg)


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------

_LN_KEYS = {"norm1", "norm2", "norm3", "norm4", "norm_final_attn"}


def sam_state_dict_to_variables(sd: dict[str, Any], img_size: int = 1024) -> dict:
    """Map a reference SAMModel state_dict (torch tensors or numpy) to flax
    variables for :class:`SAMModel`. Pure name rewrite + layout transposes.
    """
    import re

    params: dict[str, Any] = {}

    if any(k.startswith("image_encoder.layers.") for k in sd):
        # Mobile-SAM: the trunk is a TinyViT — delegate its subtree
        from fce_yolo_tpu.nn.tiny_encoder import tinyvit_state_dict_to_params

        enc = {
            k[len("image_encoder."):]: v
            for k, v in sd.items()
            if k.startswith("image_encoder.")
        }
        rest = {k: v for k, v in sd.items() if not k.startswith("image_encoder.")}
        out = sam_state_dict_to_variables(rest, img_size=img_size)
        out["params"]["image_encoder"] = tinyvit_state_dict_to_params(enc)
        return out

    def put(path: list[str], value: np.ndarray):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = jnp.asarray(value)

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    point_rows = {}
    for key, val in sd.items():
        v = to_np(val)
        if key in ("pixel_mean", "pixel_std"):
            continue
        parts = key.split(".")
        # fold torch list indices into flax sibling names: blocks.0 -> blocks_0
        toks: list[str] = []
        for t in parts:
            if t.isdigit() and toks:
                toks[-1] = f"{toks[-1]}_{t}"
            else:
                toks.append(t)
        leaf = toks[-1]
        body = toks[:-1]

        # --- special cases -------------------------------------------------
        if body and body[0] == "prompt_encoder":
            if body[-1].startswith("point_embeddings_"):
                point_rows[int(body[-1].split("_")[-1])] = v[0]
                continue
            if body[-1] in ("not_a_point_embed", "no_mask_embed"):
                put(["prompt_encoder", body[-1]], v)
                continue
            if body[-1] == "pe_layer":
                put(["prompt_encoder", "positional_encoding_gaussian_matrix"], v)
                continue
        if body and body[-1] in ("iou_token", "mask_tokens"):
            put(body, v)
            continue
        if leaf == "positional_encoding_gaussian_matrix":
            put(body + [leaf], v)
            continue
        if leaf in ("pos_embed", "rel_pos_h", "rel_pos_w"):
            put(body + [leaf], v)
            continue

        if "patch_embed" in body:
            # image_encoder.patch_embed.proj.{weight,bias} -> single conv
            if leaf == "weight":
                put(["image_encoder", "patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
            else:
                put(["image_encoder", "patch_embed", "bias"], v)
            continue
        if re.fullmatch(r"output_upscaling_[03]", body[-1] if body else ""):
            # ConvTranspose2d weight (I, O, 2, 2) -> _PixelShuffleUp kernel
            put(body + ("kernel" if leaf == "weight" else "bias").split(), v)
            continue

        # --- generic by-shape mapping -------------------------------------
        if leaf == "weight":
            if v.ndim == 4:  # conv OIHW -> HWIO
                put(body + ["kernel"], v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:  # linear (out, in) -> (in, out)
                put(body + ["kernel"], v.T)
            else:  # LayerNorm / LayerNorm2d weight
                put(body + ["scale"], v)
        elif leaf == "bias":
            put(body + ["bias"], v)
        else:
            put(body + [leaf], v)

    if point_rows:
        put(
            ["prompt_encoder", "point_embeddings"],
            np.stack([point_rows[i] for i in sorted(point_rows)]),
        )
    return {"params": params}

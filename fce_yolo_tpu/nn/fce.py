"""FCE (feature-enhancement) modules — the fork's core contribution.

Parity target: reference nn/modules/fce_block.py:1-285. Re-designed for TPU:
strip pooling is a single VPU mean-reduction per axis, the H<->W cross
attentions are tiny MXU matmuls over pooled strips (length H or W, not H*W),
and gating broadcasts fuse into the surrounding elementwise chain. NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fce_yolo_tpu.nn.modules import Conv2d, ConvBNAct


class BiFPN_Concat(nn.Module):
    """Learned softmax-free weighted multi-input fusion (fce_block.py:13-63).

    Inputs are 1x1-conv realigned to a common channel count, then combined
    with ReLU-normalized learnable scalar weights:
    ``sum_i w_i x_i / (sum_i w_i + eps)``, w_i = relu(param_i), init 1.
    """

    c1: tuple[int, ...]  # input channel counts
    c2: int  # output channels
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, xs, train: bool = False) -> jnp.ndarray:
        assert len(xs) == len(self.c1), f"expected {len(self.c1)} inputs, got {len(xs)}"
        aligned = []
        for i, (x, ch) in enumerate(zip(xs, self.c1)):
            if ch != self.c2:
                x = ConvBNAct(self.c2, 1, 1, name=f"realign_convs_{i}")(x, train)
            aligned.append(x)
        w = self.param("w", lambda _: jnp.ones((len(self.c1),), jnp.float32))
        w = jax.nn.relu(w)
        w = w / (jnp.sum(w) + self.epsilon)
        out = w[0] * aligned[0]
        for i in range(1, len(aligned)):
            out = out + w[i] * aligned[i]
        return out


def _strip_pool(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Directional strip pooling: means over W and over H.

    Returns (x_h, x_w): (B, H, C) and (B, W, C). One pass each over the VPU —
    the AdaptiveAvgPool2d((None,1))/(1,None) pair of the reference.
    """
    return x.mean(axis=2), x.mean(axis=1)


class CoordAtt(nn.Module):
    """Coordinate Attention (fce_block.py:65-116; arxiv 2103.02907).

    Strip-pool H & W -> shared 1x1 bottleneck Conv+BN+SiLU over the
    concatenated (H+W) strip -> split -> per-axis 1x1 convs -> sigmoid gates.
    Output: identity(x) * a_h * a_w (broadcast outer product of gates).
    """

    inp: int
    oup: int
    reduction: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        mip = max(8, self.inp // self.reduction)
        x_h, x_w = _strip_pool(x)  # (B,H,C), (B,W,C)
        # Concatenate strips along the length axis; 1x1 conv == dense per position.
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = ConvBNAct(mip, 1, 1, p=0, name="cv1")(y, train)
        y_h, y_w = y[:, :h], y[:, h:]  # (B,H,1,mip), (B,W,1,mip)
        a_h = jax.nn.sigmoid(Conv2d(self.oup, 1, name="cv_h")(y_h))  # (B,H,1,oup)
        a_w = jax.nn.sigmoid(Conv2d(self.oup, 1, name="cv_w")(y_w))  # (B,W,1,oup)
        ident = Conv2d(self.oup, 1, name="identity")(x) if self.inp != self.oup else x
        # Broadcast: (B,H,1,C) * (B,1,W,C)
        return ident * a_h * a_w.transpose(0, 2, 1, 3)


class CoordCrossAtt(nn.Module):
    """Coordinate Cross Attention (fce_block.py:119-180).

    Pooled-H queries attend over pooled-W keys/values (a tiny (H x W)
    attention per head); a single sigmoid gate modulates the H axis.
    Note: unlike CoordAtt, cv1 here is a *plain* Conv2d (no BN/act), matching
    the reference.
    """

    inp: int
    oup: int
    reduction: int = 32
    num_heads: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        mip = max(8, self.inp // self.reduction)
        scale = (mip // self.num_heads) ** -0.5
        x_h, x_w = _strip_pool(x)
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = Conv2d(mip, 1, name="cv1")(y)
        y_h, y_w = y[:, :h, 0], y[:, h:, 0]  # (B,H,mip), (B,W,mip)

        def heads(t, length):
            # channel = head * dim_head + d (torch view(n, heads, -1, L) layout)
            return t.reshape(b, length, self.num_heads, mip // self.num_heads)

        q = heads(Conv2d(mip, 1, name="q_conv")(y_h[:, :, None]).squeeze(2), h)
        k = heads(Conv2d(mip, 1, name="k_conv")(y_w[:, :, None]).squeeze(2), w)
        v = heads(Conv2d(mip, 1, name="v_conv")(y_w[:, :, None]).squeeze(2), w)
        attn = jnp.einsum("bhnd,bwnd->bnhw", q, k) * scale  # (B, heads, H, W)
        attn = jax.nn.softmax(attn, axis=-1)
        z = jnp.einsum("bnhw,bwnd->bhnd", attn, v).reshape(b, h, mip)  # (B,H,mip)
        gate = jax.nn.sigmoid(Conv2d(self.oup, 1, name="proj")(z[:, :, None]))  # (B,H,1,oup)
        return x * gate  # broadcast over W


class BiCoordCrossAtt(nn.Module):
    """Bidirectional Coordinate Cross Attention (fce_block.py:183-284).

    Symmetric H<->W multi-head cross attention; the two branch outputs are
    linearly projected and fused *additively* before a single sigmoid
    (the 2026-07-03 fix replacing the rank-1 double-sigmoid product):
    ``out = identity(x) * sigmoid(gate_h + gate_w)``.
    """

    inp: int
    oup: int
    reduction: int = 32
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        dim_head = max(8, self.inp // self.reduction) // self.num_heads
        mid = dim_head * self.num_heads
        scale = dim_head**-0.5
        x_h, x_w = _strip_pool(x)  # (B,H,C), (B,W,C)
        xh4, xw4 = x_h[:, :, None, :], x_w[:, :, None, :]

        def heads(t, length):
            return t.reshape(b, length, self.num_heads, dim_head)

        # Branch H: queries from the H strip, keys/values from the W strip.
        q_h = heads(Conv2d(mid, 1, name="proj_q_h")(xh4).squeeze(2), h)
        k_h = heads(Conv2d(mid, 1, name="proj_k_h")(xw4).squeeze(2), w)
        v_h = heads(Conv2d(mid, 1, name="proj_v_h")(xw4).squeeze(2), w)
        attn_h = jax.nn.softmax(jnp.einsum("bhnd,bwnd->bnhw", q_h, k_h) * scale, axis=-1)
        y_h = jnp.einsum("bnhw,bwnd->bhnd", attn_h, v_h).reshape(b, h, mid)
        gate_h = Conv2d(self.oup, 1, name="out_h")(y_h[:, :, None])  # (B,H,1,oup)

        # Branch W: queries from the W strip, keys/values from the H strip.
        q_w = heads(Conv2d(mid, 1, name="proj_q_w")(xw4).squeeze(2), w)
        k_w = heads(Conv2d(mid, 1, name="proj_k_w")(xh4).squeeze(2), h)
        v_w = heads(Conv2d(mid, 1, name="proj_v_w")(xh4).squeeze(2), h)
        attn_w = jax.nn.softmax(jnp.einsum("bwnd,bhnd->bnwh", q_w, k_w) * scale, axis=-1)
        y_w = jnp.einsum("bnwh,bhnd->bwnd", attn_w, v_w).reshape(b, w, mid)
        gate_w = Conv2d(self.oup, 1, name="out_w")(y_w[:, :, None])  # (B,W,1,oup)

        gate = jax.nn.sigmoid(gate_h + gate_w.transpose(0, 2, 1, 3))  # (B,H,W,oup)
        ident = Conv2d(self.oup, 1, name="identity")(x) if self.inp != self.oup else x
        return ident * gate

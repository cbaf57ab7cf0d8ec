"""CLIP vision tower (ViT) — the image half of the CLIP pair.

The reference uses ``clip.load(...)`` for FastSAM text prompts
(models/fastsam/predict.py:148-166 `_clip_inference`: embed region crops and
the query text, pick the max-similarity region) and for mobileclip-driven
YOLOE vocabularies. This is the real architecture in flax — patch-embed conv,
class token, pre-LN transformer (packed-QKV attention, one MXU matmul per
layer), CLS pooling, projection, L2 norm — with a state-dict importer
covering BOTH HuggingFace ``CLIPVisionModelWithProjection`` and
openai-``clip`` (``visual.*``) namings, activation-parity-tested against a
random-init torch tower. Pretrained weights stay a local-checkpoint concern
(zero egress); without one the tower is honest random init.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "CLIPVisionCfg", "CLIPVisionTower", "CLIPImageEncoder",
    "clip_vision_state_dict_to_variables", "clip_preprocess",
]

# CLIP's image normalization constants (openai clip/clip.py _transform)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPVisionCfg:
    """ViT-B/32 vision-tower defaults."""

    image_size: int = 224
    patch: int = 32
    width: int = 768
    heads: int = 12
    layers: int = 12
    proj: int = 512


def _clip_vision_tower_cls():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class CLIPVisionTower(nn.Module):
        """ViT image encoder (openai CLIP model.py VisionTransformer).
        Input NHWC float, already CLIP-normalized. Returns L2-normalized
        (B, proj) embeddings."""

        cfg: CLIPVisionCfg

        @nn.compact
        def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
            c = self.cfg
            B = x.shape[0]
            n = (c.image_size // c.patch) ** 2
            x = nn.Conv(c.width, (c.patch, c.patch), strides=(c.patch, c.patch),
                        use_bias=False, name="conv1")(x)  # (B, g, g, D)
            x = x.reshape(B, n, c.width)
            cls = self.param("class_embedding", nn.initializers.normal(0.02),
                             (c.width,))
            x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.width)), x], 1)
            pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                             (n + 1, c.width))
            x = x + pos
            x = nn.LayerNorm(name="ln_pre", epsilon=1e-5)(x)
            L = n + 1
            hd = c.width // c.heads
            for i in range(c.layers):
                nm = f"blocks_{i}"
                h = nn.LayerNorm(name=f"{nm}_ln_1", epsilon=1e-5)(x)
                w_in = self.param(f"{nm}_attn_in_proj_weight",
                                  nn.initializers.normal(0.02),
                                  (3 * c.width, c.width))
                b_in = self.param(f"{nm}_attn_in_proj_bias", nn.initializers.zeros,
                                  (3 * c.width,))
                qkv = h @ w_in.T + b_in
                q, k, v = jnp.split(qkv, 3, axis=-1)
                sh = lambda t: t.reshape(B, L, c.heads, hd).transpose(0, 2, 1, 3)
                logits = sh(q) @ sh(k).transpose(0, 1, 3, 2) / jnp.sqrt(hd)
                o = (jax.nn.softmax(logits, -1) @ sh(v)).transpose(0, 2, 1, 3)
                o = o.reshape(B, L, c.width)
                w_out = self.param(f"{nm}_attn_out_proj_weight",
                                   nn.initializers.normal(0.02),
                                   (c.width, c.width))
                b_out = self.param(f"{nm}_attn_out_proj_bias",
                                   nn.initializers.zeros, (c.width,))
                x = x + (o @ w_out.T + b_out)
                h = nn.LayerNorm(name=f"{nm}_ln_2", epsilon=1e-5)(x)
                h = nn.Dense(4 * c.width, name=f"{nm}_mlp_fc1")(h)
                h = h * jax.nn.sigmoid(1.702 * h)  # quick-GELU
                x = x + nn.Dense(c.width, name=f"{nm}_mlp_fc2")(h)
            pooled = nn.LayerNorm(name="ln_post", epsilon=1e-5)(x[:, 0])
            proj = self.param("proj", nn.initializers.normal(0.02),
                              (c.width, c.proj))
            out = pooled @ proj
            return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    return CLIPVisionTower


def CLIPVisionTower(cfg: CLIPVisionCfg):  # noqa: N802 — module factory
    return _clip_vision_tower_cls()(cfg=cfg)


def clip_vision_state_dict_to_variables(sd, cfg: CLIPVisionCfg) -> dict:
    """Torch CLIP vision state dict -> flax variables (HF
    ``CLIPVisionModelWithProjection`` or openai ``visual.*`` namings)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                        np.float32) for k, v in sd.items()}
    p: dict = {}

    def ln(dst: str, src: str) -> None:
        p[dst] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}

    hf = any(k.startswith("vision_model.") for k in sd)
    if hf:
        emb = "vision_model.embeddings"
        p["conv1"] = {"kernel": sd[f"{emb}.patch_embedding.weight"]
                      .transpose(2, 3, 1, 0)}  # OIHW -> HWIO
        p["class_embedding"] = sd[f"{emb}.class_embedding"]
        p["positional_embedding"] = sd[f"{emb}.position_embedding.weight"]
        # HF's attribute really is spelled "pre_layrnorm"
        ln("ln_pre", "vision_model.pre_layrnorm")
        for i in range(cfg.layers):
            s = f"vision_model.encoder.layers.{i}"
            d = f"blocks_{i}"
            p[f"{d}_attn_in_proj_weight"] = np.concatenate(
                [sd[f"{s}.self_attn.{n}_proj.weight"] for n in "qkv"], 0)
            p[f"{d}_attn_in_proj_bias"] = np.concatenate(
                [sd[f"{s}.self_attn.{n}_proj.bias"] for n in "qkv"], 0)
            p[f"{d}_attn_out_proj_weight"] = sd[f"{s}.self_attn.out_proj.weight"]
            p[f"{d}_attn_out_proj_bias"] = sd[f"{s}.self_attn.out_proj.bias"]
            ln(f"{d}_ln_1", f"{s}.layer_norm1")
            ln(f"{d}_ln_2", f"{s}.layer_norm2")
            p[f"{d}_mlp_fc1"] = {"kernel": sd[f"{s}.mlp.fc1.weight"].T,
                                 "bias": sd[f"{s}.mlp.fc1.bias"]}
            p[f"{d}_mlp_fc2"] = {"kernel": sd[f"{s}.mlp.fc2.weight"].T,
                                 "bias": sd[f"{s}.mlp.fc2.bias"]}
        ln("ln_post", "vision_model.post_layernorm")
        p["proj"] = sd["visual_projection.weight"].T  # (P, D) -> (D, P)
    else:
        v = "visual"
        p["conv1"] = {"kernel": sd[f"{v}.conv1.weight"].transpose(2, 3, 1, 0)}
        p["class_embedding"] = sd[f"{v}.class_embedding"]
        p["positional_embedding"] = sd[f"{v}.positional_embedding"]
        ln("ln_pre", f"{v}.ln_pre")
        for i in range(cfg.layers):
            s = f"{v}.transformer.resblocks.{i}"
            d = f"blocks_{i}"
            p[f"{d}_attn_in_proj_weight"] = sd[f"{s}.attn.in_proj_weight"]
            p[f"{d}_attn_in_proj_bias"] = sd[f"{s}.attn.in_proj_bias"]
            p[f"{d}_attn_out_proj_weight"] = sd[f"{s}.attn.out_proj.weight"]
            p[f"{d}_attn_out_proj_bias"] = sd[f"{s}.attn.out_proj.bias"]
            ln(f"{d}_ln_1", f"{s}.ln_1")
            ln(f"{d}_ln_2", f"{s}.ln_2")
            p[f"{d}_mlp_fc1"] = {"kernel": sd[f"{s}.mlp.c_fc.weight"].T,
                                 "bias": sd[f"{s}.mlp.c_fc.bias"]}
            p[f"{d}_mlp_fc2"] = {"kernel": sd[f"{s}.mlp.c_proj.weight"].T,
                                 "bias": sd[f"{s}.mlp.c_proj.bias"]}
        ln("ln_post", f"{v}.ln_post")
        p["proj"] = sd[f"{v}.proj"]  # already (D, P)
    return {"params": p}


def clip_preprocess(img: np.ndarray, size: int = 224) -> np.ndarray:
    """BGR uint8 HWC -> CLIP-normalized RGB float (size, size, 3): shorter
    side resize + center crop + mean/std normalize (clip/clip.py _transform)."""
    import cv2

    h, w = img.shape[:2]
    s = size / min(h, w)
    img = cv2.resize(img, (max(size, int(round(w * s))), max(size, int(round(h * s)))),
                     interpolation=cv2.INTER_CUBIC)
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    img = img[top: top + size, left: left + size, ::-1]  # BGR -> RGB
    return (img.astype(np.float32) / 255.0 - _CLIP_MEAN) / _CLIP_STD


class CLIPImageEncoder:
    """Image half of the CLIP call contract: ``encode_image(crops) -> (N, P)``
    unit-norm embeddings. ``weights``: local HF/openai checkpoint path."""

    def __init__(self, cfg: CLIPVisionCfg | None = None, weights: str | None = None,
                 seed: int = 0):
        import jax

        self.cfg = cfg or CLIPVisionCfg()
        self.model = CLIPVisionTower(self.cfg)
        if weights:
            from fce_yolo_tpu.nn.text_model import _load_any_state_dict

            self.variables = clip_vision_state_dict_to_variables(
                _load_any_state_dict(weights), self.cfg)
        else:
            dummy = np.zeros((1, self.cfg.image_size, self.cfg.image_size, 3),
                             np.float32)
            self.variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self._fwd = jax.jit(self.model.apply)

    def encode_image(self, imgs) -> np.ndarray:
        """imgs: list of BGR uint8 crops (any sizes) or a pre-normalized
        (N, S, S, 3) float array."""
        if isinstance(imgs, np.ndarray) and imgs.dtype.kind == "f" and imgs.ndim == 4:
            x = imgs
        else:
            x = np.stack([clip_preprocess(np.asarray(im), self.cfg.image_size)
                          for im in imgs])
        return np.asarray(self._fwd(self.variables, x), np.float32)

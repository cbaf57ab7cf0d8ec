"""Text embeddings for open-vocabulary models.

The reference's nn/text_model.py wraps pretrained CLIP/MobileCLIP text
encoders. Two encoders live here:

- :class:`HashTextEncoder` — explicitly-labeled OFFLINE STUB: deterministic
  hash-seeded unit embeddings. NOT semantic (two synonyms get unrelated
  vectors) but stable across runs/processes, which makes the full
  world-model pipeline (set_classes -> C2fAttn guidance -> WorldDetect
  contrastive scores) runnable, trainable and testable offline. The default.
- :class:`CLIPTextEncoder` — the REAL CLIP text-tower architecture
  (reference nn/text_model.py:60 ``CLIP.tokenize/encode_text`` over the
  openai transformer): token+positional embeddings, pre-LN causal
  transformer with packed-QKV attention (one MXU matmul), quick-GELU MLP,
  EOT pooling, text projection, L2 normalize. Weights import from either
  HuggingFace ``CLIPTextModelWithProjection`` or openai-``clip`` state
  dicts (:func:`clip_text_state_dict_to_variables`) with activation parity
  tested against a random-init torch tower — so semantic embeddings are one
  local checkpoint away; without one the tower is honest random init.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

__all__ = [
    "HashTextEncoder", "CLIPTextCfg", "CLIPTextTower", "CLIPTextEncoder",
    "clip_text_state_dict_to_variables", "build_text_model",
]


class HashTextEncoder:
    """Deterministic per-string unit-norm embeddings (offline CLIP stand-in)."""

    def __init__(self, dim: int = 512):
        self.dim = dim

    def tokenize(self, texts):
        return list(texts)

    def encode_text(self, tokens) -> np.ndarray:
        out = np.empty((len(tokens), self.dim), np.float32)
        for i, t in enumerate(tokens):
            seed = int.from_bytes(hashlib.sha256(str(t).encode()).digest()[:8], "little")
            v = np.random.default_rng(seed).standard_normal(self.dim).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


@dataclass(frozen=True)
class CLIPTextCfg:
    """ViT-B/32 text-tower defaults (openai CLIP / HF CLIPTextConfig)."""

    vocab: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    ctx: int = 77
    proj: int = 512
    eos_id: int = 49407


def _clip_text_tower_cls():
    """Build the flax module lazily so this file stays importable without jax
    in pure-numpy consumers (the hash encoder above has no jax dependency)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class CLIPTextTower(nn.Module):
        """CLIP text transformer (reference nn/text_model.py:60 wraps
        clip.encode_text; architecture per openai CLIP model.py). Returns
        L2-normalized (B, proj) embeddings; QKV is packed into one (3C, C)
        parameter so attention runs as two MXU matmuls per layer."""

        cfg: CLIPTextCfg

        @nn.compact
        def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
            c = self.cfg
            B, L = tokens.shape
            tok_emb = nn.Embed(c.vocab, c.width, name="token_embedding")
            pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                             (c.ctx, c.width))
            x = tok_emb(tokens.astype(jnp.int32)) + pos[:L]
            blocked = jnp.triu(jnp.ones((L, L), bool), k=1)  # causal: True = masked
            hd = c.width // c.heads
            for i in range(c.layers):
                nm = f"blocks_{i}"
                h = nn.LayerNorm(name=f"{nm}_ln_1", epsilon=1e-5)(x)
                w_in = self.param(f"{nm}_attn_in_proj_weight",
                                  nn.initializers.normal(0.02), (3 * c.width, c.width))
                b_in = self.param(f"{nm}_attn_in_proj_bias", nn.initializers.zeros,
                                  (3 * c.width,))
                qkv = h @ w_in.T + b_in  # (B, L, 3C) — one packed MXU matmul
                q, k, v = jnp.split(qkv, 3, axis=-1)
                sh = lambda t: t.reshape(B, L, c.heads, hd).transpose(0, 2, 1, 3)
                logits = sh(q) @ sh(k).transpose(0, 1, 3, 2) / jnp.sqrt(hd)
                logits = jnp.where(blocked[None, None], -jnp.inf, logits)
                o = (jax.nn.softmax(logits, -1) @ sh(v)).transpose(0, 2, 1, 3)
                o = o.reshape(B, L, c.width)
                w_out = self.param(f"{nm}_attn_out_proj_weight",
                                   nn.initializers.normal(0.02), (c.width, c.width))
                b_out = self.param(f"{nm}_attn_out_proj_bias", nn.initializers.zeros,
                                   (c.width,))
                x = x + (o @ w_out.T + b_out)
                h = nn.LayerNorm(name=f"{nm}_ln_2", epsilon=1e-5)(x)
                h = nn.Dense(4 * c.width, name=f"{nm}_mlp_fc1")(h)
                h = h * jax.nn.sigmoid(1.702 * h)  # quick-GELU
                x = x + nn.Dense(c.width, name=f"{nm}_mlp_fc2")(h)
            x = nn.LayerNorm(name="ln_final", epsilon=1e-5)(x)
            # EOT pooling: first eos position (HF CLIPTextModel pooling; for
            # openai tokenizations argmax(token_id) lands on the same slot)
            has_eos = (tokens == c.eos_id).any(-1)
            eot = jnp.where(has_eos, jnp.argmax(tokens == c.eos_id, -1), L - 1)
            pooled = x[jnp.arange(B), eot]
            proj = self.param("text_projection", nn.initializers.normal(0.02),
                              (c.width, c.proj))
            out = pooled @ proj
            return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    return CLIPTextTower


def CLIPTextTower(cfg: CLIPTextCfg):  # noqa: N802 — module factory
    return _clip_text_tower_cls()(cfg=cfg)


def clip_text_state_dict_to_variables(sd, cfg: CLIPTextCfg) -> dict:
    """Torch CLIP text-tower state dict -> flax variables.

    Accepts BOTH namings:
    - HuggingFace ``CLIPTextModelWithProjection``
      (``text_model.encoder.layers.{i}.self_attn.q_proj.weight`` ...,
      ``text_projection.weight`` stored (P, D));
    - openai ``clip`` (reference nn/text_model.py loads these:
      ``transformer.resblocks.{i}.attn.in_proj_weight`` ...,
      ``text_projection`` stored (D, P)).
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                        np.float32) for k, v in sd.items()}
    p: dict = {}

    def ln(dst: str, src: str) -> None:
        p[dst] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}

    hf = any(k.startswith("text_model.") for k in sd)
    if hf:
        p["token_embedding"] = {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]}
        p["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
        for i in range(cfg.layers):
            s = f"text_model.encoder.layers.{i}"
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
        ln("ln_final", "text_model.final_layer_norm")
        p["text_projection"] = sd["text_projection.weight"].T  # (P, D) -> (D, P)
    else:
        p["token_embedding"] = {"embedding": sd["token_embedding.weight"]}
        p["positional_embedding"] = sd["positional_embedding"]
        for i in range(cfg.layers):
            s = f"transformer.resblocks.{i}"
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
        ln("ln_final", "ln_final")
        p["text_projection"] = sd["text_projection"]  # already (D, P)
    return {"params": p}


class CLIPTextEncoder:
    """Real CLIP text tower behind the text-model call contract
    (tokenize -> encode_text). ``weights`` may be an openai-clip or HF
    state-dict path (.pt/.npz); without one the tower is random init —
    structurally real, semantically meaningless, and said so."""

    def __init__(self, cfg: CLIPTextCfg | None = None, weights: str | None = None,
                 seed: int = 0, vocab: str | None = None):
        import jax

        self.cfg = cfg or CLIPTextCfg()
        self.model = CLIPTextTower(self.cfg)
        if weights:
            sd = _load_any_state_dict(weights)
            self.variables = clip_text_state_dict_to_variables(sd, self.cfg)
        else:
            dummy = np.zeros((1, self.cfg.ctx), np.int32)
            self.variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self._fwd = jax.jit(self.model.apply)
        from fce_yolo_tpu.nn.bpe import find_local_vocab

        self.vocab = vocab or find_local_vocab()
        self._bpe = None
        self._warned = False

    def tokenize(self, texts) -> np.ndarray:
        """Real CLIP byte-level BPE when a vocab is available — an explicit
        ``vocab=`` path / ``FY_CLIP_VOCAB`` env (nn/bpe.py, the reference's
        ``clip.tokenize`` algorithm) or transformers' local tokenizer files.
        Otherwise a deterministic hash tokenization into the vocab (stable,
        non-semantic — mirrors the HashTextEncoder contract) with a warning."""
        texts = [str(t) for t in texts]
        if self.vocab:
            if self._bpe is None:
                from fce_yolo_tpu.nn.bpe import CLIPBPETokenizer

                self._bpe = CLIPBPETokenizer(self.vocab, context_length=self.cfg.ctx)
            return self._bpe.tokenize(texts)
        try:
            from transformers import CLIPTokenizerFast

            tk = CLIPTokenizerFast.from_pretrained("openai/clip-vit-base-patch32",
                                                   local_files_only=True)
            out = tk(texts, padding="max_length", max_length=self.cfg.ctx,
                     truncation=True, return_tensors="np")
            return out["input_ids"].astype(np.int32)
        except Exception:
            if not self._warned:
                self._warned = True
                from fce_yolo_tpu.utils import LOGGER

                LOGGER.warning(
                    "CLIPTextEncoder: no BPE vocab found (pass vocab= or set "
                    "FY_CLIP_VOCAB to a local merges file) — falling back to "
                    "the deterministic NON-SEMANTIC hash tokenizer"
                )
            toks = np.zeros((len(texts), self.cfg.ctx), np.int32)
            for i, t in enumerate(texts):
                words = t.lower().split() or [t]
                ids = [int.from_bytes(hashlib.sha256(w.encode()).digest()[:4],
                                      "little") % (self.cfg.vocab - 2) + 1
                       for w in words[: self.cfg.ctx - 2]]
                row = [0, *ids, self.cfg.eos_id]
                toks[i, : len(row)] = row
            return toks

    def encode_text(self, tokens) -> np.ndarray:
        if not isinstance(tokens, np.ndarray) or tokens.dtype.kind not in "iu":
            tokens = self.tokenize(tokens)
        return np.asarray(self._fwd(self.variables, tokens), np.float32)


def _load_any_state_dict(path: str) -> dict:
    if str(path).endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return sd.get("state_dict", sd)


def build_text_model(spec: str = "hash:512", device=None, weights: str | None = None,
                     vocab: str | None = None):
    """Reference build_text_model analog (nn/text_model.py:350).

    - ``hash:<dim>`` -> offline stub (default; no weights exist here);
    - ``clip`` / ``clip:<weights-path>`` -> the real tower, random init
      unless a local openai/HF checkpoint path is given. ``vocab=`` (or the
      ``FY_CLIP_VOCAB`` env var) points at a local BPE merges file exactly
      like the weights path — with both, text encoding is the reference's
      ``clip.tokenize`` + CLIP tower end to end.
    """
    if spec.startswith("hash"):
        dim = int(spec.split(":")[1]) if ":" in spec else 512
        return HashTextEncoder(dim)
    if spec.startswith("clip") or spec.startswith("mobileclip"):
        w = weights or (spec.split(":", 1)[1] if ":" in spec else None)
        return CLIPTextEncoder(weights=w or None, vocab=vocab)
    raise NotImplementedError(
        f"text model {spec!r}: use 'hash:<dim>', 'clip', or "
        "'clip:<local-checkpoint-path>'"
    )

"""Text embeddings for open-vocabulary models.

The reference's nn/text_model.py wraps pretrained CLIP/MobileCLIP text
encoders — weights that cannot exist in this zero-egress environment. This
module keeps the same API shape with an explicitly-labeled OFFLINE STUB:
deterministic hash-seeded unit embeddings. They are NOT semantic — two
synonyms get unrelated vectors — but they are stable across runs/processes,
which makes the full world-model pipeline (set_classes -> C2fAttn guidance
-> WorldDetect contrastive scores) runnable, trainable and testable offline.
Plug a real encoder by passing ``encode_fn`` to :func:`build_text_model` or
monkey-patching ``WorldModel.get_text_pe``.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["HashTextEncoder", "build_text_model"]


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


def build_text_model(spec: str = "hash:512", device=None):
    """Reference build_text_model analog. Only the offline "hash:<dim>"
    encoder exists here; "clip:*" raises with a clear explanation."""
    if spec.startswith("hash"):
        dim = int(spec.split(":")[1]) if ":" in spec else 512
        return HashTextEncoder(dim)
    raise NotImplementedError(
        f"text model {spec!r} needs pretrained weights that cannot be "
        "downloaded in this environment; use 'hash:<dim>' or supply your own "
        "encoder"
    )

"""SAM3 facade: concept-promptable detection + segmentation.

Mirrors the reference `SAM3SemanticPredictor` contract
(models/sam/predict.py:2213-2337): text phrases and/or box exemplars in,
per-instance boxes + scores + masks for EVERY matching instance out.

Offline text: CLIP BPE assets need egress, so tokens come from a
deterministic hash tokenizer (one id per whitespace word, 0 = pad) — the
encoder architecture and weight layout are exact (nn/sam3.py), only the
vocabulary mapping differs from the reference's SimpleTokenizer.
"""

from __future__ import annotations

import hashlib
from types import SimpleNamespace

import numpy as np

from fce_yolo_tpu.nn.sam3 import SAM3SemanticModel, sam3_state_dict_to_variables

__all__ = ["SAM3", "SAM3VideoPredictor", "hash_tokenize"]


def hash_tokenize(texts, context_length: int = 32, vocab_size: int = 49408
                  ) -> np.ndarray:
    """Deterministic word-level tokens (offline SimpleTokenizer stand-in):
    id = sha256(word) % (vocab - 3) + 3, with CLIP-style SOT=vocab-2 /
    EOT=vocab-1 sentinels and 0 = pad."""
    out = np.zeros((len(texts), context_length), np.int64)
    for i, t in enumerate(texts):
        ids = [vocab_size - 2]
        for w in str(t).lower().split():
            h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:8], "little")
            ids.append(h % (vocab_size - 3) + 3)
        ids.append(vocab_size - 1)
        ids = ids[:context_length]
        out[i, : len(ids)] = ids
    return out


class SAM3:
    """Concept segmentation: ``SAM3(...).predict(img, text=["a red car"])``
    returns every matching instance (reference predict.py:2213)."""

    def __init__(self, model: str | None = None, image_size: int = 1008,
                 _random_init: bool = False, _cfg: dict | None = None):
        import jax

        cfg = dict(img_size=image_size)
        if _cfg:
            cfg.update(_cfg)
        self.model = SAM3SemanticModel(**cfg)
        self.image_size = cfg.get("img_size", image_size)
        self.context_length = self.model.context_length
        self.vocab_size = self.model.vocab_size
        if model is not None and not _random_init:
            from fce_yolo_tpu.nn.import_torch import load_pt_state_dict

            self.variables = sam3_state_dict_to_variables(load_pt_state_dict(model))
        else:  # random init without materializing a fwd pass (sam.py pattern)
            small = jax.eval_shape(
                lambda k, x, t: self.model.init(k, x, t),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((1, self.image_size, self.image_size, 3),
                                     np.float32),
                jax.ShapeDtypeStruct((1, self.context_length), np.int32))
            leaves, treedef = jax.tree_util.tree_flatten(small)
            rng = np.random.RandomState(0)
            self.variables = jax.tree_util.tree_unflatten(
                treedef,
                [np.asarray(rng.normal(0, 0.02, l.shape), l.dtype) for l in leaves])
        self._jits: dict = {}
        self.names: list[str] = []
        self._text = None  # (mask, feats) for self.names

    # ------------------------------------------------------------- helpers
    def _jit(self, key, fn):
        import jax

        if key not in self._jits:
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def set_classes(self, text: list[str]) -> None:
        """Encode concept phrases once (reference sam3_image.py:332)."""
        import jax.numpy as jnp

        tok = hash_tokenize(text, self.context_length, self.vocab_size)
        fn = self._jit("text", lambda v, t: self.model.apply(
            v, t, method=self.model.encode_text))
        mask, feats = fn(self.variables, jnp.asarray(tok, jnp.int32))
        self.names = list(text)
        self._text = (np.asarray(mask), np.asarray(feats))

    # ------------------------------------------------------------- predict
    def predict(self, img: np.ndarray, text: list[str] | None = None,
                bboxes=None, labels=None, conf: float = 0.5,
                mask_threshold: float = 0.5) -> SimpleNamespace:
        """img HWC uint8/float; text list of concept phrases; bboxes (N, 4)
        xyxy exemplars in the original frame (one concept). Returns
        SimpleNamespace(boxes xyxy, scores, cls, masks bool (M, H, W)).

        Priority mirrors the reference (_inference_features): bboxes > text
        > previously set classes; scale_fill letterbox (pre_transform:2227).
        """
        import cv2
        import jax.numpy as jnp

        h0, w0 = img.shape[:2]
        x = cv2.resize(np.asarray(img), (self.image_size, self.image_size),
                       interpolation=cv2.INTER_LINEAR)
        x = np.ascontiguousarray(x[None], np.float32) / 255.0

        if bboxes is not None:
            nc = 1
            if text is None:
                text = ["visual"]
        if text is not None and self.names != list(text):
            self.set_classes(list(text))
        assert self._text is not None, "pass text= or call set_classes first"
        tmask, tfeats = self._text
        nc = 1 if bboxes is not None else len(self.names)

        # geometry prompt: pow2-padded exemplar slots, one concept
        if bboxes is not None:
            bx = np.asarray(bboxes, np.float32).reshape(-1, 4)
            n = max(2, 1 << (int(bx.shape[0]) - 1).bit_length())
            gb = np.zeros((nc, n, 4), np.float32)
            gm = np.ones((nc, n), bool)
            gl = np.ones((nc, n), np.int32)
            cx = (bx[:, 0] + bx[:, 2]) / 2 / w0
            cy = (bx[:, 1] + bx[:, 3]) / 2 / h0
            bw = (bx[:, 2] - bx[:, 0]) / w0
            bh = (bx[:, 3] - bx[:, 1]) / h0
            gb[0, : bx.shape[0]] = np.stack([cx, cy, bw, bh], -1)
            gm[0, : bx.shape[0]] = False
            if labels is not None:
                gl[0, : bx.shape[0]] = np.asarray(labels, np.int32).reshape(-1)
        else:
            n = 1
            gb = np.zeros((nc, 1, 4), np.float32)
            gm = np.ones((nc, 1), bool)
            gl = np.ones((nc, 1), np.int32)

        def run(v, x, tm, tf, gb, gm, gl):
            bo = self.model.apply(v, x, method=self.model.encode_image)
            # broadcast the single image to the nc concept batch (pos
            # encodings carry no batch axis)
            bo["backbone_fpn"] = [
                jnp.broadcast_to(f, (tm.shape[0],) + f.shape[1:])
                for f in bo["backbone_fpn"]]
            return self.model.apply(v, bo, tm, tf, gb, gm, gl,
                                    method=self.model.forward_grounding)

        out = self._jit(("ground", nc, n), run)(
            self.variables, jnp.asarray(x), jnp.asarray(tmask[:nc]),
            jnp.asarray(tfeats[:nc]), jnp.asarray(gb), jnp.asarray(gm),
            jnp.asarray(gl))

        # postprocess (reference predict.py:2295-2337)
        logits = np.asarray(out["pred_logits"])[..., 0]          # (nc, nq)
        presence = np.asarray(out["presence_logit_dec"])         # (nc, 1)
        scores = _sigmoid(logits) * _sigmoid(presence)
        boxes = np.asarray(out["pred_boxes"])                    # (nc, nq, 4)
        masks = np.asarray(out["pred_masks"])                    # (nc, nq, h, w)
        keep = scores > conf
        ci, qi = np.nonzero(keep)
        sc = scores[ci, qi]
        bx = boxes[ci, qi]
        xy = np.stack([(bx[:, 0] - bx[:, 2] / 2) * w0,
                       (bx[:, 1] - bx[:, 3] / 2) * h0,
                       (bx[:, 0] + bx[:, 2] / 2) * w0,
                       (bx[:, 1] + bx[:, 3] / 2) * h0], -1)
        mk = np.stack([cv2.resize(np.asarray(masks[c, q], np.float32),
                                  (w0, h0), interpolation=cv2.INTER_LINEAR)
                       for c, q in zip(ci, qi)]) if len(ci) else \
            np.zeros((0, h0, w0), np.float32)
        return SimpleNamespace(boxes=xy, scores=sc, cls=ci,
                               masks=mk > mask_threshold,
                               names=self.names)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class SAM3VideoPredictor:
    """Interactive (point-prompted) video tracking with the SAM3 tracker
    (reference Sam3TrackerPredictor via build_interactive_sam3,
    build_sam3.py:258-343): SAM2's streaming-memory machinery driven by the
    ViTDet trunk's SAM2 neck at 1008 px / stride 14.

    Reuses the fixed-capacity memory-bank predictor loop from
    :class:`fce_yolo_tpu.models.sam2.SAM2VideoPredictor` — the tracker model
    shares the same method-dispatched stage interface.
    """

    def __new__(cls, model: str | None = None, image_size: int = 1008,
                _random_init: bool = False, _cfg: dict | None = None,
                num_maskmem: int = 7, max_obj_ptrs: int = 16):
        import jax

        from fce_yolo_tpu.models.sam2 import SAM2VideoPredictor
        from fce_yolo_tpu.nn.sam3 import (SAM3TrackerModel,
                                          sam3_tracker_state_dict_to_variables)

        vp = SAM2VideoPredictor.__new__(SAM2VideoPredictor)
        cfg = dict(image_size=image_size)
        if _cfg:
            cfg.update(_cfg)
        vp.model = SAM3TrackerModel(**cfg)
        vp.image_size = vp.model.image_size
        if model is not None and not _random_init:
            from fce_yolo_tpu.nn.import_torch import load_pt_state_dict

            vp.variables = sam3_tracker_state_dict_to_variables(
                load_pt_state_dict(model))
        else:
            small = jax.eval_shape(
                lambda k, x: vp.model.init(k, x, method=vp.model.init_all),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((1, vp.image_size, vp.image_size, 3),
                                     np.float32))
            leaves, treedef = jax.tree_util.tree_flatten(small)
            rng = np.random.RandomState(0)
            vp.variables = jax.tree_util.tree_unflatten(
                treedef,
                [np.asarray(rng.normal(0, 0.02, l.shape), l.dtype)
                 for l in leaves])
        vp._jits = {}
        vp.num_maskmem = num_maskmem
        vp.max_obj_ptrs = max_obj_ptrs
        return vp

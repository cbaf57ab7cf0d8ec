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

__all__ = ["SAM3", "SAM3VideoPredictor", "SAM3VideoSemanticPredictor",
           "hash_tokenize"]


def hash_tokenize(texts, context_length: int = 32, vocab_size: int = 49408
                  ) -> np.ndarray:
    """Deterministic word-level tokens (offline SimpleTokenizer stand-in):
    id = sha256(word) % (vocab - 3) + 3, with CLIP-style SOT=vocab-2 /
    EOT=vocab-1 sentinels and 0 = pad. When a real BPE vocab is present
    locally (``FY_CLIP_VOCAB``), the reference's byte-level BPE
    (nn/bpe.py) is used instead — same algorithm SAM3's VE text encoder
    tokenizes with (reference sam3 text path -> CLIP SimpleTokenizer)."""
    from fce_yolo_tpu.nn.bpe import find_local_vocab

    vocab_path = find_local_vocab()
    if vocab_path:
        from fce_yolo_tpu.nn.bpe import CLIPBPETokenizer

        tk = CLIPBPETokenizer(vocab_path, context_length=context_length)
        return tk.tokenize([str(t) for t in texts]).astype(np.int64)
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


class SAM3VideoSemanticPredictor:
    """Concept-driven video segmentation: detect-then-track
    (reference predict.py SAM3VideoSemanticPredictor:2459-2900).

    Per frame: the semantic detector proposes instances of the text concept;
    a bank of tracker masklets propagates existing objects (image encoded
    ONCE, one compiled per-object step); detections and tracklets are
    associated by mask IoU. Matched tracklets refresh their keep-alive,
    unmatched ones decay and die, and unmatched confident detections seed
    new masklets through the tracker's mask-as-output conditioning path
    (sam.py:553-599). Overlapping tracklets are resolved with the
    pixelwise non-overlap + shrinkage suppression (sam.py:1139-1160).

    Mirrors the reference association core + refinements
    (predict.py:2459-2560, _associate_det_trk, _process_hotstart,
    update_masklet_confirmation_status):

    - many-to-one association: every tracklet with IoU >= assoc thresh
      matches a detection; a detection is NEW only if no tracklet matches
      and its score clears ``new_det_thresh``;
    - keep-alive: +1 on match (capped), -1 when unmatched or empty
      (floored); a tracklet with unmatched history dies at keep-alive <= 0;
    - **hotstart** (``hotstart_delay`` > 0): outputs of young masklets are
      held back for ``hotstart_delay`` frames; within that window a masklet
      is killed if unmatched on >= ``hotstart_unmatch_thresh`` frames or if
      it co-matches the same detection as an earlier-born masklet on >=
      ``hotstart_dup_thresh`` frames (duplicate suppression);
    - **masklet confirmation** (``masklet_confirmation_enable``): masklets
      start UNCONFIRMED and confirm after
      ``masklet_confirmation_consecutive_det_thresh`` consecutive matched
      frames; unconfirmed ids are reported in ``unconfirmed_obj_ids`` for
      display suppression (reference out["unconfirmed_obj_ids"]).

    The multi-GPU sharding refinement is N.A. here (single-host streaming
    contract; multi-chip goes through jax.sharding meshes instead).
    """

    UNCONFIRMED, CONFIRMED = 1, 2  # reference predict.py:2468-2469

    def __init__(self, semantic: "SAM3", tracker, max_objects: int = 8,
                 score_threshold_detection: float = 0.5,
                 assoc_iou_thresh: float = 0.5,
                 trk_assoc_iou_thresh: float | None = None,
                 new_det_thresh: float = 0.5,
                 max_trk_keep_alive: int = 30, min_trk_keep_alive: int = -4,
                 init_trk_keep_alive: int = 30,
                 decrease_trk_keep_alive_for_empty_masklets: bool = True,
                 hotstart_delay: int = 0, hotstart_unmatch_thresh: int = 3,
                 hotstart_dup_thresh: int = 3,
                 masklet_confirmation_enable: bool = False,
                 masklet_confirmation_consecutive_det_thresh: int = 3):
        self.semantic = semantic
        self.tracker = tracker  # SAM2VideoPredictor-shaped (SAM3VideoPredictor)
        self.max_objects = max_objects
        self.score_threshold_detection = score_threshold_detection
        self.assoc_iou_thresh = assoc_iou_thresh
        self.trk_assoc_iou_thresh = (assoc_iou_thresh if trk_assoc_iou_thresh
                                     is None else trk_assoc_iou_thresh)
        self.new_det_thresh = new_det_thresh
        self.max_trk_keep_alive = max_trk_keep_alive
        self.min_trk_keep_alive = min_trk_keep_alive
        self.init_trk_keep_alive = init_trk_keep_alive
        self.decrease_empty = decrease_trk_keep_alive_for_empty_masklets
        if hotstart_delay > 0:  # reference predict.py:2531-2533
            assert hotstart_unmatch_thresh <= hotstart_delay
            assert hotstart_dup_thresh <= hotstart_delay
        self.hotstart_delay = hotstart_delay
        self.hotstart_unmatch_thresh = hotstart_unmatch_thresh
        self.hotstart_dup_thresh = hotstart_dup_thresh
        self.masklet_confirmation_enable = masklet_confirmation_enable
        self.masklet_confirmation_consecutive_det_thresh = (
            masklet_confirmation_consecutive_det_thresh)
        self._overlap_pairs: dict = {}  # (first_born_id, id) -> [frames]

    @staticmethod
    def _mask_iou(a: np.ndarray, b: np.ndarray) -> float:
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        return float(inter) / float(union) if union else 0.0

    def _associate_and_prune(self, slots: list, det_masks, det_scores,
                             t: int) -> tuple[list, list]:
        """Per-frame bank bookkeeping given detections + propagated slot
        masks. Pure host logic (no model calls) so the hotstart/confirmation
        behavior is directly testable with scripted masks.

        Mirrors reference _associate_det_trk + _process_hotstart +
        update_masklet_confirmation_status. Returns (surviving slots,
        per-detection is_new flags).
        """
        # many-to-one association: every tracklet above trk_assoc_iou_thresh
        # is matched; a detection is new only if NO tracklet clears
        # assoc_iou_thresh and its score clears new_det_thresh
        nd = len(det_masks)
        ious = np.zeros((nd, len(slots)), np.float32)
        for di in range(nd):
            for j, s in enumerate(slots):
                ious[di, j] = self._mask_iou(det_masks[di], s["mask"])
        trk_nonempty = np.array([s["mask"].any() for s in slots], bool)
        trk_matched = ((ious >= self.trk_assoc_iou_thresh).any(axis=0)
                       if nd else np.zeros(len(slots), bool))
        is_new_det = [
            float(det_scores[di]) >= self.new_det_thresh
            and not (len(slots) and (ious[di] >= self.assoc_iou_thresh).any())
            for di in range(nd)
        ]
        det_matches = [
            [j for j in range(len(slots)) if ious[di, j] >= self.assoc_iou_thresh]
            for di in range(nd)
        ]

        # keep-alive (reference _process_hotstart step 1): +1 on match
        # capped at max; -1 when unmatched / empty, floored at min
        for j, s in enumerate(slots):
            if trk_matched[j]:
                s["keep"] = min(self.max_trk_keep_alive, s["keep"] + 1)
                s["consec"] += 1
            elif trk_nonempty[j]:
                s["keep"] = max(self.min_trk_keep_alive, s["keep"] - 1)
                s["unmatched"].append(t)
                s["consec"] = 0
            else:
                if self.decrease_empty:
                    s["keep"] = max(self.min_trk_keep_alive, s["keep"] - 1)
                s["consec"] = 0
            if s["consec"] >= self.masklet_confirmation_consecutive_det_thresh:
                s["status"] = self.CONFIRMED

        # hotstart removals (reference _process_hotstart steps 2+3):
        # young = first appeared within the last hotstart_delay frames
        removed: set[int] = set()
        hotstart_diff = t - self.hotstart_delay
        for s in slots:
            if s["unmatched"]:
                if (len(s["unmatched"]) >= self.hotstart_unmatch_thresh
                        and s["t0"] > hotstart_diff):
                    removed.add(s["id"])
                if s["keep"] <= 0:
                    removed.add(s["id"])
        # duplicate suppression: two masklets matched to one detection;
        # the later-born one accumulates overlap frames
        for di in range(nd):
            js = det_matches[di]
            if len(js) < 2:
                continue
            first = min(js, key=lambda j: (slots[j]["t0"], slots[j]["id"]))
            for j in js:
                if j == first:
                    continue
                key = (slots[first]["id"], slots[j]["id"])
                self._overlap_pairs.setdefault(key, []).append(t)
        for (_fid, oid), frames in self._overlap_pairs.items():
            s = next((x for x in slots if x["id"] == oid), None)
            if (s is not None and s["t0"] > hotstart_diff
                    and len(frames) >= self.hotstart_dup_thresh):
                removed.add(oid)
        kept = [s for s in slots if s["id"] not in removed]
        # prune pairs whose masklet is dead/removed — otherwise frame lists
        # grow and get linearly re-scanned for the whole stream (the
        # reference skips these via removed_obj_ids)
        live = {s["id"] for s in kept}
        self._overlap_pairs = {
            k: v for k, v in self._overlap_pairs.items() if k[1] in live}
        return kept, is_new_det

    def track(self, frames, text: str, num_frames: int | None = None):
        """Yields per frame SimpleNamespace(obj_ids, masks (N, H, W) bool,
        scores) for every live masklet of concept ``text``."""
        import cv2
        import jax.numpy as jnp

        from fce_yolo_tpu.nn.sam3 import SAM3TrackerModel

        tr = self.tracker
        v = tr.variables
        S = tr.image_size
        encode = tr._encode()
        step = tr._track_with_feats()
        cond_mask = tr._cond_from_mask()
        slots: list[dict] = []
        next_id = 0
        self._overlap_pairs = {}  # (first_born_id, id) -> [overlap frames]

        for t, frame in enumerate(frames):
            h0, w0 = frame.shape[:2]
            x, _ = tr._prep(frame)
            f0, f1, f16, pos16 = encode(v, jnp.asarray(x)[None])
            t_max = jnp.float32(
                min(num_frames or tr.max_obj_ptrs, tr.max_obj_ptrs) - 1)

            # 1) propagate every live masklet through ONE compiled step
            for s in slots:
                bank = tr._assemble_bank(s["cond_mem"], s["cond_ptr"],
                                         s["t0"], s["recent"], t)
                low, high, ptr, score, mem = step(
                    v, f0, f1, f16, pos16, *map(jnp.asarray, bank), t_max)
                hw = mem.shape[1] * mem.shape[2]
                s["recent"].append((t, np.asarray(mem).reshape(hw, -1),
                                    np.asarray(ptr)[0]))
                if len(s["recent"]) > tr.num_maskmem - 1:
                    s["recent"].pop(0)
                s["logits"] = np.asarray(high, np.float32)[0, 0]  # (S, S)
                s["obj_logit"] = float(np.asarray(score)[0, 0])

            # cross-object suppression (SAM3Model, sam.py:1139-1160)
            if len(slots) > 1:
                stacked = jnp.asarray(
                    np.stack([s["logits"] for s in slots])[:, None])
                sup = np.asarray(
                    SAM3TrackerModel.suppress_object_pw_area_shrinkage(stacked))
                for s, m in zip(slots, sup[:, 0]):
                    s["logits"] = m

            for s in slots:
                lg = cv2.resize(s["logits"], (w0, h0),
                                interpolation=cv2.INTER_LINEAR)
                s["mask"] = lg > tr.mask_threshold

            # 2) detect the concept on this frame
            det = self.semantic.predict(
                frame, text=[text], conf=self.score_threshold_detection)

            # 3) association + keep-alive + hotstart + confirmation
            slots, is_new_det = self._associate_and_prune(
                slots, det.masks, det.scores, t)

            # 4) new confident detections seed masklets via the
            # mask-as-output conditioning path
            for di, new in enumerate(is_new_det):
                if not new:
                    continue
                if len(slots) >= self.max_objects:
                    break
                m = cv2.resize(det.masks[di].astype(np.float32), (S, S),
                               interpolation=cv2.INTER_LINEAR)
                low, high, ptr, score, mem, _ = cond_mask(
                    v, f0, f1, f16, jnp.asarray(m)[None, :, :, None])
                hw = mem.shape[1] * mem.shape[2]
                slots.append(dict(
                    id=next_id, t0=t,
                    cond_mem=np.asarray(mem).reshape(hw, -1),
                    cond_ptr=np.asarray(ptr)[0], recent=[],
                    keep=self.init_trk_keep_alive, consec=1,
                    status=self.UNCONFIRMED, unmatched=[],
                    obj_logit=float(np.asarray(score)[0, 0]),
                    mask=det.masks[di].astype(bool)))
                next_id += 1

            # emit: alive, past the hotstart hold-back window (streaming
            # analog of the reference's delayed-output buffer), and — when
            # confirmation is on — confirmed; unconfirmed ids reported
            live = [s for s in slots
                    if s["keep"] > 0 and t - s["t0"] >= self.hotstart_delay]
            emit = [s for s in live
                    if not self.masklet_confirmation_enable
                    or s["status"] == self.CONFIRMED]
            yield SimpleNamespace(
                obj_ids=np.asarray([s["id"] for s in emit], np.int64),
                masks=(np.stack([s["mask"] for s in emit])
                       if emit else np.zeros((0, h0, w0), bool)),
                scores=np.asarray([_sigmoid(np.float64(s["obj_logit"]))
                                   for s in emit], np.float32),
                unconfirmed_obj_ids=[s["id"] for s in live
                                     if s["status"] != self.CONFIRMED])

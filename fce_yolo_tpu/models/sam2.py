"""SAM2 facade: promptable image segmentation + streaming-video tracking
(reference models/sam/predict.py SAM2Predictor:817-1013 +
SAM2VideoPredictor:1016-1940, models/sam/modules/sam.py track_step:919-981).

TPU-native memory bank
----------------------
The reference predictor concatenates a python list of per-frame memories
whose length grows with the video (sam.py:780) — under jit that recompiles
per frame. Here the bank is FIXED CAPACITY:

  - ``num_maskmem`` spatial slots (slot t_pos in [0, 7): slot 0 = the
    conditioning frame, slots 1..6 the trailing window), each HW x 64
    tokens, carrying its temporal embedding ``maskmem_tpos_enc[6 - t_pos]``;
  - ``max_obj_ptrs`` pointer slots (4 tokens each after the 256 -> 4 x 64
    split), with their 1D sine temporal encodings;
  - a validity mask lowered into the attention logits.

Masked fixed-capacity attention is numerically IDENTICAL to the reference's
variable-length concat (softmax over the same live keys, the pad keys get
-inf), so every frame after the first runs ONE compiled XLA program.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from fce_yolo_tpu.nn.sam2 import (
    SAM2_CONFIGS,
    SAM2Model,
    build_sam2,
    sam2_state_dict_to_variables,
)

__all__ = ["SAM2", "SAM2VideoPredictor", "SAM2DynamicInteractivePredictor"]


class SAM2:
    """Promptable image segmentation with SAM2 (image-mode predictor).

    Example:
        sam = SAM2("sam2_t.pt")  # or variant="sam2_t", _random_init=True
        res = sam.predict(img, points=[[400, 300]], labels=[1])
    """

    mask_threshold = 0.0

    def __init__(self, model: str | None = None, variant: str = "sam2_t",
                 image_size: int = 1024, _random_init: bool = False):
        import jax

        if model is not None:
            variant = model.rsplit("/", 1)[-1].replace(".pt", "")
        variant = variant.replace("-", "_").replace("sam2.1", "sam2")
        assert variant in SAM2_CONFIGS, f"unknown SAM2 variant {variant}"
        self.image_size = image_size
        self.model: SAM2Model = build_sam2(variant, image_size)
        if model is not None and not _random_init:
            from fce_yolo_tpu.nn.import_torch import load_pt_state_dict

            self.variables = sam2_state_dict_to_variables(load_pt_state_dict(model))
        else:
            import jax.numpy as jnp

            small = jax.eval_shape(
                lambda k, x: self.model.init(k, x, method=self.model.init_all),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((1, image_size, image_size, 3), np.float32),
            )
            leaves, treedef = jax.tree_util.tree_flatten(small)
            rng = np.random.RandomState(0)
            self.variables = jax.tree_util.tree_unflatten(
                treedef,
                [np.asarray(rng.normal(0, 0.02, l.shape), l.dtype) for l in leaves],
            )
        self._jits: dict = {}

    # ------------------------------------------------------------------ util
    # ImageNet normalization (reference predict.py Predictor.preprocess)
    _MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
    _STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0

    def _prep(self, img: np.ndarray) -> tuple[np.ndarray, tuple[int, int]]:
        import cv2

        h, w = img.shape[:2]
        im = cv2.resize(img.astype(np.float32), (self.image_size, self.image_size),
                        interpolation=cv2.INTER_LINEAR)
        return (im - self._MEAN) / self._STD, (h, w)

    def _jit(self, key: str, fn):
        import jax

        if key not in self._jits:
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    # ----------------------------------------------------------- image mode
    def predict(self, img: np.ndarray, points=None, labels=None,
                multimask_output: bool = False) -> dict:
        """Single-image prompt -> mask. Points in source-image pixels."""
        import jax.numpy as jnp

        x, (h0, w0) = self._prep(img)
        if points is not None:
            pts = np.asarray(points, np.float32).reshape(1, -1, 2)
            pts = pts * np.array([self.image_size / w0, self.image_size / h0], np.float32)
            lab = np.asarray(labels if labels is not None else [1] * pts.shape[1],
                             np.int32).reshape(1, -1)
            prompts = (jnp.asarray(pts), jnp.asarray(lab))
        else:
            prompts = None

        run = self._jit(
            f"img_{points is not None and pts.shape[1]}_{multimask_output}",
            lambda v, x, p: self.model.apply(v, x, points=p,
                                             multimask_output=multimask_output),
        )
        outs = run(self.variables, jnp.asarray(x)[None], prompts)
        low_multi, high_multi, ious, low, high, obj_ptr, obj_logits = outs
        import cv2

        hm = np.asarray(high[0, 0], np.float32)
        mask = cv2.resize(hm, (w0, h0), interpolation=cv2.INTER_LINEAR) > self.mask_threshold
        return {"mask": mask, "iou": np.asarray(ious)[0],
                "obj_score": float(np.asarray(obj_logits)[0, 0]),
                "low_res_logits": np.asarray(low)[0]}


class SAM2VideoPredictor(SAM2):
    """Streaming video object tracking with the fixed-capacity memory bank.

    Usage:
        vp = SAM2VideoPredictor(variant="sam2_t", image_size=512)
        masks = list(vp.track(frames, points=[[x, y]], labels=[1]))
    """

    def __init__(self, *a, num_maskmem: int = 7, max_obj_ptrs: int = 16, **kw):
        super().__init__(*a, **kw)
        self.num_maskmem = num_maskmem
        self.max_obj_ptrs = max_obj_ptrs

    # one jitted program for the conditioning frame, one for every other
    def _cond_step(self):
        import jax.numpy as jnp

        def run(v, x, pts, lab):
            enc = self.model.apply(v, x, method=self.model.encode_image)
            f0, f1, f16 = enc["backbone_fpn"]
            feat = self.model.apply(v, f16, method=self.model.no_mem_features)
            outs = self.model.apply(
                v, feat, (pts, lab), None, [f0, f1], True,
                method=self.model.forward_sam_heads)
            mem, mem_pos = self.model.apply(
                v, f16, outs[4], outs[6], method=self.model.encode_memory)
            return outs[3], outs[4], outs[5], outs[6], mem, mem_pos

        return self._jit("cond", run)

    def _encode(self):
        """Jitted image encoding alone — lets multi-object predictors encode
        ONCE per frame and run the (cheaper) per-object step N times."""
        def run(v, x):
            enc = self.model.apply(v, x, method=self.model.encode_image)
            f0, f1, f16 = enc["backbone_fpn"]
            return f0, f1, f16, enc["vision_pos_enc"][-1]

        return self._jit("enc", run)

    def _cond_from_mask(self):
        """Conditioning step from a MASK prompt (reference
        _use_mask_as_output path, sam.py:553-599 — how the concept-video
        predictor seeds new masklets from detections)."""
        def run(v, f0, f1, f16, mask):
            outs = self.model.apply(v, mask, f16, [f0, f1],
                                    method=self.model.use_mask_as_output)
            mem, mem_pos = self.model.apply(
                v, f16, outs[4], outs[6], method=self.model.encode_memory)
            return outs[3], outs[4], outs[5], outs[6], mem, mem_pos

        return self._jit("cond_mask", run)

    def _track_with_feats(self):
        def run(v, f0, f1, f16, pos16, maskmem, mem_valid, obj_ptrs, obj_t,
                ptr_valid, t_max):
            return self._step_body(v, f0, f1, f16, pos16, maskmem, mem_valid,
                                   obj_ptrs, obj_t, ptr_valid, t_max)

        return self._jit("track_feats", run)

    def _track_frame(self):
        def run(v, x, maskmem, mem_valid, obj_ptrs, obj_t, ptr_valid, t_max):
            # maskmem: (nm, HW, 64); mem_valid: (nm,); obj_ptrs: (np, C);
            # obj_t: (np,) temporal distances; ptr_valid: (np,)
            enc = self.model.apply(v, x, method=self.model.encode_image)
            f0, f1, f16 = enc["backbone_fpn"]
            return self._step_body(v, f0, f1, f16, enc["vision_pos_enc"][-1],
                                   maskmem, mem_valid, obj_ptrs, obj_t,
                                   ptr_valid, t_max)

        return self._jit("track", run)

    def _step_body(self, v, f0, f1, f16, pos16, maskmem, mem_valid, obj_ptrs,
                   obj_t, ptr_valid, t_max):
        """Per-object tracked step given precomputed frame features: fixed
        bank -> memory attention -> SAM heads -> new memory."""
        import jax.numpy as jnp

        nm, np_ = self.num_maskmem, self.max_obj_ptrs
        b, h, w, c = f16.shape
        hw = h * w
        mem_dim = self.model.mem_dim

        # spatial memory tokens + per-slot temporal embedding
        # (reference sam.py:726-733: slot t_pos gets tpos_enc[nm-t_pos-1])
        spat_pos = jnp.asarray(
            _sine_pos(h, w, mem_dim), jnp.float32).reshape(1, hw, mem_dim)
        tpos = v["params"]["maskmem_tpos_enc"][::-1].reshape(nm, 1, mem_dim)
        mem_tok = maskmem.reshape(1, nm * hw, mem_dim)
        mem_pos = (spat_pos + tpos).reshape(1, nm * hw, mem_dim)

        # object pointers -> 4 x 64 tokens each, with 1D sine tpos
        # (sam.py:735-766)
        ratio = c // mem_dim
        ptr_tok = obj_ptrs.reshape(np_, ratio, mem_dim).reshape(1, np_ * ratio, mem_dim)
        ptr_pos = self.model.apply(v, obj_t.astype(jnp.float32), t_max,
                                   method=self.model.tpos_embed_obj_ptrs)
        ptr_pos = jnp.repeat(ptr_pos, ratio, axis=0).reshape(1, np_ * ratio, mem_dim)

        memory = jnp.concatenate([mem_tok, ptr_tok], axis=1)
        memory_pos = jnp.concatenate([mem_pos, ptr_pos], axis=1)
        key_mask = jnp.concatenate([
            jnp.repeat(mem_valid, hw), jnp.repeat(ptr_valid, ratio)])[None]

        feat = self.model.apply(
            v, f16, pos16, memory, memory_pos,
            np_ * ratio, key_mask, method=self.model.condition_features)
        # _use_multimask (sam.py:983-991): multimask_output_for_tracking
        # with 0 prompt points in [min=0, max=1] -> multimask on
        outs = self.model.apply(
            v, feat, None, None, [f0, f1], True,
            method=self.model.forward_sam_heads)
        mem, _ = self.model.apply(
            v, f16, outs[4], outs[6], method=self.model.encode_memory)
        return outs[3], outs[4], outs[5], outs[6], mem

    def _assemble_bank(self, cond_mem, cond_ptr, t0, recent, t):
        """Fixed memory bank for one masklet at frame ``t`` (reference t_pos
        scheme, sam.py:700-766): spatial slot 0 = the conditioning frame
        (prompted at ``t0``), slot t_pos holds the frame at distance
        nm - t_pos; pointer slot 0 = cond pointer, then recent pointers by
        temporal distance. ``recent`` = [(frame_t, mem (HW, 64), ptr (C,))]."""
        hw, mem_dim = cond_mem.shape
        c = cond_ptr.shape[-1]
        maskmem = np.zeros((self.num_maskmem, hw, mem_dim), np.float32)
        mem_valid = np.zeros((self.num_maskmem,), bool)
        maskmem[0], mem_valid[0] = cond_mem, True
        by_t = {ft: fm for ft, fm, _ in recent}
        for t_pos in range(1, self.num_maskmem):
            prev_t = t - (self.num_maskmem - t_pos)
            if prev_t in by_t:
                maskmem[t_pos], mem_valid[t_pos] = by_t[prev_t], True
        obj_ptrs = np.zeros((self.max_obj_ptrs, c), np.float32)
        obj_t = np.zeros((self.max_obj_ptrs,), np.float32)
        ptr_valid = np.zeros((self.max_obj_ptrs,), bool)
        obj_ptrs[0], obj_t[0], ptr_valid[0] = cond_ptr, float(t - t0), True
        k = 1
        for ft, _, fp in sorted(recent, key=lambda z: -z[0]):
            if k >= self.max_obj_ptrs or t - ft >= self.max_obj_ptrs:
                break
            if ft == t0:
                continue  # cond frame already in slot 0
            obj_ptrs[k], obj_t[k], ptr_valid[k] = fp, float(t - ft), True
            k += 1
        return maskmem, mem_valid, obj_ptrs, obj_t, ptr_valid

    def track(self, frames: Iterable[np.ndarray], points, labels=None,
              num_frames: int | None = None) -> Iterable[np.ndarray]:
        """Track the object prompted on the FIRST frame through the video.
        Yields a bool mask per frame at source resolution. ``num_frames``
        normalizes the pointer temporal encodings when the video length is
        known (reference sam.py:736); streaming defaults to the cap."""
        import cv2
        import jax.numpy as jnp

        frames = iter(frames)
        first = next(frames)
        x, (h0, w0) = self._prep(first)
        pts = np.asarray(points, np.float32).reshape(1, -1, 2) * np.array(
            [self.image_size / w0, self.image_size / h0], np.float32)
        lab = np.asarray(labels if labels is not None else [1] * pts.shape[1],
                         np.int32).reshape(1, -1)

        low, high, ptr, score, mem, _ = self._cond_step()(
            self.variables, jnp.asarray(x)[None], jnp.asarray(pts), jnp.asarray(lab))
        hw = mem.shape[1] * mem.shape[2]
        mem_dim = mem.shape[-1]
        c = ptr.shape[-1]

        def to_mask(high):
            hm = np.asarray(high[0, 0], np.float32)
            return cv2.resize(hm, (w0, h0), interpolation=cv2.INTER_LINEAR) \
                > self.mask_threshold

        yield to_mask(high)

        cond_mem = np.asarray(mem).reshape(hw, mem_dim)
        cond_ptr = np.asarray(ptr)[0]
        recent: list[tuple[int, np.ndarray, np.ndarray]] = []  # (t, mem, ptr)
        step = self._track_frame()
        t = 0
        for frame in frames:
            t += 1
            x, _ = self._prep(frame)
            maskmem, mem_valid, obj_ptrs, obj_t, ptr_valid = \
                self._assemble_bank(cond_mem, cond_ptr, 0, recent, t)
            t_max = float(min(num_frames or self.max_obj_ptrs,
                              self.max_obj_ptrs) - 1)
            low, high, ptr, score, mem = step(
                self.variables, jnp.asarray(x)[None],
                jnp.asarray(maskmem), jnp.asarray(mem_valid),
                jnp.asarray(obj_ptrs), jnp.asarray(obj_t),
                jnp.asarray(ptr_valid), jnp.float32(t_max))
            recent.append((t, np.asarray(mem).reshape(hw, mem_dim), np.asarray(ptr)[0]))
            if len(recent) > self.num_maskmem - 1:
                recent.pop(0)
            yield to_mask(high)


class SAM2DynamicInteractivePredictor(SAM2):
    """Interactive multi-object segmentation over INDEPENDENT images
    (reference predict.py SAM2DynamicInteractivePredictor:1856-2185).

    Prompt objects into a memory bank on any "support" image(s) — point, box
    or mask prompts, added at any time — then segment every registered object
    on arbitrary "query" images via memory attention. Unlike the video
    predictor there is no temporal ordering: every bank entry carries the
    same (last-slot) temporal embedding and no object pointers are used
    (reference get_maskmem_enc:2121-2134, num_obj_ptr_tokens=0).

    TPU re-design (vs the reference's python-list bank):
      - the bank is a FIXED-CAPACITY array (max_mem_entries, B, HW, 64) with
        an entry-validity mask lowered into the attention logits, so every
        query runs ONE compiled program regardless of how many supports have
        been added (adding beyond capacity evicts the oldest entry);
      - object slots are a batch axis of size ``max_obj_num``: the support
        step runs the SAM heads for ALL slots in one batched program
        (unprompted slots get pad prompts and are overwritten with the
        reference's -1024 mask / -32 score defaults, update_memory:2015-2035)
        where the reference loops per object at batch 1.

    Usage:
        p = SAM2DynamicInteractivePredictor(variant="sam2_t")
        p.add_support(img1, obj_ids=[0, 1], points=[[x1, y1], [x2, y2]])
        out = p.query(img2)        # masks for objects 0 and 1
        p.add_support(img3, obj_ids=[2], bboxes=[[x0, y0, x1, y1]])
        out = p.query(img4)        # masks for objects 0, 1 and 2
    """

    def __init__(self, *a, max_obj_num: int = 3, max_mem_entries: int = 8,
                 non_overlap_for_mem: bool = False, **kw):
        super().__init__(*a, **kw)
        self.max_obj_num = max_obj_num
        self.max_mem_entries = max_mem_entries
        self.non_overlap_for_mem = non_overlap_for_mem
        self.obj_idx_set: set[int] = set()
        self._bank_mem: np.ndarray | None = None  # (E, B, HW, 64)
        self._bank_valid = np.zeros((max_mem_entries,), bool)
        self._next_entry = 0

    # ------------------------------------------------------------- programs
    def _support_points_step(self, n_pts: int):
        import jax.numpy as jnp

        B = self.max_obj_num

        def run(v, x, coords, labels, prompted):
            # coords (B, P, 2), labels (B, P) with -1 pads; prompted (B,)
            enc = self.model.apply(v, x, method=self.model.encode_image)
            f0, f1, f16 = enc["backbone_fpn"]
            f0, f1, f16 = (jnp.repeat(f, B, axis=0) for f in (f0, f1, f16))
            feat = self.model.apply(v, f16, method=self.model.no_mem_features)
            outs = self.model.apply(v, feat, (coords, labels), None, [f0, f1],
                                    False, method=self.model.forward_sam_heads)
            return self._consolidate_and_encode(v, f16, outs, prompted)

        return self._jit(f"dyn_sup_{n_pts}", run)

    def _support_masks_step(self):
        import jax.numpy as jnp

        B = self.max_obj_num

        def run(v, x, mask_inputs, prompted):
            # mask_inputs (B, H, W, 1) at model resolution; prompted (B,)
            enc = self.model.apply(v, x, method=self.model.encode_image)
            f0, f1, f16 = enc["backbone_fpn"]
            f0, f1, f16 = (jnp.repeat(f, B, axis=0) for f in (f0, f1, f16))
            outs = self.model.apply(v, mask_inputs, f16, [f0, f1],
                                    method=self.model.use_mask_as_output)
            return self._consolidate_and_encode(v, f16, outs, prompted)

        return self._jit("dyn_sup_mask", run)

    def _consolidate_and_encode(self, v, f16, outs, prompted):
        """update_memory consolidation (reference :2015-2076): unprompted
        slots -> -1024 masks / -32 scores, optional cross-object
        non-overlap, then one batched memory encode."""
        import jax.numpy as jnp

        high = outs[4]  # (B, 1, H, W)
        score = outs[6]  # (B, 1)
        p = prompted[:, None, None, None]
        high = jnp.where(p, high, jnp.full_like(high, -1024.0))
        score = jnp.where(prompted[:, None], score, jnp.full_like(score, -32.0))
        if self.non_overlap_for_mem and self.max_obj_num > 1:
            # _apply_non_overlapping_constraints (sam.py): keep the argmax
            # object per pixel, clamp the rest to <= -10
            keep = high == high.max(axis=0, keepdims=True)
            high = jnp.where(keep, high, jnp.minimum(high, -10.0))
        mem, _ = self.model.apply(v, f16, high, score,
                                  method=self.model.encode_memory)
        b, h, w, md = mem.shape
        return mem.reshape(b, h * w, md)

    def _query_step(self):
        import jax.numpy as jnp

        B, E = self.max_obj_num, self.max_mem_entries
        nm = getattr(self, "num_maskmem", 7)

        def run(v, x, bank, entry_valid):
            # bank (E, B, HW, 64); entry_valid (E,)
            enc = self.model.apply(v, x, method=self.model.encode_image)
            f0, f1, f16 = enc["backbone_fpn"]
            f0, f1, f16 = (jnp.repeat(f, B, axis=0) for f in (f0, f1, f16))
            _, h, w, _ = f16.shape
            hw = h * w
            mem_dim = bank.shape[-1]
            memory = bank.transpose(1, 0, 2, 3).reshape(B, E * hw, mem_dim)
            # every entry gets the LAST temporal slot embedding
            # (get_maskmem_enc:2130 — tpos_enc[num_maskmem - 1])
            spat = jnp.asarray(_sine_pos(h, w, mem_dim)).reshape(1, hw, mem_dim)
            tpos = v["params"]["maskmem_tpos_enc"][nm - 1].reshape(1, 1, mem_dim)
            mem_pos = jnp.broadcast_to(spat + tpos, (E, hw, mem_dim))
            mem_pos = mem_pos.reshape(1, E * hw, mem_dim)
            mem_pos = jnp.broadcast_to(mem_pos, (B, E * hw, mem_dim))
            key_mask = jnp.broadcast_to(
                jnp.repeat(entry_valid, hw)[None], (B, E * hw))
            feat = self.model.apply(
                v, f16, enc["vision_pos_enc"][-1], memory, mem_pos, 0,
                key_mask, method=self.model.condition_features)
            outs = self.model.apply(v, feat, None, None, [f0, f1], False,
                                    method=self.model.forward_sam_heads)
            return outs[4], outs[6]  # high (B,1,H,W), score (B,1)

        return self._jit("dyn_query", run)

    # ------------------------------------------------------------------ api
    def add_support(self, img: np.ndarray, obj_ids, points=None, labels=None,
                    bboxes=None, masks=None) -> None:
        """Register/refresh objects by prompting them on ``img``. One prompt
        per obj_id: N points (or boxes, encoded as corner-pair points with
        labels 2/3) or N binary masks (reference inference:1917-1968)."""
        import jax.numpy as jnp

        obj_ids = [obj_ids] if isinstance(obj_ids, int) else list(obj_ids)
        assert all(0 <= i < self.max_obj_num for i in obj_ids), \
            f"obj_ids must be < max_obj_num={self.max_obj_num}"
        x, (h0, w0) = self._prep(img)
        sx, sy = self.image_size / w0, self.image_size / h0
        B = self.max_obj_num
        prompted = np.zeros((B,), bool)
        prompted[obj_ids] = True

        if masks is not None:
            import cv2

            m = np.zeros((B, self.image_size, self.image_size, 1), np.float32)
            for i, om in zip(obj_ids, np.asarray(masks, np.float32)):
                m[i, :, :, 0] = cv2.resize(om, (self.image_size,) * 2,
                                           interpolation=cv2.INTER_LINEAR)
            mem = self._support_masks_step()(
                self.variables, jnp.asarray(x)[None], jnp.asarray(m),
                jnp.asarray(prompted))
        else:
            if bboxes is not None:
                bx = np.asarray(bboxes, np.float32).reshape(len(obj_ids), 2, 2)
                pts_list = [bx[k] * [sx, sy] for k in range(len(obj_ids))]
                lab_list = [np.array([2, 3], np.float32)] * len(obj_ids)
            else:
                pts = np.asarray(points, np.float32).reshape(len(obj_ids), -1, 2)
                pts_list = [pts[k] * [sx, sy] for k in range(len(obj_ids))]
                if labels is None:
                    lab_list = [np.ones((pts.shape[1],), np.float32)] * len(obj_ids)
                else:
                    lab_list = list(np.asarray(labels, np.float32).reshape(
                        len(obj_ids), -1))
            P = max(len(l) for l in lab_list)
            coords = np.zeros((B, P, 2), np.float32)
            lab = -np.ones((B, P), np.float32)  # -1 = pad point
            for i, pc, pl in zip(obj_ids, pts_list, lab_list):
                coords[i, : len(pl)] = pc
                lab[i, : len(pl)] = pl
            mem = self._support_points_step(P)(
                self.variables, jnp.asarray(x)[None], jnp.asarray(coords),
                jnp.asarray(lab.astype(np.int32)), jnp.asarray(prompted))

        mem = np.asarray(mem, np.float32)  # (B, HW, 64)
        if self._bank_mem is None:
            self._bank_mem = np.zeros(
                (self.max_mem_entries,) + mem.shape, np.float32)
        slot = self._next_entry % self.max_mem_entries
        self._bank_mem[slot] = mem
        self._bank_valid[slot] = True
        self._next_entry += 1
        self.obj_idx_set.update(obj_ids)

    def query(self, img: np.ndarray) -> dict:
        """Segment every registered object on ``img``. Returns masks
        (N, H, W) bool at source resolution, scores in [0, 1] and obj_ids
        (reference inference:1970-1979 score mapping clamp(s/32, min=0))."""
        import cv2
        import jax.numpy as jnp

        if not self.obj_idx_set:
            raise RuntimeError(
                "No objects in the memory bank — call add_support first.")
        x, (h0, w0) = self._prep(img)
        high, score = self._query_step()(
            self.variables, jnp.asarray(x)[None],
            jnp.asarray(self._bank_mem), jnp.asarray(self._bank_valid))
        idx = sorted(self.obj_idx_set)
        masks = np.stack([
            cv2.resize(np.asarray(high[i, 0], np.float32), (w0, h0),
                       interpolation=cv2.INTER_LINEAR) > self.mask_threshold
            for i in idx])
        scores = np.clip(np.asarray(score, np.float32)[idx, 0] / 32.0, 0.0, None)
        return {"masks": masks, "scores": scores, "obj_ids": idx}

    def inference(self, img, points=None, labels=None, bboxes=None,
                  masks=None, obj_ids=None, update_memory: bool = False):
        """Reference-shaped entry point (predict.py:1917): with
        ``update_memory`` the prompts are added to the bank; otherwise the
        image is treated as a query."""
        if update_memory:
            assert obj_ids is not None, "obj_ids required with update_memory"
            self.add_support(img, obj_ids, points=points, labels=labels,
                             bboxes=bboxes, masks=masks)
        return self.query(img)


def _sine_pos(h: int, w: int, dim: int) -> np.ndarray:
    from fce_yolo_tpu.nn.sam2 import sine_pos_embed

    return sine_pos_embed(h, w, dim)

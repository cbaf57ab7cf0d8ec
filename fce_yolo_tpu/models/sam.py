"""SAM facade: promptable segmentation predictor + segment-everything.

Reference: models/sam/model.py (SAM facade), models/sam/predict.py
(Predictor.preprocess:109, pre_transform:143, prompt_inference:207,
_prepare_prompts:280, generate:329, postprocess:478), models/sam/amg.py
(point grid, stability score).

TPU design: the image encoder jits once per image size and its embedding is
cached (the reference Predictor's ``features`` cache); every prompt batch
reuses it through a second jitted prompt->mask program with static prompt
shapes (points padded to the next power of two with -1 labels, so repeated
interactive prompting does not retrace). Mask upscale/threshold runs on
device; only the final bool masks come back to host.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Sequence

import numpy as np

from fce_yolo_tpu.nn.sam import SAM_CONFIGS, SAMModel, sam_state_dict_to_variables

__all__ = ["SAM"]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class SAM:
    """Promptable segmentation (reference models/sam/model.py SAM).

    Example:
        sam = SAM("sam_b.pt")
        res = sam.predict(img, points=[[400, 300]], labels=[1])
        res.masks  # (N, H, W) bool
    """

    mask_threshold = 0.0

    def __new__(cls, model: str | None = None, variant: str = "sam_b", **kw):
        # reference sam_model_map (build.py:319-333): "sam2_*" names route to
        # the SAM2 family; returning a SAM2 skips SAM.__init__ (not a subclass)
        v = (model.rsplit("/", 1)[-1].replace(".pt", "") if model else variant)
        v = v.replace("-", "_").replace("sam2.1", "sam2")
        if cls is SAM and v.startswith("sam2"):
            from fce_yolo_tpu.models.sam2 import SAM2

            return SAM2(model=model, variant=v,
                        image_size=kw.get("img_size", 1024),
                        _random_init=kw.get("_random_init", False))
        return super().__new__(cls)

    def __init__(
        self,
        model: str | None = None,
        variant: str = "sam_b",
        img_size: int = 1024,
        _random_init: bool = False,
        _cfg: dict | None = None,
    ):
        import jax

        if model is not None:
            variant = model.rsplit("/", 1)[-1].replace(".pt", "")
        assert variant.replace("-", "_") in SAM_CONFIGS, f"unknown SAM variant {variant}"
        self.img_size = img_size
        cfg = dict(SAM_CONFIGS[variant.replace("-", "_")])
        if _cfg:  # test hook: small towers for parity fixtures
            cfg.update(_cfg)
        self.model = SAMModel(img_size=img_size, **cfg)
        if model is not None and not _random_init:
            from fce_yolo_tpu.nn.import_torch import load_pt_state_dict

            self.variables = sam_state_dict_to_variables(load_pt_state_dict(model))
        else:
            small = jax.eval_shape(
                lambda k, x: self.model.init(k, x),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((1, img_size, img_size, 3), np.float32),
            )
            # real (cheap normal) init without tracing the full forward twice
            leaves, treedef = jax.tree_util.tree_flatten(small)
            rng = np.random.RandomState(0)
            self.variables = jax.tree_util.tree_unflatten(
                treedef,
                [np.asarray(rng.normal(0, 0.05, l.shape), l.dtype) for l in leaves],
            )
        self._encode = jax.jit(
            lambda v, x: self.model.apply(v, x, method=self.model.encode_image)
        )
        self._features: Any = None
        self._src_shape: tuple[int, int] | None = None
        self._prompt_fns: dict = {}

    # ------------------------------------------------------------ image side
    def _letterbox(self, img: np.ndarray) -> tuple[np.ndarray, float, tuple[int, int]]:
        """Resize longest side to img_size, pad bottom/right (reference
        pre_transform:143 LetterBox(auto=False, center=False))."""
        import cv2

        h, w = img.shape[:2]
        r = min(self.img_size / h, self.img_size / w)
        nh, nw = round(h * r), round(w * r)
        im = cv2.resize(img.astype(np.float32), (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.full((self.img_size, self.img_size, 3), 114.0, np.float32)
        out[:nh, :nw] = im
        return out, r, (nh, nw)

    def set_image(self, img: np.ndarray) -> None:
        """Encode an image once; later prompts reuse the embedding
        (reference set_image:530)."""
        padded, r, (nh, nw) = self._letterbox(img)
        self._features = self._encode(self.variables, padded[None])
        self._padded = padded  # model-space image; generate() crops from it
        self._ratio = r
        self._resized_shape = (nh, nw)
        self._src_shape = img.shape[:2]

    def reset_image(self) -> None:
        self._features = None
        self._src_shape = None

    # ----------------------------------------------------------- prompt side
    def _prompt_fn(self, n_points: int, multimask: bool):
        """Jitted prompt->mask program for a padded point count."""
        import jax

        key = (n_points, multimask)
        if key not in self._prompt_fns:

            def run(v, feats, coords, labels):
                masks, scores = self.model.apply(
                    v,
                    feats,
                    points=(coords, labels),
                    multimask_output=multimask,
                    method=self.model.prompt_and_decode,
                )
                return masks, scores

            self._prompt_fns[key] = jax.jit(run)
        return self._prompt_fns[key]

    def predict(
        self,
        img: np.ndarray | None = None,
        points: Sequence | None = None,
        labels: Sequence | None = None,
        bboxes: Sequence | None = None,
        multimask_output: bool = False,
    ) -> SimpleNamespace:
        """Segment with point/box prompts (reference prompt_inference:207).

        points: (N, 2) or (N, P, 2) pixel coords in the ORIGINAL image frame;
        labels: matching (N,) or (N, P) (default all-foreground);
        bboxes: (N, 4) xyxy. Returns masks (M, H, W) bool + scores (M,) +
        boxes xyxy (M, 4) in the original frame.
        """
        import jax.numpy as jnp

        if img is not None:
            self.set_image(img)
        assert self._features is not None, "call set_image or pass img"
        r = self._ratio

        coords_list = []
        labels_list = []
        if points is not None:
            pts = np.asarray(points, np.float32) * r
            if pts.ndim == 2:
                pts = pts[:, None, :]  # (N, 1, 2)
            lab = (
                np.ones(pts.shape[:2], np.int32)
                if labels is None
                else np.asarray(labels, np.int32).reshape(pts.shape[0], -1)
            )
            coords_list.append(pts)
            labels_list.append(lab)
        if bboxes is not None:
            bx = np.asarray(bboxes, np.float32).reshape(-1, 2, 2) * r
            lb = np.tile(np.asarray([[2, 3]], np.int32), (bx.shape[0], 1))
            coords_list.append(bx)
            labels_list.append(lb)
        if not coords_list:
            return self.generate(img)
        # each prompt (point set / box) decodes independently, batched along
        # the prompt axis; pad the per-prompt token count to a pow2 bucket
        n = max(c.shape[1] for c in coords_list)
        nb = sum(c.shape[0] for c in coords_list)
        npad = _next_pow2(max(n + 1, 2))
        coords = np.zeros((nb, npad, 2), np.float32)
        lab = np.full((nb, npad), -1, np.int32)
        i = 0
        for c, l in zip(coords_list, labels_list):
            coords[i : i + c.shape[0], : c.shape[1]] = c
            lab[i : i + c.shape[0], : c.shape[1]] = l
            i += c.shape[0]

        masks, scores = self._prompt_fn(npad, multimask_output)(
            self.variables, self._features, jnp.asarray(coords), jnp.asarray(lab)
        )
        return self._finalize(np.asarray(masks), np.asarray(scores))

    def _finalize(self, masks: np.ndarray, scores: np.ndarray) -> SimpleNamespace:
        """(B, d, h, w) low-res logits -> bool masks at the original frame
        (reference postprocess:478 + ops.scale_masks padding=False)."""
        b, d, mh, mw = masks.shape
        masks = masks.reshape(b * d, mh, mw)
        scores = scores.reshape(-1)
        # crop the (bottom/right) letterbox pad region, then resize to src
        nh, nw = self._resized_shape
        import cv2

        ch = max(round(mh * nh / self.img_size), 1)
        cw = max(round(mw * nw / self.img_size), 1)
        h0, w0 = self._src_shape
        up = np.stack(
            [
                cv2.resize(
                    np.asarray(m[:ch, :cw], np.float32), (w0, h0),
                    interpolation=cv2.INTER_LINEAR,
                )
                for m in masks
            ]
        )
        bin_masks = up > self.mask_threshold
        boxes = _batched_mask_to_box(bin_masks)
        return SimpleNamespace(masks=bin_masks, scores=scores, boxes=boxes)

    # -------------------------------------------------------- segment-all
    def _amg_fn(self, hw: tuple[int, int]):
        """Jitted single-point multimask decode with on-device upsample of
        the low-res logits to the crop size (reference F.interpolate in
        generate:393; jax bilinear == align_corners=False)."""
        import jax

        key = ("amg", hw)
        if key not in self._prompt_fns:

            def run(v, feats, coords, labels):
                masks, scores = self.model.apply(
                    v, feats, points=(coords, labels), multimask_output=True,
                    method=self.model.prompt_and_decode,
                )
                n = masks.shape[0] * masks.shape[1]
                masks = masks.reshape(n, *masks.shape[2:])
                masks = jax.image.resize(masks, (n, *hw), method="bilinear")
                return masks, scores.reshape(-1)

            self._prompt_fns[key] = jax.jit(run)
        return self._prompt_fns[key]

    def generate(
        self,
        img: np.ndarray | None = None,
        crop_n_layers: int = 0,
        crop_overlap_ratio: float = 512 / 1500,
        crop_downscale_factor: int = 1,
        point_grids: list | None = None,
        points_stride: int = 32,
        points_batch_size: int = 64,
        conf_thres: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 0.95,
        crop_nms_thresh: float = 0.7,
        nms_iou: float = 0.7,
        points_per_side: int | None = None,
    ) -> SimpleNamespace:
        """Segment everything with the reference's full crop pyramid
        (generate:329-460 + amg.py): layered overlapping crops, per-layer
        point grids, stability filtering, crop-edge suppression, per-crop
        NMS, and cross-crop dedup NMS preferring smaller crops.

        ``points_per_side`` is a back-compat alias for ``points_stride``.
        Returns masks/scores/boxes in the ORIGINAL image frame, plus the
        model-space set (``model_masks``/``model_boxes``) for parity checks
        against the reference, whose generate() returns model space.
        """
        import cv2
        import jax.numpy as jnp

        if img is not None:
            self.set_image(img)
        assert self._features is not None
        if points_per_side is not None:
            points_stride = points_per_side
        ih = iw = self.img_size
        crop_regions, layer_idxs = generate_crop_boxes((ih, iw), crop_n_layers,
                                                       crop_overlap_ratio)
        if point_grids is None:
            point_grids = build_all_layer_point_grids(
                points_stride, crop_n_layers, crop_downscale_factor)

        pred_masks, pred_scores, pred_bboxes, region_areas = [], [], [], []
        for crop_region, layer_idx in zip(crop_regions, layer_idxs):
            x1, y1, x2, y2 = crop_region
            w, h = x2 - x1, y2 - y1
            if (w, h) == (iw, ih):
                feats = self._features
            else:
                crop_im = cv2.resize(self._padded[y1:y2, x1:x2], (iw, ih),
                                     interpolation=cv2.INTER_LINEAR)
                feats = self._encode(self.variables, crop_im[None])
            # points in CROP pixel coords against the stretched crop image —
            # the reference's exact convention (generate:384 points_scale
            # with segment_all r=1.0, _prepare_prompts:306)
            points = (point_grids[layer_idx] * np.array([[w, h]])).astype(np.float32)
            fn = self._amg_fn((h, w))
            crop_masks, crop_scores, crop_boxes = [], [], []
            for i in range(0, len(points), points_batch_size):
                chunk = points[i: i + points_batch_size]
                nb = len(chunk)
                coords = np.zeros((points_batch_size, 2, 2), np.float32)
                coords[:nb, 0] = chunk  # static batch: pad tail, drop below
                lab = np.full((points_batch_size, 2), -1, np.int32)
                lab[:nb, 0] = 1
                m, s = fn(self.variables, feats, jnp.asarray(coords), jnp.asarray(lab))
                m = np.asarray(m, np.float32)[: nb * 3]
                s = np.asarray(s, np.float32)[: nb * 3]
                keep = s > conf_thres
                m, s = m[keep], s[keep]
                # stability: IoU of the +-offset threshold masks (amg.py
                # calculate_stability_score; nan unions drop the mask)
                hi = (m > self.mask_threshold + stability_score_offset).sum((1, 2))
                lo = (m > self.mask_threshold - stability_score_offset).sum((1, 2))
                stab = np.where(lo > 0, hi / np.maximum(lo, 1), 0.0)
                keep = stab > stability_score_thresh
                m, s = m[keep], s[keep]
                bin_m = m > self.mask_threshold
                boxes = _batched_mask_to_box(bin_m)
                # drop masks touching the crop edge but not the image edge
                # (amg.py is_box_near_crop_edge, atol=20)
                keep = ~_is_box_near_crop_edge(boxes, crop_region, [0, 0, iw, ih])
                crop_masks.append(bin_m[keep])
                crop_scores.append(s[keep])
                crop_boxes.append(boxes[keep])
            m = np.concatenate(crop_masks) if crop_masks else np.zeros((0, h, w), bool)
            s = np.concatenate(crop_scores) if crop_scores else np.zeros((0,))
            bx = np.concatenate(crop_boxes) if crop_boxes else np.zeros((0, 4))
            keep = _nms_keep(bx, s, nms_iou)
            m, s, bx = m[keep], s[keep], bx[keep]
            # uncrop into the full model-space canvas (amg.py uncrop_masks)
            canvas = np.zeros((len(m), ih, iw), bool)
            canvas[:, y1: y1 + h, x1: x1 + w] = m
            bx = bx + np.array([x1, y1, x1, y1], np.float32)
            pred_masks.append(canvas)
            pred_scores.append(s)
            pred_bboxes.append(bx)
            region_areas.append(np.full(len(m), w * h, np.float32))

        masks = np.concatenate(pred_masks)
        scores = np.concatenate(pred_scores)
        boxes = np.concatenate(pred_bboxes)
        areas = np.concatenate(region_areas)
        if len(crop_regions) > 1 and len(masks):
            # dedup across crops, preferring masks from smaller crops
            keep = _nms_keep(boxes, 1.0 / areas, crop_nms_thresh)
            masks, scores, boxes = masks[keep], scores[keep], boxes[keep]

        h0, w0 = self._src_shape
        if not len(masks):
            return SimpleNamespace(
                masks=np.zeros((0, h0, w0), bool), scores=np.zeros((0,)),
                boxes=np.zeros((0, 4)),
                model_masks=np.zeros((0, ih, iw), bool),
                model_boxes=np.zeros((0, 4)),
            )
        # model space -> original frame: crop the letterbox pad, resize
        nh, nw = self._resized_shape
        src = np.stack([
            cv2.resize(m[:nh, :nw].astype(np.float32), (w0, h0),
                       interpolation=cv2.INTER_LINEAR) > 0.5
            for m in masks
        ])
        return SimpleNamespace(
            masks=src, scores=scores, boxes=_batched_mask_to_box(src),
            model_masks=masks, model_boxes=boxes,
        )


def generate_crop_boxes(im_size: tuple[int, int], n_layers: int,
                        overlap_ratio: float) -> tuple[list, list]:
    """Layered overlapping crop boxes (reference amg.py generate_crop_boxes):
    layer 0 = the full image; layer i has 2^i crops per side with overlap
    int(overlap_ratio * short_side * 2 / n_per_side)."""
    import math

    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [[0, 0, im_w, im_h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for x0 in x0s:
            for y0 in y0s:
                crop_boxes.append(
                    [x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> list:
    """Per-layer normalized [0,1] point grids (reference amg.py
    build_all_layer_point_grids): layer i samples n/(scale^i) per side."""
    grids = []
    for i in range(n_layers + 1):
        n = max(int(n_per_side / (scale_per_layer ** i)), 1)
        offset = 1 / (2 * n)
        side = np.linspace(offset, 1 - offset, n)
        xs = np.tile(side[None, :], (n, 1))
        ys = np.tile(side[:, None], (1, n))
        grids.append(np.stack([xs, ys], axis=-1).reshape(-1, 2))
    return grids


def _is_box_near_crop_edge(boxes: np.ndarray, crop_box: list, orig_box: list,
                           atol: float = 20.0) -> np.ndarray:
    """True for boxes near the crop edge but NOT near the image edge
    (reference amg.py is_box_near_crop_edge). ``boxes`` are crop-local."""
    if not len(boxes):
        return np.zeros((0,), bool)
    x1, y1 = crop_box[0], crop_box[1]
    un = boxes + np.array([x1, y1, x1, y1], np.float32)
    near_crop = np.abs(un - np.asarray(crop_box, np.float32)) <= atol
    near_img = np.abs(un - np.asarray(orig_box, np.float32)) <= atol
    return np.any(near_crop & ~near_img, axis=1)


def _batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy (reference amg.py batched_mask_to_box;
    right/bottom are the LAST true pixel index — the reference's edge
    convention, kept for box parity)."""
    n = masks.shape[0]
    boxes = np.zeros((n, 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.where(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return boxes


def _nms_keep(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Greedy NMS keep indices (host-side; candidate counts are tiny)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[iou <= iou_thres]
    return np.asarray(keep, np.int64)

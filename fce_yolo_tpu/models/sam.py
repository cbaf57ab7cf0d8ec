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
    ):
        import jax

        if model is not None:
            variant = model.rsplit("/", 1)[-1].replace(".pt", "")
        assert variant.replace("-", "_") in SAM_CONFIGS, f"unknown SAM variant {variant}"
        self.img_size = img_size
        self.model = SAMModel(img_size=img_size, **SAM_CONFIGS[variant.replace("-", "_")])
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
    def generate(
        self,
        img: np.ndarray | None = None,
        points_per_side: int = 16,
        points_batch_size: int = 64,
        conf_thres: float = 0.88,
        stability_score_thresh: float = 0.95,
        nms_iou: float = 0.7,
    ) -> SimpleNamespace:
        """Segment everything via a point grid (reference generate:329 +
        amg.py build_point_grid/stability score; single-crop variant)."""
        import jax.numpy as jnp

        if img is not None:
            self.set_image(img)
        assert self._features is not None
        nh, nw = self._resized_shape
        xs = (np.arange(points_per_side) + 0.5) / points_per_side * nw
        ys = (np.arange(points_per_side) + 0.5) / points_per_side * nh
        grid = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)

        all_masks, all_scores = [], []
        fn = self._prompt_fn(2, True)
        for i in range(0, len(grid), points_batch_size):
            chunk = grid[i : i + points_batch_size]
            coords = np.zeros((len(chunk), 2, 2), np.float32)
            coords[:, 0] = chunk
            lab = np.full((len(chunk), 2), -1, np.int32)
            lab[:, 0] = 1
            m, s = fn(self.variables, self._features, jnp.asarray(coords), jnp.asarray(lab))
            m = np.asarray(m, np.float32).reshape(-1, m.shape[2], m.shape[3])
            s = np.asarray(s).reshape(-1)
            keep = s > conf_thres
            # stability: IoU of the +-offset threshold masks (amg.py:158-186)
            hi = (m > self.mask_threshold + 1.0).sum((1, 2))
            lo = (m > self.mask_threshold - 1.0).sum((1, 2))
            stab = hi / np.maximum(lo, 1)
            keep &= stab > stability_score_thresh
            if keep.any():
                all_masks.append(m[keep])
                all_scores.append(s[keep])
        if not all_masks:
            h0, w0 = self._src_shape
            return SimpleNamespace(
                masks=np.zeros((0, h0, w0), bool), scores=np.zeros((0,)), boxes=np.zeros((0, 4))
            )
        m = np.concatenate(all_masks)
        s = np.concatenate(all_scores)
        bin_m = m > self.mask_threshold
        boxes = _batched_mask_to_box(bin_m)
        keep = _nms_keep(boxes, s, nms_iou)
        return self._finalize(m[keep][:, None], s[keep])


def _batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy (reference amg.py batched_mask_to_box)."""
    n = masks.shape[0]
    boxes = np.zeros((n, 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.where(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
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

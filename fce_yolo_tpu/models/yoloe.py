"""YOLOE facade (reference models/yolo/yoloe/ + YOLOEModel, nn/tasks.py:954):
open-vocabulary detection/segmentation promptable by TEXT (class names ->
embeddings -> in-graph reprta adapter) or VISUAL examples (prompt boxes ->
P3-grid masks -> SAVPE embeddings).

Text embeddings come from the offline hash encoder (nn/text_model.py) —
stable but not semantic; override :meth:`get_text_pe` to plug a real CLIP.
"""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.api import YOLO
from fce_yolo_tpu.models.world import _bind_text

__all__ = ["YOLOE"]


class YOLOE(YOLO):
    """Open-vocab prompt model over the YOLOEDetect/YOLOESegment graph."""

    def __init__(self, model: str = "yoloe-11.yaml",
                 text_model: str = "hash:512", **kw):
        super().__init__(model, **kw)
        assert self.spec.needs_text, f"not a YOLOE config: {model}"
        # "clip:<local-ckpt>" switches to the real CLIP tower (text_model.py)
        self.text_model = text_model
        # placeholder until set_classes (reference keeps a random buffer)
        self.txt_feats = np.random.RandomState(0).randn(1, self.spec.nc, 512).astype(np.float32)

    # ------------------------------------------------------------- prompts
    def get_text_pe(self, text: list[str]) -> np.ndarray:
        """Raw text embeddings (1, n, 512); the head's reprta adapter and l2
        norm run in-graph (reference YOLOEModel.get_text_pe, tasks.py)."""
        from fce_yolo_tpu.nn.text_model import build_text_model

        enc = build_text_model(self.text_model)
        return enc.encode_text(enc.tokenize(text))[None]

    def set_classes(self, names: list[str], embeddings: np.ndarray | None = None) -> None:
        """Bind prompt classes for text-mode predict/val/train (reference
        YOLOE.set_classes, models/yolo/yoloe/model.py: accepts precomputed
        embeddings, e.g. from a mobileclip vocab)."""
        self.txt_feats = np.asarray(
            self.get_text_pe(names) if embeddings is None else embeddings, np.float32
        )
        self.names = dict(enumerate(names))

    @staticmethod
    def _prompt_masks(bboxes: np.ndarray, cls: np.ndarray, imgsz: int,
                      ratio: float, pad: tuple[float, float]) -> tuple[np.ndarray, np.ndarray]:
        """Prompt boxes (source pixels) -> per-class binary masks on the P3
        grid of the letterboxed image (reference LoadVisualPrompt semantics,
        augment.py:2156: one channel per prompt class, union of its boxes)."""
        q_cls = np.unique(np.asarray(cls).astype(int))
        g = imgsz // 8
        masks = np.zeros((1, len(q_cls), g, g), np.float32)
        for qi, c in enumerate(q_cls):
            for b in np.asarray(bboxes, np.float32)[np.asarray(cls).astype(int) == c]:
                x1 = int((b[0] * ratio + pad[0]) // 8)
                y1 = int((b[1] * ratio + pad[1]) // 8)
                x2 = int(np.ceil((b[2] * ratio + pad[0]) / 8))
                y2 = int(np.ceil((b[3] * ratio + pad[1]) / 8))
                masks[0, qi, max(y1, 0):min(y2, g), max(x1, 0):min(x2, g)] = 1.0
        return masks, q_cls

    # ------------------------------------------------------------- predict
    def predict(self, source, visual_prompts: dict | None = None, conf: float = 0.25,
                iou: float = 0.7, imgsz: int = 640, max_det: int = 300, **kw):
        if visual_prompts is None:
            # text mode: bind the current class embeddings (world-style shim)
            return self._predict_text(source, conf=conf, iou=iou, imgsz=imgsz,
                                      max_det=max_det, **kw)
        return [self._predict_visual(source, visual_prompts, conf, iou, imgsz, max_det)]

    @_bind_text
    def _predict_text(self, source, **kw):
        return YOLO.predict(self, source, **kw)

    def _predict_visual(self, source, visual_prompts: dict, conf: float, iou: float,
                        imgsz: int, max_det: int):
        """Visual-prompt predict on ONE image (reference YOLOEVPDetectPredictor,
        models/yolo/yoloe/predict.py): prompt boxes define the classes; SAVPE
        pools their grid cells into the scoring embeddings."""
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.data.augment import letterbox
        from fce_yolo_tpu.engine.predictor import load_source
        from fce_yolo_tpu.engine.results import Results
        from fce_yolo_tpu.ops import batched_nms
        from fce_yolo_tpu.ops.boxes import scale_boxes

        imgs = list(load_source(source))
        assert len(imgs) == 1, "visual-prompt predict takes a single image"
        img, path = imgs[0]
        lb, ratio, pad = letterbox(img, imgsz)
        masks, q_cls = self._prompt_masks(
            np.asarray(visual_prompts["bboxes"], np.float32),
            np.asarray(visual_prompts["cls"]), imgsz, ratio, pad,
        )

        v = self._ensure_variables(imgsz)
        x = jnp.asarray(lb[None, ..., ::-1], jnp.float32) / 255.0
        out = jax.jit(
            lambda v, x, m: self.model.apply(v, x, train=False, visual_prompts=m)
        )(v, x, jnp.asarray(masks))
        nms = jax.device_get(batched_nms(out["preds"], conf_thres=conf, iou_thres=iou,
                                         max_det=max_det, multi_label=False))
        keep = np.asarray(nms["valid"][0], bool)
        boxes = scale_boxes((imgsz, imgsz), np.asarray(nms["boxes"][0][keep]),
                            img.shape[:2], ratio_pad=(ratio, pad))
        # map prompt-slot indices back to the caller's class ids
        cls_ids = q_cls[np.asarray(nms["classes"][0][keep]).astype(int)]
        rows = np.concatenate(
            [np.asarray(boxes), np.asarray(nms["scores"][0][keep])[:, None],
             cls_ids[:, None].astype(np.float32)], 1,
        ).astype(np.float32)
        names = self.names or {int(c): f"object{int(c)}" for c in q_cls}
        return Results(orig_img=img, path=path, names=names, boxes=rows)

    # --------------------------------------------------------------- train
    def train(self, *a, **kw):
        """Text-prompt training with the bound class embeddings (reference
        YOLOEPETrainer semantics: standard detection loss over contrastive
        logits, models/yolo/yoloe/train.py). Like the reference trainer, the
        text embeddings follow the DATASET class names — a stale
        ``set_classes`` binding with a different class count is re-bound
        here (the head scores nc slots; a mismatched txt tensor would shift
        the box/cls/coef slicing downstream)."""
        self._rebind_to_dataset(kw.get("data") or (a[0] if a else None))
        return self._train_text_bound(*a, **kw)

    def _rebind_to_dataset(self, data) -> None:
        if data is None:
            return
        from fce_yolo_tpu.data.dataset import check_det_dataset

        d = check_det_dataset(data)
        names = d.get("names") or {i: f"class_{i}" for i in range(d["nc"])}
        names = {int(k): str(v) for k, v in (
            names.items() if isinstance(names, dict) else enumerate(names)
        )}
        if len(names) != len(getattr(self, "names", None) or {}):
            self.set_classes([v for _, v in sorted(names.items())])

    @_bind_text
    def _train_text_bound(self, *a, **kw):
        return YOLO.train(self, *a, **kw)

    @_bind_text
    def val(self, *a, **kw):
        return YOLO.val(self, *a, **kw)

    def train_visual_prompt(self, data, **kw):
        """Visual-prompt training (reference YOLOEVPTrainer + TVPDetectLoss,
        models/yolo/yoloe/train.py / utils/loss.py:869): every batch carries
        GT-derived per-class P3 prompt masks, the head scores against SAVPE
        embeddings, and ONLY the SAVPE branch updates — backbone, box
        branches, and the text path are frozen. Per-epoch val runs through
        the text binding (set_classes first, or class_<i> names are used)."""
        from fce_yolo_tpu.data.dataset import check_det_dataset

        d = check_det_dataset(data)
        names = d.get("names") or {i: f"class_{i}" for i in range(d["nc"])}
        names = {int(k): str(v) for k, v in (
            names.items() if isinstance(names, dict) else enumerate(names)
        )}
        self.set_classes([v for _, v in sorted(names.items())])
        return self._train_vp_bound(data, ["except:savpe"], **kw)

    @_bind_text
    def _train_vp_bound(self, data, freeze, **kw):
        from fce_yolo_tpu.data.multimodal import YOLOVisualPromptDataset

        kw.setdefault("freeze", freeze)
        return YOLO.train(self, data=data, dataset_cls=YOLOVisualPromptDataset,
                          dataset_kw={"nc": len(self.names)}, **kw)

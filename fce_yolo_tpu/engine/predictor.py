"""Streaming detection predictor.

Analog of the reference BasePredictor/DetectionPredictor
(engine/predictor.py:277 stream_inference, models/yolo/detect/predict.py).
TPU design: sources are normalized to fixed-size letterboxed uint8 batches
on the host; ONE jit covers normalize -> forward -> decode -> NMS; results
stream back as host-side Results objects. Batch shape is padded to the
predictor's fixed batch size so the jit compiles once.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from fce_yolo_tpu.data.augment import letterbox
from fce_yolo_tpu.data.dataset import IMG_FORMATS
from fce_yolo_tpu.engine.results import Results
from fce_yolo_tpu.ops import batched_nms

__all__ = ["DetectionPredictor", "load_source"]

VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "webm", "wmv"}


def load_source(source) -> Iterator[tuple[np.ndarray, str]]:
    """Yield (BGR image, path-or-id) from any supported source type.

    Supported: ndarray, PIL.Image, file path, dir path, glob list, video file
    (reference data/build.py:391 load_inference_source, simplified: no
    webcams/streams in this environment).
    """
    import cv2

    from fce_yolo_tpu.utils.patches import imread

    if isinstance(source, (list, tuple)):
        for s in source:
            yield from load_source(s)
        return
    if isinstance(source, np.ndarray):
        yield source, "array"
        return
    if isinstance(source, str) and (
        source.lower().startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://"))
        or source.endswith(".streams")
        or source.isnumeric()
    ):
        from fce_yolo_tpu.data.loaders import LoadStreams

        streams = LoadStreams(source)
        for names, frames in streams:
            for name, frame in zip(names, frames):
                yield frame, name
        return
    if isinstance(source, str) and source.startswith("screen"):
        from fce_yolo_tpu.data.loaders import LoadScreenshots

        for names, frames in LoadScreenshots(source):
            yield frames[0], names[0]
        return
    if source.__class__.__module__.startswith("PIL"):
        arr = np.asarray(source)[..., ::-1]  # RGB -> BGR
        yield np.ascontiguousarray(arr), "pil"
        return
    p = Path(source)
    if p.is_dir():
        for f in sorted(p.rglob("*")):
            if f.suffix[1:].lower() in IMG_FORMATS:
                img = imread(str(f))
                if img is not None:
                    yield img, str(f)
        return
    if p.is_file():
        if p.suffix[1:].lower() in VID_FORMATS:
            cap = cv2.VideoCapture(str(p))
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield frame, f"{p}#frame{i}"
                i += 1
            cap.release()
            return
        img = imread(str(p))
        if img is None:
            raise FileNotFoundError(f"failed to read {p}")
        yield img, str(p)
        return
    raise FileNotFoundError(f"source not found: {source}")


class DetectionPredictor:
    """Fixed-shape batched predictor over arbitrary sources.

    task="detect" | "segment" | "pose": segment adds per-detection binary
    masks (prototype combination on device, reference ops.py process_mask);
    pose adds decoded keypoints.
    """

    def __init__(
        self,
        model,
        names: dict[int, str],
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        batch_size: int = 1,
        task: str = "detect",
        infer_fn=None,
    ):
        self.infer_fn = infer_fn  # AutoBackend override: images -> raw preds
        self.model = model
        self.names = names
        self.nc = len(names)
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.batch_size = batch_size
        self.task = task
        self._predict = None

    def _build_predict(self):
        import jax
        import jax.numpy as jnp

        model, conf, iou, max_det = self.model, self.conf, self.iou, self.max_det
        nc, task, imgsz = self.nc, self.task, self.imgsz

        if self.infer_fn is not None:
            # exported-artifact path (AutoBackend): external runtime -> raw
            # preds; single-label NMS in-JAX (predict default, nms.py:19)
            post = jax.jit(
                lambda preds: batched_nms(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det,
                    multi_label=False,
                )
            )
            infer = self.infer_fn

            def predict_backend(variables, img_u8):
                preds = infer(np.asarray(img_u8))
                if isinstance(preds, dict):  # NMS baked into the artifact
                    return preds
                return post(jnp.asarray(preds))

            return predict_backend

        # Pallas fused stem (ops/pallas_stem.py): on TPU, eligible graphs
        # (s scale and up) run layers 0..2 in one VMEM-resident kernel —
        # measured e2e 1.74x at s, 1.16x at m (EVIDENCE.md round 4).
        # FY_NO_FUSED_STEM=1 opts out; CPU always uses the plain path.
        # Precision: the kernel folds stem weights to bf16, so it is only
        # taken when the checkpoint params are already bf16 (the production
        # serving dtype) — f32 variables keep the documented f32 normalize
        # path bit-for-bit unless FY_FORCE_FUSED_STEM=1 opts in.
        ss = None
        import os as _os

        if not _os.environ.get("FY_NO_FUSED_STEM") and getattr(
                model, "spec", None) is not None:
            try:
                if any("TPU" in str(getattr(d, "device_kind", ""))
                       for d in jax.devices()):
                    from fce_yolo_tpu.ops.pallas_stem import stem_spec_from_model

                    ss = stem_spec_from_model(model.spec, (imgsz, imgsz))
            except Exception:
                ss = None
        force_fused = bool(_os.environ.get("FY_FORCE_FUSED_STEM"))

        @jax.jit
        def predict(variables, img_u8):
            # trace-time dtype gate (see precision note above)
            leaves = jax.tree_util.tree_leaves(variables.get("params", variables))
            params_bf16 = bool(leaves) and all(
                l.dtype == jnp.bfloat16 for l in leaves
                if jnp.issubdtype(l.dtype, jnp.floating))
            if ss is not None and (params_bf16 or force_fused):
                from fce_yolo_tpu.ops.pallas_stem import apply_with_fused_stem

                out = apply_with_fused_stem(model, variables, img_u8, ss)
            else:
                x = img_u8.astype(jnp.float32) / 255.0
                out = model.apply(variables, x, train=False)
            # predict is single-label per box (reference nms.py:19 default);
            # the validator uses multi_label=True for mAP parity
            if task == "rtdetr":
                # NMS-free: the 300 decoder queries are the detections
                # (reference models/rtdetr/predict.py)
                preds = out["preds"]
                xywh = preds[..., :4] * imgsz
                boxes = jnp.concatenate(
                    [xywh[..., :2] - xywh[..., 2:] / 2, xywh[..., :2] + xywh[..., 2:] / 2], -1
                )
                best = preds[..., 4:].max(-1)
                cls = jnp.argmax(preds[..., 4:], -1).astype(jnp.int32)
                order = jnp.argsort(-best, axis=-1)
                boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
                best = jnp.take_along_axis(best, order, axis=1)
                cls = jnp.take_along_axis(cls, order, axis=1)
                return {"boxes": boxes, "scores": best, "classes": cls, "valid": best > conf}
            if "preds6" in out:
                # v10Detect end2end: already top-k (B, max_det, 6), no NMS
                # (reference v10 predict path)
                p6 = out["preds6"]
                return {
                    "boxes": p6[..., :4],
                    "scores": p6[..., 4],
                    "classes": p6[..., 5].astype(jnp.int32),
                    "valid": p6[..., 4] > conf,
                }
            if task == "obb":
                from fce_yolo_tpu.ops.nms import rotated_batched_nms

                nms = rotated_batched_nms(
                    out["preds"], conf_thres=conf, iou_thres=iou,
                    max_det=max_det, multi_label=False, nc=nc,
                )
                nms["angle"] = nms.pop("extra")
                return nms
            nms = batched_nms(
                out["preds"], conf_thres=conf, iou_thres=iou, max_det=max_det,
                multi_label=False,
                nc=nc if task in ("segment", "pose") else None,
            )
            if task == "segment":
                from fce_yolo_tpu.ops.masks import process_mask

                nms["masks"] = jax.vmap(
                    lambda coefs, proto, boxes: process_mask(
                        coefs, proto, boxes, (imgsz, imgsz)
                    )
                )(nms.pop("extra"), out["proto"], nms["boxes"])
            elif task == "pose" and "extra" in nms:
                nms["keypoints"] = nms.pop("extra")
            return nms

        return predict

    def _maybe_fold(self, variables: dict) -> tuple[dict, object]:
        """Fold Conv+BN into weights for inference (reference Model.fuse) —
        removes the standalone BN normalize kernels + layout copies the
        round-5 l/x traces surfaced (EVIDENCE.md round 5). Memoized per
        variables object; FY_NO_FOLD_BN=1 keeps the eval-BN graph. Returns
        (variables, trace_scope)."""
        import contextlib
        import os

        if os.environ.get("FY_NO_FOLD_BN") or self.infer_fn is not None:
            return variables, contextlib.nullcontext()
        cached = getattr(self, "_fold_cache", None)
        if cached is not None and cached[0] is variables:
            folded = cached[1]
        else:
            try:
                from fce_yolo_tpu.nn.model import fold_conv_bn

                folded = fold_conv_bn(variables)
            except Exception:
                return variables, contextlib.nullcontext()
            self._fold_cache = (variables, folded)
        from fce_yolo_tpu.nn.modules import fused_bn_scope

        return folded, fused_bn_scope()

    def stream(self, variables: dict, source) -> Iterator[Results]:
        """Generator over Results, batching the source internally."""
        import jax

        variables, scope = self._maybe_fold(variables)
        if self._predict is None:
            self._predict = self._build_predict()

        pending: list[tuple[np.ndarray, str, float, tuple[float, float]]] = []
        imgs: list[np.ndarray] = []

        def flush() -> Iterable[Results]:
            if not pending:
                return
            n = len(pending)
            while len(imgs) < self.batch_size:  # pad to static shape
                imgs.append(imgs[-1])
            t0 = time.perf_counter()
            batch = np.stack(imgs, 0)
            t_pre = time.perf_counter() - t0
            t0 = time.perf_counter()
            with scope:  # trace-time fused-BN flag (no-op post-compile)
                out = jax.device_get(self._predict(variables, batch))
            t_inf = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(n):
                orig, path, r, (pw, ph) = pending[i]
                valid = out["valid"][i]
                boxes = out["boxes"][i][valid]
                oh, ow = orig.shape[:2]
                if "angle" in out:
                    # rotated boxes are (cx, cy, w, h): shift only the center
                    # out of the letterbox, never clip w/h (reference
                    # obb/predict.py regularize + scale_boxes xywh=True)
                    xywhr = np.concatenate(
                        [boxes, out["angle"][i][valid][:, :1]], 1)
                    xywhr[:, :2] = (xywhr[:, :2] - np.array([pw, ph])) / r
                    xywhr[:, 2:4] = xywhr[:, 2:4] / r
                    obb_data = np.concatenate(
                        [xywhr, out["scores"][i][valid, None],
                         out["classes"][i][valid, None]], 1)
                    yield Results(
                        orig, path, self.names, obb=obb_data,
                        speed={
                            "preprocess": t_pre * 1000 / n,
                            "inference": t_inf * 1000 / n,
                            "postprocess": (time.perf_counter() - t0) * 1000 / n,
                        },
                    )
                    continue
                boxes = (boxes - np.array([pw, ph, pw, ph])) / r
                boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, ow)
                boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, oh)
                data = np.concatenate(
                    [boxes, out["scores"][i][valid, None], out["classes"][i][valid, None]], 1
                )
                masks = kpts = None
                if "masks" in out:
                    from fce_yolo_tpu.ops.masks import scale_masks_np

                    masks = scale_masks_np(out["masks"][i][valid], (oh, ow), r, (pw, ph))
                if "keypoints" in out:
                    k = out["keypoints"][i][valid]
                    nk = k.shape[-1] // 3 if k.shape[-1] % 3 == 0 else k.shape[-1] // 2
                    ndim = 3 if k.shape[-1] % 3 == 0 else 2
                    kpts = k.reshape(len(k), nk, ndim).copy()
                    kpts[..., 0] = (kpts[..., 0] - pw) / r
                    kpts[..., 1] = (kpts[..., 1] - ph) / r
                yield Results(
                    orig, path, self.names, boxes=data, masks=masks, keypoints=kpts,
                    speed={
                        "preprocess": t_pre * 1000 / n,
                        "inference": t_inf * 1000 / n,
                        "postprocess": (time.perf_counter() - t0) * 1000 / n,
                    },
                )
            pending.clear()
            imgs.clear()

        for img, path in load_source(source):
            lb, r, pad = letterbox(img, self.imgsz, scaleup=False)
            pending.append((img, path, r, pad))
            # BGR -> RGB: sources yield BGR, the model consumes RGB
            # (reference predictor.py:164)
            imgs.append(np.ascontiguousarray(lb[..., ::-1]))
            if len(pending) == self.batch_size:
                yield from flush()
        yield from flush()

    def __call__(self, variables: dict, source) -> list[Results]:
        return list(self.stream(variables, source))

"""Pose (OKS) and OBB (rotated-IoU) validators.

Analogs of the reference PoseValidator/OBBValidator (models/yolo/{pose,obb}/
val.py; metrics kpt_iou:240, probiou:283): the same jitted batch-inference +
host-matching skeleton as DetectionValidator, with the matching IoU swapped
for OKS (pose, in addition to box mAP) or probiou (obb).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from fce_yolo_tpu.data import DataLoader, YOLODataset, check_det_dataset
from fce_yolo_tpu.engine.validator import DetectionValidator
from fce_yolo_tpu.ops import batched_nms
from fce_yolo_tpu.utils.metrics import DetMetrics, box_iou_np, match_predictions

__all__ = ["PoseValidator", "OBBValidator", "kpt_iou_np", "probiou_np"]

OKS_SIGMA17 = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
) / 10.0


def kpt_iou_np(gt_kpts: np.ndarray, pred_kpts: np.ndarray, gt_area: np.ndarray,
               sigmas: np.ndarray | None = None, eps: float = 1e-7) -> np.ndarray:
    """Object keypoint similarity (G, D) (reference metrics.py:240-282).

    gt_kpts: (G, K, 3) with visibility; pred_kpts: (D, K, 2+); gt_area: (G,).
    """
    nk = gt_kpts.shape[1]
    if sigmas is None:
        sigmas = OKS_SIGMA17 if nk == 17 else np.full(nk, 1.0 / nk)
    d2 = ((gt_kpts[:, None, :, :2] - pred_kpts[None, :, :, :2]) ** 2).sum(-1)  # (G, D, K)
    vis = gt_kpts[:, None, :, 2] > 0
    e = d2 / (2 * sigmas[None, None]) ** 2 / (gt_area[:, None, None] + eps) / 2
    oks = np.exp(-e) * vis
    return oks.sum(-1) / (vis.sum(-1) + eps)


def probiou_np(a: np.ndarray, b: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Pairwise probabilistic IoU between (G, 5) and (D, 5) xywhr boxes
    (host mirror of ops/iou.py::probiou)."""
    import jax.numpy as jnp

    from fce_yolo_tpu.ops.iou import probiou

    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)), np.float32)
    return np.asarray(probiou(jnp.asarray(a)[:, None, :], jnp.asarray(b)[None, :, :]))


class PoseValidator(DetectionValidator):
    """Box mAP + pose (OKS) mAP."""

    def __init__(self, *a, kpt_shape: tuple[int, int] = (17, 3), **kw):
        super().__init__(*a, **kw)
        self.kpt_shape = tuple(kpt_shape)

    def get_dataloader(self, data, split: str = "val") -> DataLoader:
        d = check_det_dataset(data)
        ds = YOLODataset(d[split], imgsz=self.imgsz, mode="val", nc=d["nc"],
                         task="pose", kpt_shape=self.kpt_shape)
        return DataLoader(ds, batch_size=self.batch_size, shuffle=False, workers=self.workers, drop_last=False)

    def _build_predict(self):
        import jax
        import jax.numpy as jnp

        conf, iou, max_det, nc = self.conf, self.iou, self.max_det, self.nc
        model = self.model

        @jax.jit
        def predict(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            preds = model.apply(variables, x, train=False)["preds"]
            out = batched_nms(preds, conf_thres=conf, iou_thres=iou, max_det=max_det,
                              nc=nc, pre_nms_topk=self.pre_nms_topk)
            out["keypoints"] = out.pop("extra")
            return out

        return predict

    def __call__(self, variables, data=None, dataloader=None, verbose=True, **kw):
        import jax

        loader = dataloader or self.get_dataloader(data)
        if self._predict is None:
            self._predict = self._build_predict()
        box_m, pose_m = DetMetrics(names=self.names), DetMetrics(names=self.names)
        nk, nd = self.kpt_shape
        s = self.imgsz
        n_images = 0
        t0 = time.perf_counter()
        for batch in loader:
            out = jax.device_get(self._predict(variables, batch["img"]))
            for i in range(batch["n_valid"]):
                valid = np.asarray(out["valid"][i])
                pboxes = np.asarray(out["boxes"][i])[valid]
                pconf = np.asarray(out["scores"][i])[valid]
                pcls = np.asarray(out["classes"][i])[valid].astype(float)
                pk = np.asarray(out["keypoints"][i])[valid].reshape(-1, nk, 3 if nd == 3 else 2)

                m = batch["mask"][i]
                gxywh = batch["bboxes"][i][m] * s  # letterbox-pixel space
                gcls = batch["cls"][i][m].astype(float)
                gboxes = np.stack(
                    [gxywh[:, 0] - gxywh[:, 2] / 2, gxywh[:, 1] - gxywh[:, 3] / 2,
                     gxywh[:, 0] + gxywh[:, 2] / 2, gxywh[:, 1] + gxywh[:, 3] / 2], 1
                ) if len(gxywh) else np.zeros((0, 4))
                gk = batch["keypoints"][i][m] * np.array([s, s, 1], np.float32)
                garea = gxywh[:, 2] * gxywh[:, 3] * 0.53 if len(gxywh) else np.zeros(0)

                if len(pcls) and len(gcls):
                    tp_b = match_predictions(pcls, gcls, box_iou_np(gboxes, pboxes))
                    tp_p = match_predictions(pcls, gcls, kpt_iou_np(gk, pk, garea))
                else:
                    tp_b = np.zeros((len(pcls), 10), bool)
                    tp_p = np.zeros((len(pcls), 10), bool)
                stat = dict(conf=pconf, pred_cls=pcls, target_cls=gcls, target_img=np.unique(gcls))
                box_m.update_stats({**stat, "tp": tp_b})
                pose_m.update_stats({**stat, "tp": tp_p})
            n_images += batch["n_valid"]
        box_m.process(nc=self.nc)
        pose_m.process(nc=self.nc)
        results: dict[str, Any] = {}
        for tag, mm in (("B", box_m), ("P", pose_m)):
            mp, mr, map50, map5095 = mm.mean_results()
            results.update({f"metrics/precision({tag})": mp, f"metrics/recall({tag})": mr,
                            f"metrics/mAP50({tag})": map50, f"metrics/mAP50-95({tag})": map5095})
        results["fitness"] = (box_m.fitness + pose_m.fitness) / 2
        results["metrics"] = {"box": box_m, "pose": pose_m}
        if verbose:
            print(f"box mAP50-95 {box_m.map:.3f} | pose mAP50-95 {pose_m.map:.3f} "
                  f"({n_images} images, {time.perf_counter() - t0:.1f}s)")
        return results


class OBBValidator(DetectionValidator):
    """Rotated-box mAP via probiou matching (reference OBBValidator)."""

    def get_dataloader(self, data, split: str = "val") -> DataLoader:
        d = check_det_dataset(data)
        ds = YOLODataset(d[split], imgsz=self.imgsz, mode="val", nc=d["nc"], task="obb")
        return DataLoader(ds, batch_size=self.batch_size, shuffle=False, workers=self.workers, drop_last=False)

    def _build_predict(self):
        import jax
        import jax.numpy as jnp

        conf, iou, max_det, nc = self.conf, self.iou, self.max_det, self.nc
        model = self.model

        @jax.jit
        def predict(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            preds = model.apply(variables, x, train=False)["preds"]
            # OBB preds: rotated cx,cy,w,h + scores + angle; suppress with
            # true probiou rotated NMS (reference nms_rotated Fast-NMS
            # semantics) so elongated rotated boxes aren't over-suppressed.
            from fce_yolo_tpu.ops.nms import rotated_batched_nms

            out = rotated_batched_nms(preds, conf_thres=conf, iou_thres=iou,
                                      max_det=max_det, nc=nc)
            out["angle"] = out.pop("extra")
            return out

        return predict

    def __call__(self, variables, data=None, dataloader=None, verbose=True, **kw):
        import jax

        loader = dataloader or self.get_dataloader(data)
        if self._predict is None:
            self._predict = self._build_predict()
        metrics = DetMetrics(names=self.names)
        s = self.imgsz
        n_images = 0
        t0 = time.perf_counter()
        for batch in loader:
            out = jax.device_get(self._predict(variables, batch["img"]))
            for i in range(batch["n_valid"]):
                valid = np.asarray(out["valid"][i])
                pxywh = np.asarray(out["boxes"][i])[valid]  # rotated NMS keeps xywh
                pconf = np.asarray(out["scores"][i])[valid]
                pcls = np.asarray(out["classes"][i])[valid].astype(float)
                pang = np.asarray(out["angle"][i])[valid]
                pang = pang[:, 0] if pang.ndim == 2 else pang.reshape(-1)
                pr = (
                    np.concatenate([pxywh, pang[:, None]], 1)
                    if len(pxywh)
                    else np.zeros((0, 5))
                )

                m = batch["mask"][i]
                grb = batch["bboxes"][i][m] * np.array([s, s, s, s, 1], np.float32)
                gcls = batch["cls"][i][m].astype(float)
                if len(pcls) and len(gcls):
                    tp = match_predictions(pcls, gcls, probiou_np(grb, pr))
                else:
                    tp = np.zeros((len(pcls), 10), bool)
                metrics.update_stats(dict(tp=tp, conf=pconf, pred_cls=pcls,
                                          target_cls=gcls, target_img=np.unique(gcls)))
            n_images += batch["n_valid"]
        metrics.process(nc=self.nc)
        results = metrics.results_dict
        results["metrics"] = metrics
        if verbose:
            print(f"rotated mAP50-95 {metrics.map:.3f} ({n_images} images, "
                  f"{time.perf_counter() - t0:.1f}s)")
        return results

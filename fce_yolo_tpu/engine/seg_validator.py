"""Segmentation validator: box mAP + mask mAP.

Analog of the reference SegmentationValidator/SegmentMetrics
(models/yolo/segment/val.py, utils/metrics.py:1248): detections are matched
to GT twice — by box IoU and by mask IoU — producing Box(B) and Mask(M)
metric families. Masks are compared at prototype resolution (imgsz/4), the
same space the GT bitmaps are rasterized into at collate; fitness averages
the box and mask fitness (reference SegmentMetrics.fitness).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from fce_yolo_tpu.data import DataLoader, YOLODataset, check_det_dataset
from fce_yolo_tpu.engine.validator import DetectionValidator
from fce_yolo_tpu.ops import batched_nms
from fce_yolo_tpu.utils.metrics import DetMetrics, box_iou_np, match_predictions

__all__ = ["SegmentationValidator"]


def mask_iou_np(a: np.ndarray, b: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(G, H, W) x (D, H, W) binary masks -> (G, D) IoU (reference metrics.py:222)."""
    g = a.reshape(len(a), -1).astype(np.float32)
    d = b.reshape(len(b), -1).astype(np.float32)
    inter = g @ d.T
    union = g.sum(1)[:, None] + d.sum(1)[None, :] - inter
    return inter / (union + eps)


class SegmentationValidator(DetectionValidator):
    def get_dataloader(self, data: str | dict, split: str = "val") -> DataLoader:
        d = check_det_dataset(data)
        ds = YOLODataset(d[split], imgsz=self.imgsz, mode="val", nc=d["nc"], task="segment",
                         rect=self.rect, batch_size=self.batch_size)
        return DataLoader(ds, batch_size=self.batch_size, shuffle=False, workers=self.workers, drop_last=False)

    def _build_predict(self):
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.ops.masks import process_mask

        conf, iou, max_det, nc, imgsz = self.conf, self.iou, self.max_det, self.nc, self.imgsz
        model = self.model

        @jax.jit
        def predict(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            out = model.apply(variables, x, train=False)
            nms = batched_nms(
                out["preds"], conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc,
                pre_nms_topk=self.pre_nms_topk,
            )
            # masks at prototype resolution (= GT bitmap resolution); the
            # network-input shape comes from the traced batch so rect
            # (non-square) val bins work (x.shape is static per trace)
            nms["masks"] = jax.vmap(
                lambda coefs, proto, boxes: process_mask(
                    coefs, proto, boxes, (x.shape[1], x.shape[2]), upsample=False
                )
            )(nms.pop("extra"), out["proto"], nms["boxes"])
            return nms

        return predict

    def __call__(self, variables, data=None, dataloader=None, verbose=True, **kw):
        import jax

        assert data is not None or dataloader is not None
        loader = dataloader or self.get_dataloader(data)
        if self._predict is None:
            self._predict = self._build_predict()

        box_m = DetMetrics(names=self.names)
        mask_m = DetMetrics(names=self.names)
        t0_all = time.perf_counter()
        n_images = 0
        for batch in loader:
            out = jax.device_get(self._predict(variables, batch["img"]))
            self._update_seg(out, batch, box_m, mask_m)
            n_images += batch["n_valid"]
        box_m.process(nc=self.nc)
        mask_m.process(nc=self.nc)

        results: dict[str, Any] = {}
        for tag, m in (("B", box_m), ("M", mask_m)):
            mp, mr, map50, map5095 = m.mean_results()
            results.update({
                f"metrics/precision({tag})": mp,
                f"metrics/recall({tag})": mr,
                f"metrics/mAP50({tag})": map50,
                f"metrics/mAP50-95({tag})": map5095,
            })
        results["fitness"] = (box_m.fitness + mask_m.fitness) / 2
        results["metrics"] = {"box": box_m, "mask": mask_m}
        if verbose:
            print(f"box mAP50-95 {box_m.map:.3f} | mask mAP50-95 {mask_m.map:.3f} "
                  f"({n_images} images, {time.perf_counter() - t0_all:.1f}s)")
        return results

    def _update_seg(self, out, batch, box_m: DetMetrics, mask_m: DetMetrics):
        # GT boxes are normalized by the letterboxed image dims (collate) —
        # for rect batches that is NOT imgsz x imgsz, so lift per-axis
        bh_img, bw_img = batch["img"].shape[1:3]
        s = np.array([bw_img, bh_img, bw_img, bh_img], np.float32)
        for i in range(batch["n_valid"]):
            valid = np.asarray(out["valid"][i])
            pboxes_lb = np.asarray(out["boxes"][i])[valid]  # letterbox space
            pconf = np.asarray(out["scores"][i])[valid]
            pcls = np.asarray(out["classes"][i])[valid].astype(float)
            pmasks = np.asarray(out["masks"][i])[valid]

            # match in LETTERBOX space, unclipped (reference detect/val.py:
            # 128-166 — see engine/validator.py note)
            pboxes = pboxes_lb

            m = batch["mask"][i]
            gxywh = batch["bboxes"][i][m] * s
            gcls = batch["cls"][i][m].astype(float)
            gboxes = np.stack(
                [gxywh[:, 0] - gxywh[:, 2] / 2, gxywh[:, 1] - gxywh[:, 3] / 2,
                 gxywh[:, 0] + gxywh[:, 2] / 2, gxywh[:, 1] + gxywh[:, 3] / 2], 1
            ) if len(gxywh) else np.zeros((0, 4))
            gmasks = batch["masks"][i][m] > 0.5  # (G, hm, wm), letterbox space

            if len(pcls) and len(gcls):
                tp_b = match_predictions(pcls, gcls, box_iou_np(gboxes, pboxes))
                tp_msk = match_predictions(pcls, gcls, mask_iou_np(gmasks, pmasks))
            else:
                tp_b = np.zeros((len(pcls), 10), bool)
                tp_msk = np.zeros((len(pcls), 10), bool)
            stat = dict(conf=pconf, pred_cls=pcls, target_cls=gcls, target_img=np.unique(gcls))
            box_m.update_stats({**stat, "tp": tp_b})
            mask_m.update_stats({**stat, "tp": tp_msk})

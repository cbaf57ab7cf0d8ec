"""Numerics layer tests: box conversions, IoU family, anchors, DFL, NMS.

Golden values cross-checked against torch implementations written inline
from the published formulas (not imported from the reference repo), plus
hand-computed cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fce_yolo_tpu.ops import (
    batched_nms,
    bbox2dist,
    bbox_iou,
    bbox_wiou,
    box_iou_pairwise,
    dfl_expectation,
    dist2bbox,
    make_anchors,
    make_divisible,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)


def rand_boxes_xyxy(n, size=100.0, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxes:
    def test_xywh_roundtrip(self):
        b = rand_boxes_xyxy(32)
        out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(b))))
        np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)

    def test_xywh2xyxy_known(self):
        out = np.asarray(xywh2xyxy(jnp.array([10.0, 20.0, 4.0, 6.0])))
        np.testing.assert_allclose(out, [8, 17, 12, 23])

    def test_make_divisible(self):
        assert make_divisible(63.9, 8) == 64
        assert make_divisible(64, 8) == 64
        assert make_divisible(65, 8) == 72
        # width-scaled channel examples from the yolo11 scales table
        assert make_divisible(min(256, 1024) * 0.25, 8) == 64  # n-scale
        assert make_divisible(min(1024, 512) * 1.0, 8) == 512  # m-scale

    def test_scale_boxes(self):
        # 640x640 letterboxed from a 480x640 original: gain 1.0, pad_h 80
        boxes = jnp.array([[100.0, 100.0, 200.0, 200.0]])
        out = np.asarray(scale_boxes((640, 640), boxes, (480, 640)))
        np.testing.assert_allclose(out, [[100, 20, 200, 120]])


class TestIoU:
    def test_identity(self):
        b = jnp.asarray(rand_boxes_xyxy(16))
        for mode in ("IoU", "GIoU", "DIoU", "CIoU"):
            iou = np.asarray(bbox_iou(b, b, xywh=False, mode=mode))
            np.testing.assert_allclose(iou, 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(bbox_wiou(b, b, xywh=False)), 1.0, atol=1e-4)

    def test_disjoint(self):
        a = jnp.array([0.0, 0.0, 10.0, 10.0])
        b = jnp.array([20.0, 20.0, 30.0, 30.0])
        assert float(bbox_iou(a, b, xywh=False)) == 0.0
        assert float(bbox_iou(a, b, xywh=False, mode="GIoU")) < 0  # GIoU penalizes gap
        assert float(bbox_iou(a, b, xywh=False, mode="DIoU")) < 0

    def test_half_overlap(self):
        a = jnp.array([0.0, 0.0, 10.0, 10.0])
        b = jnp.array([0.0, 5.0, 10.0, 15.0])
        np.testing.assert_allclose(float(bbox_iou(a, b, xywh=False)), 50 / 150, rtol=1e-5)

    def test_vs_torch_formula(self):
        """Cross-check CIoU/DIoU/GIoU against an independent torch implementation."""
        torch = pytest.importorskip("torch")
        import math

        def torch_iou(b1, b2, mode):
            b1_x1, b1_y1, b1_x2, b1_y2 = b1.unbind(-1)
            b2_x1, b2_y1, b2_x2, b2_y2 = b2.unbind(-1)
            eps = 1e-7
            w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
            w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
            inter = (torch.min(b1_x2, b2_x2) - torch.max(b1_x1, b2_x1)).clamp(0) * (
                torch.min(b1_y2, b2_y2) - torch.max(b1_y1, b2_y1)
            ).clamp(0)
            union = w1 * h1 + w2 * h2 - inter + eps
            iou = inter / union
            cw = torch.max(b1_x2, b2_x2) - torch.min(b1_x1, b2_x1)
            ch = torch.max(b1_y2, b2_y2) - torch.min(b1_y1, b2_y1)
            if mode == "GIoU":
                c_area = cw * ch + eps
                return iou - (c_area - union) / c_area
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if mode == "DIoU":
                return iou - rho2 / c2
            v = (4 / math.pi**2) * ((w2 / h2).atan() - (w1 / h1).atan()).pow(2)
            alpha = (v / (v - iou + (1 + eps))).detach()
            return iou - (rho2 / c2 + v * alpha)

        a = rand_boxes_xyxy(64, seed=1)
        b = rand_boxes_xyxy(64, seed=2)
        for mode in ("GIoU", "DIoU", "CIoU"):
            want = torch_iou(torch.from_numpy(a), torch.from_numpy(b), mode).numpy()
            got = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=False, mode=mode))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_wiou_formula(self):
        """WIoU v1 = 1 - exp(rho2/c2) * (1 - IoU), checked by direct recompute."""
        a = rand_boxes_xyxy(32, seed=3)
        b = rand_boxes_xyxy(32, seed=4)
        iou = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=False))
        diou = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=False, mode="DIoU"))
        rho2_over_c2 = iou - diou
        want = 1.0 - np.exp(rho2_over_c2) * (1.0 - iou)
        got = np.asarray(bbox_wiou(jnp.asarray(a), jnp.asarray(b), xywh=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_pairwise(self):
        a = jnp.asarray(rand_boxes_xyxy(5))
        b = jnp.asarray(rand_boxes_xyxy(7, seed=9))
        m = np.asarray(box_iou_pairwise(a, b))
        assert m.shape == (5, 7)
        for i in range(5):
            for j in range(7):
                want = float(bbox_iou(a[i], b[j], xywh=False))
                np.testing.assert_allclose(m[i, j], want, rtol=1e-5, atol=1e-6)


class TestAnchors:
    def test_make_anchors(self):
        pts, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
        assert pts.shape == (20, 2)
        np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])  # x fastest
        np.testing.assert_allclose(np.asarray(pts[4]), [0.5, 1.5])
        np.testing.assert_allclose(np.asarray(strides[:16]), 8.0)
        np.testing.assert_allclose(np.asarray(strides[16:]), 16.0)

    def test_dist2bbox_roundtrip(self):
        pts, _ = make_anchors([(8, 8)], [8])
        rng = np.random.RandomState(0)
        dist = jnp.asarray(rng.uniform(0.5, 4.0, (64, 4)).astype(np.float32))
        box = dist2bbox(dist, pts, xywh=False)
        back = bbox2dist(pts, box, reg_max=16)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dist), rtol=1e-5, atol=1e-5)

    def test_dfl_expectation(self):
        # A peaked distribution decodes to its peak bin index.
        logits = np.full((1, 64), -20.0, np.float32)
        for k, peak in enumerate([0, 5, 10, 15]):
            logits[0, k * 16 + peak] = 20.0
        out = np.asarray(dfl_expectation(jnp.asarray(logits), 16))
        np.testing.assert_allclose(out, [[0, 5, 10, 15]], atol=1e-3)

    def test_dfl_uniform(self):
        out = np.asarray(dfl_expectation(jnp.zeros((3, 64)), 16))
        np.testing.assert_allclose(out, 7.5, atol=1e-5)


class TestNMS:
    def test_suppresses_overlaps(self):
        # 3 heavily overlapping boxes + 1 distant; same class
        boxes = np.zeros((1, 8, 4 + 2), np.float32)
        boxes[0, 0, :4] = [50, 50, 20, 20]  # xywh
        boxes[0, 1, :4] = [51, 51, 20, 20]
        boxes[0, 2, :4] = [49, 50, 21, 20]
        boxes[0, 3, :4] = [150, 150, 20, 20]
        boxes[0, :, 4] = [0.9, 0.8, 0.7, 0.85, 0, 0, 0, 0]
        out = batched_nms(jnp.asarray(boxes), conf_thres=0.25, iou_thres=0.45, max_det=10, pre_nms_topk=16)
        valid = np.asarray(out["valid"][0])
        assert valid.sum() == 2
        np.testing.assert_allclose(np.asarray(out["scores"][0][:2]), [0.9, 0.85])

    def test_class_aware(self):
        # identical boxes, different classes -> both kept
        pred = np.zeros((1, 4, 4 + 3), np.float32)
        pred[0, 0, :4] = [50, 50, 20, 20]
        pred[0, 1, :4] = [50, 50, 20, 20]
        pred[0, 0, 4] = 0.9  # class 0
        pred[0, 1, 5] = 0.8  # class 1
        out = batched_nms(jnp.asarray(pred), conf_thres=0.25, pre_nms_topk=12)
        assert int(np.asarray(out["valid"][0]).sum()) == 2
        out_ag = batched_nms(jnp.asarray(pred), conf_thres=0.25, pre_nms_topk=12, agnostic=True)
        assert int(np.asarray(out_ag["valid"][0]).sum()) == 1

    def test_multilabel(self):
        # one box whose two class scores both exceed conf -> two detections
        pred = np.zeros((1, 2, 4 + 3), np.float32)
        pred[0, 0, :4] = [50, 50, 20, 20]
        pred[0, 0, 4] = 0.9
        pred[0, 0, 5] = 0.6
        out = batched_nms(jnp.asarray(pred), conf_thres=0.25, pre_nms_topk=6)
        assert int(np.asarray(out["valid"][0]).sum()) == 2
        cls = sorted(np.asarray(out["classes"][0])[np.asarray(out["valid"][0])].tolist())
        assert cls == [0, 1]

    def test_vs_torchvision(self):
        """Keep-set parity with torchvision greedy NMS on random single-class data."""
        torch = pytest.importorskip("torch")
        torchvision = pytest.importorskip("torchvision")
        rng = np.random.RandomState(7)
        n = 200
        boxes = rand_boxes_xyxy(n, size=200, seed=7)
        scores = rng.uniform(0.3, 1.0, (n,)).astype(np.float32)
        want = torchvision.ops.nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.5).numpy()

        pred = np.concatenate([xyxy2xywh(jnp.asarray(boxes)), scores[:, None]], axis=1)[None]
        out = batched_nms(
            jnp.asarray(pred), conf_thres=0.0, iou_thres=0.5, max_det=n, pre_nms_topk=n, multi_label=False
        )
        valid = np.asarray(out["valid"][0])
        got_scores = np.asarray(out["scores"][0])[valid]
        np.testing.assert_allclose(np.sort(got_scores), np.sort(scores[want]), rtol=1e-5)

    def test_jit_static_shapes(self):
        pred = jnp.zeros((2, 100, 84))
        out = batched_nms(pred, max_det=30, pre_nms_topk=64)
        assert out["boxes"].shape == (2, 30, 4)
        assert out["classes"].dtype == jnp.int32


# -------------------------------------------------------- geometry (host ops)
class TestGeometry:
    def test_segment2box_and_segments2boxes(self):
        from fce_yolo_tpu.ops.geometry import segment2box, segments2boxes

        seg = np.array([[10, 20], [50, 20], [50, 60], [-5, 60]], np.float32)
        np.testing.assert_allclose(segment2box(seg, 640, 640), [10, 20, 50, 60])
        assert (segment2box(np.array([[-1, -1], [700, 700]]), 640, 640) == 0).all()
        b = segments2boxes([seg[:3]])
        np.testing.assert_allclose(b, [[30, 40, 40, 40]])

    def test_norm_roundtrip(self):
        from fce_yolo_tpu.ops.geometry import xywhn2xyxy, xyxy2xywhn

        xywhn = np.array([[0.5, 0.5, 0.25, 0.5]], np.float32)
        xyxy = xywhn2xyxy(xywhn, w=200, h=100)
        np.testing.assert_allclose(xyxy, [[75, 25, 125, 75]])
        back = xyxy2xywhn(xyxy, w=200, h=100)
        np.testing.assert_allclose(back, xywhn, atol=1e-6)
        # mosaic pad offset
        np.testing.assert_allclose(
            xywhn2xyxy(xywhn, 200, 100, padw=10, padh=5), [[85, 30, 135, 80]]
        )

    def test_rotated_roundtrip(self):
        from fce_yolo_tpu.ops.geometry import (
            regularize_rboxes,
            xywhr2xyxyxyxy,
            xyxyxyxy2xywhr,
        )

        r = np.array([[100, 50, 60, 20, 0.3]], np.float32)
        corners = xywhr2xyxyxyxy(r)
        assert corners.shape == (1, 4, 2)
        back = xyxyxyxy2xywhr(corners)
        np.testing.assert_allclose(back[0, :2], [100, 50], atol=0.5)
        assert {round(float(back[0, 2])), round(float(back[0, 3]))} == {60, 20}
        # regularize: w >= h, angle in [0, pi)
        reg = regularize_rboxes(np.array([[0, 0, 20, 60, 0.3]], np.float32))
        assert reg[0, 2] == 60 and reg[0, 3] == 20
        assert 0 <= reg[0, 4] < np.pi

    def test_resample_and_masks2segments(self):
        from fce_yolo_tpu.ops.geometry import masks2segments, resample_segments

        seg = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
        rs = resample_segments([seg], n=40)[0]
        assert rs.shape == (40, 2)
        assert rs[:, 0].min() >= 0 and rs[:, 0].max() <= 10

        m = np.zeros((2, 32, 32), np.uint8)
        m[0, 5:15, 5:15] = 1
        m[1, 2:6, 2:6] = 1
        m[1, 20:30, 20:30] = 1
        segs_all = masks2segments(m, "all")
        segs_big = masks2segments(m, "largest")
        assert len(segs_all) == 2 and len(segs_all[1]) > len(segs_big[1])
        assert segs_big[1][:, 0].min() >= 19  # largest is the 20:30 square

    def test_scale_coords_inverts_letterbox(self):
        from fce_yolo_tpu.ops.geometry import scale_coords

        # original 100x200 -> letterbox 640: gain 3.2, pad (0, 160)
        pts1 = np.array([[0 * 3.2 + 0, 0 * 3.2 + 160], [200 * 3.2, 100 * 3.2 + 160]])
        back = scale_coords((640, 640), pts1, (100, 200))
        np.testing.assert_allclose(back, [[0, 0], [200, 100]], atol=1e-4)

    def test_clean_str(self):
        from fce_yolo_tpu.ops.geometry import clean_str

        assert clean_str("a|b@c#d!e") == "a_b_c_d_e"

    def test_process_mask_native_shapes(self):
        import jax.numpy as jnp

        from fce_yolo_tpu.ops.masks import process_mask, process_mask_native

        rng = np.random.RandomState(0)
        proto = jnp.asarray(rng.randn(20, 20, 8).astype(np.float32))
        coefs = jnp.asarray(rng.randn(3, 8).astype(np.float32))
        boxes = jnp.asarray([[10, 10, 60, 60], [0, 0, 80, 80], [20, 20, 40, 40]],
                            jnp.float32)
        out = process_mask_native(coefs, proto, boxes, (80, 80))
        assert out.shape == (3, 80, 80) and out.dtype == jnp.bool_
        # everything outside box 2 is zero
        m2 = np.asarray(out[2])
        assert not m2[:19].any() and not m2[:, :19].any() and not m2[41:].any()
        # agrees with the crop-then-upsample variant inside box interiors
        ref = np.asarray(process_mask(coefs, proto, boxes, (80, 80)))
        inter = m2[25:35, 25:35] == np.asarray(ref)[2, 25:35, 25:35]
        assert inter.mean() > 0.9

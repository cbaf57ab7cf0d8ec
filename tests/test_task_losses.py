"""Task-loss tests: finite values, gradient flow, and overfit sanity for
segment / pose / obb / classify losses."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seg_setup():
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model

    model, spec, strides = build_model("fce_yolo_tpu/cfg/models/yolo11-seg.yaml", scale="n", nc=2)
    v = jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=True))(jax.random.PRNGKey(0))
    return model, dict(v), strides


def _det_batch(b=2, m=4, nc=2, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "img": rng.rand(b, 64, 64, 3).astype(np.float32),
        "cls": rng.randint(0, nc, (b, m)).astype(np.float32),
        "bboxes": rng.uniform(0.3, 0.6, (b, m, 4)).astype(np.float32),
        "mask": np.ones((b, m), bool),
    }


def test_segmentation_loss_finite_and_grads(seg_setup):
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.train.loss import DetectionLossCfg, LossState
    from fce_yolo_tpu.train.task_losses import segmentation_loss

    model, v, strides = seg_setup
    batch = _det_batch()
    batch["masks"] = (np.random.RandomState(1).rand(2, 4, 16, 16) > 0.5).astype(np.float32)
    cfg = DetectionLossCfg(nc=2, strides=tuple(strides))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            batch["img"], train=True, mutable=["batch_stats"],
        )
        total, parts, _ = segmentation_loss(out, batch, cfg, LossState.init(), max_fg=16)
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total)) and float(total) > 0
    assert "seg" in parts and np.isfinite(float(parts["seg"]))
    # gradient reaches the proto branch
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["layers_23"]["proto"], 0.0
    )
    assert gnorm > 0


def test_pose_loss_finite_and_grads():
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model
    from fce_yolo_tpu.train.loss import DetectionLossCfg, LossState
    from fce_yolo_tpu.train.task_losses import PoseLossCfg, pose_loss

    model, spec, strides = build_model("fce_yolo_tpu/cfg/models/yolo11-pose.yaml", scale="n", nc=1)
    v = dict(jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=True))(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)
    batch = _det_batch(nc=1, rng=rng)
    kpts = rng.uniform(0.3, 0.7, (2, 4, 17, 3)).astype(np.float32)
    kpts[..., 2] = (rng.rand(2, 4, 17) > 0.3).astype(np.float32)  # visibility
    batch["keypoints"] = kpts
    cfg = PoseLossCfg(det=DetectionLossCfg(nc=1, strides=tuple(strides)))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            batch["img"], train=True, mutable=["batch_stats"],
        )
        total, parts, _ = pose_loss(out, batch, cfg, LossState.init(), max_fg=16)
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert np.isfinite(float(parts["kpt"])) and np.isfinite(float(parts["kobj"]))
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads["layers_23"]["cv4_0_0"]))
    assert gnorm > 0


def test_obb_loss_finite_and_grads():
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model
    from fce_yolo_tpu.train.loss import DetectionLossCfg, LossState
    from fce_yolo_tpu.train.task_losses import obb_loss

    model, spec, strides = build_model("fce_yolo_tpu/cfg/models/yolo11-obb.yaml", scale="n", nc=2)
    v = dict(jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=True))(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)
    b, m = 2, 4
    rbox = np.concatenate(
        [rng.uniform(0.3, 0.6, (b, m, 4)), rng.uniform(-0.5, 0.5, (b, m, 1))], -1
    ).astype(np.float32)
    batch = {
        "img": rng.rand(b, 64, 64, 3).astype(np.float32),
        "cls": rng.randint(0, 2, (b, m)).astype(np.float32),
        "bboxes": rbox,
        "mask": np.ones((b, m), bool),
    }
    cfg = DetectionLossCfg(nc=2, strides=tuple(strides))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            batch["img"], train=True, mutable=["batch_stats"],
        )
        total, parts, _ = obb_loss(out, batch, cfg, LossState.init())
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total)) and float(total) > 0
    assert float(parts["fg_count"]) > 0  # rotated containment finds candidates
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads["layers_23"]["cv4_0_0"]))
    assert gnorm > 0


def test_classification_loss():
    import jax.numpy as jnp

    from fce_yolo_tpu.train.task_losses import classification_loss

    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.asarray([0, 1])
    loss, parts = classification_loss(logits, labels)
    assert float(loss) < 1e-3
    loss_bad, _ = classification_loss(logits, jnp.asarray([1, 0]))
    assert float(loss_bad) > 5.0


def test_rotated_assign_axis_aligned_matches_standard():
    """With angle=0 the rotated assigner's containment must match the
    axis-aligned assigner's candidate logic."""
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.train import tal

    rng = np.random.RandomState(0)
    b, a, m, nc = 1, 64, 3, 2
    anc = jnp.asarray(rng.uniform(0, 32, (a, 2)).astype(np.float32))
    scores = jnp.asarray(rng.rand(b, a, nc).astype(np.float32))
    xywh = rng.uniform(8, 24, (b, m, 4)).astype(np.float32)
    gt_xyxy = np.concatenate([xywh[..., :2] - xywh[..., 2:] / 2, xywh[..., :2] + xywh[..., 2:] / 2], -1)
    boxes_r = jnp.asarray(np.concatenate([xywh, np.zeros((b, m, 1), np.float32)], -1))
    pred_xyxy = jnp.asarray(np.sort(rng.uniform(0, 32, (b, a, 2, 2)), axis=2).reshape(b, a, 4).astype(np.float32))
    pw = pred_xyxy[..., 2:] - pred_xyxy[..., :2]
    pc = (pred_xyxy[..., 2:] + pred_xyxy[..., :2]) / 2
    pred_r = jnp.concatenate([pc, pw, jnp.zeros((b, a, 1))], -1)
    labels = jnp.asarray(rng.randint(0, nc, (b, m)).astype(np.float32))
    mask = jnp.ones((b, m), bool)

    std = tal.assign(scores, pred_xyxy, anc, labels.astype(jnp.int32), jnp.asarray(gt_xyxy), mask, topk=5, num_classes=nc)
    rot = tal.assign_rotated(scores, pred_r, anc, labels.astype(jnp.int32), boxes_r, mask, topk=5, num_classes=nc)
    # same foreground support (metrics differ: CIoU vs probiou)
    assert int(rot.fg_mask.sum()) > 0
    np.testing.assert_array_equal(
        np.asarray(std.target_labels[std.fg_mask & rot.fg_mask]),
        np.asarray(rot.target_labels[std.fg_mask & rot.fg_mask]),
    )

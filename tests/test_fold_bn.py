"""Conv+BN weight folding (reference Model.fuse / fuse_conv_and_bn).

Round-5 inference-path optimization: l/x kernel traces showed standalone BN
normalize kernels + layout copies surviving XLA fusion; fold_conv_bn removes
them at the weights level and ConvBNAct traces as a biased conv under
fused_bn_scope. These tests pin the numerics across module zoos (including
RepConv/RepVGGDW-style parallel-BN modules that must NOT be folded)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np
import pytest

from fce_yolo_tpu.nn import modules as M
from fce_yolo_tpu.nn.model import build_model, fold_conv_bn, init_variables


def _randomized(v, key=1):
    """Perturb batch_stats so the fold is non-trivial (fresh init has
    mean=0/var=1 which would fold to near-identity)."""
    ls, td = tu.tree_flatten(v["batch_stats"])
    ks = jax.random.split(jax.random.PRNGKey(key), len(ls))
    v = dict(v)
    v["batch_stats"] = tu.tree_unflatten(
        td, [l + jax.random.uniform(k, l.shape, minval=0.1, maxval=0.5)
             for l, k in zip(ls, ks)])
    return v


@pytest.mark.parametrize("cfg,scale,out_key", [
    ("yolo11.yaml", "n", "preds"),
    ("yolov8.yaml", "n", "preds"),
    ("yolov9t.yaml", None, "preds"),
    ("yolo12.yaml", "n", "preds"),
    ("yolo11-fce.yaml", "n", "preds"),
    # v10 compared at the dense one2one feature level: preds6 is a discrete
    # top-k whose tie order amplifies 1e-4 score noise into box swaps
    ("yolov10n.yaml", None, "one2one_feats"),
])
def test_fold_matches_eval_bn(cfg, scale, out_key):
    model, spec, strides = build_model(cfg, scale=scale)
    v = _randomized(init_variables(model, jax.random.PRNGKey(0), imgsz=64))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3))
    ref = model.apply(v, x, train=False)[out_key]
    fv = fold_conv_bn(v)
    with M.fused_bn_scope():
        got = model.apply(fv, x, train=False)[out_key]
    for a, b in zip(tu.tree_leaves(ref), tu.tree_leaves(got)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale_ref = max(1.0, float(np.max(np.abs(a))))
        assert float(np.max(np.abs(a - b))) < 2e-3 * scale_ref

    # every ConvBNAct bn is gone; no bn param leaves remain in these zoos
    assert not any("'bn'" in str(p) for p, _ in tu.tree_leaves_with_path(fv["params"]))


def test_fold_skips_parallel_bn_modules():
    """RepConv's standalone BN (normalizes the SUM of two branches) has a
    sibling set != {conv, bn} and must survive the fold untouched."""
    model = M.RepConv(c1=32, c2=32, use_bn=True)
    x = jnp.ones((1, 16, 16, 32))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    fv = fold_conv_bn({"params": v["params"], "batch_stats": v["batch_stats"]})
    # conv1/conv2 (ConvBNAct children) folded; the parallel 'bn' kept
    assert "bn" in fv["params"]
    assert "bn" not in fv["params"]["conv1"]
    assert "bias" in fv["params"]["conv1"]["conv"]
    with M.fused_bn_scope():
        got = model.apply(fv, x, train=False)
    ref = model.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_predictor_uses_fold(tiny_dataset, tmp_path):
    """The streaming predictor folds BN by default and produces the same
    detections as the unfolded path."""
    import os
    from pathlib import Path

    from fce_yolo_tpu.api import YOLO

    y = YOLO("yolo11n.yaml", nc=3)
    imgs = sorted((Path(tiny_dataset).parent / "images" / "train").glob("*.jpg"))[:2]
    r1 = y.predict([str(p) for p in imgs], imgsz=64, verbose=False)
    os.environ["FY_NO_FOLD_BN"] = "1"
    try:
        y2 = YOLO("yolo11n.yaml", nc=3)
        y2.variables = y.variables
        r2 = y2.predict([str(p) for p in imgs], imgsz=64, verbose=False)
    finally:
        del os.environ["FY_NO_FOLD_BN"]
    for a, b in zip(r1, r2):
        assert a.boxes.xyxy.shape == b.boxes.xyxy.shape
        if a.boxes.xyxy.size:
            np.testing.assert_allclose(a.boxes.xyxy, b.boxes.xyxy, atol=1e-2)

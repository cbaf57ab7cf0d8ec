"""Model construction tests: YAML parsing, compound scaling, param counts,
forward shapes — the analog of the reference's test_all_model_yamls +
module-construction tests (tests/test_python.py:237,528-547).

Param-count golden values come from building the reference torch models
(gradient counts; our DFL is parameter-free like the frozen reference conv).
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fce_yolo_tpu.nn.model import build_model, init_variables, param_count

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")

# (yaml, scale) -> reference trainable-param count
GOLDEN_PARAMS = {
    ("yolo11.yaml", "n"): 2_624_064,
    ("yolo11.yaml", "s"): 9_458_736,
    ("yolo11.yaml", "m"): 20_114_672,
    ("yolo11.yaml", "l"): 25_372_144,
    ("yolo11.yaml", "x"): 56_966_160,
    ("yolo11-fce.yaml", "n"): 2_568_265,
    ("yolo11-fce.yaml", "m"): 19_987_449,
    ("yolo11-bifpn.yaml", "n"): 2_534_793,
    ("yolo11-bifpn.yaml", "m"): 19_460_345,
}


@pytest.mark.parametrize(
    "name,scale",
    [("yolo11.yaml", "n"), ("yolo11-fce.yaml", "n"), ("yolo11-bifpn.yaml", "n")],
)
def test_param_counts_nano(name, scale):
    model, spec, strides = build_model(os.path.join(CFG_DIR, name), scale=scale)
    assert strides == (8, 16, 32)
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    assert param_count(v) == GOLDEN_PARAMS[(name, scale)]


@pytest.mark.slow
@pytest.mark.parametrize("name,scale", sorted(GOLDEN_PARAMS))
def test_param_counts_all(name, scale):
    model, spec, strides = build_model(os.path.join(CFG_DIR, name), scale=scale)
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    assert param_count(v) == GOLDEN_PARAMS[(name, scale)]


def test_all_yamls_parse():
    """Every shipped model YAML builds (reference test_all_model_yamls)."""
    yamls = glob.glob(os.path.join(CFG_DIR, "*.yaml"))
    assert yamls
    for y in yamls:
        # use each YAML's own scale set: force "n" when available, else the
        # YAML's default (reference test_all_model_yamls builds as-named)
        import yaml as _yaml

        with open(y) as f:
            scales = (_yaml.safe_load(f) or {}).get("scales") or {}
        scale = "n" if (not scales or "n" in scales) else next(iter(scales))
        model, spec, strides = build_model(y, scale=scale)
        assert spec.layers[-1].name in (
            "Detect", "Segment", "Pose", "OBB", "Classify", "RTDETRDecoder", "v10Detect",
            "WorldDetect", "YOLOEDetect", "YOLOESegment",
        )


def test_forward_shapes_train_eval():
    model, spec, strides = build_model(os.path.join(CFG_DIR, "yolo11.yaml"), scale="n")
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    x = jnp.zeros((2, 64, 64, 3))

    out, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
    feats = out["feats"]
    assert [f.shape for f in feats] == [(2, 8, 8, 144), (2, 4, 4, 144), (2, 2, 2, 144)]
    assert "batch_stats" in updates

    out = model.apply(v, x, train=False)
    n_anchors = 64 + 16 + 4
    assert out["preds"].shape == (2, n_anchors, 84)
    # decoded scores are sigmoid outputs
    scores = np.asarray(out["preds"][..., 4:])
    assert (scores >= 0).all() and (scores <= 1).all()


def test_detect_bias_prior():
    """Detect cls bias should start at log(5/nc/(640/s)^2) so initial
    objectness is tiny (reference head.py:169-188)."""
    import math

    model, spec, strides = build_model(os.path.join(CFG_DIR, "yolo11.yaml"), scale="n")
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    head = v["params"]["layers_23"]
    b = np.asarray(head["cv3_0_2"]["conv2d"]["bias"])
    np.testing.assert_allclose(b, math.log(5 / 80 / (640 / 8) ** 2), rtol=1e-6)
    b2 = np.asarray(head["cv2_0_2"]["conv2d"]["bias"])
    np.testing.assert_allclose(b2, 1.0)


def test_fce_adaptive_defaults():
    """FCE parse rules: explicit args beat adaptive defaults; adaptive rules
    follow tasks.py:1630-1708."""
    from fce_yolo_tpu.nn.parser import _adaptive_heads, _adaptive_reduction

    assert _adaptive_reduction(256) == 16
    assert _adaptive_reduction(64) == 8
    assert _adaptive_reduction(4096) == 32
    assert _adaptive_heads(256, 16) == 2  # base_dim 16 -> 1 head of >=8... check
    # base_dim = max(8, 256//16)=16; heads=min(8, 256//32)=8 -> 16//8=2 <8 -> reduce to 2
    assert _adaptive_heads(512, 8) == 8  # base_dim 64 -> 8 heads of 8

    # the fce yaml at n-scale: BiCoordCrossAtt explicit [512, 8, 4] ->
    # width-scaled oup = 128, reduction 8, heads 4
    model, spec, _ = build_model(os.path.join(CFG_DIR, "yolo11-fce.yaml"), scale="n")
    att = spec.layers[5]
    assert att.name == "BiCoordCrossAtt"
    assert att.args == [128, 128, 8, 4]


def test_fce_modules_forward():
    """Direct module construction + forward (reference test_nn_modules_block style)."""
    from fce_yolo_tpu.nn.fce import BiCoordCrossAtt, BiFPN_Concat, CoordAtt, CoordCrossAtt

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 10, 32))

    m = CoordAtt(inp=32, oup=32, reduction=8)
    v = m.init(rng, x)
    assert m.apply(v, x).shape == (2, 8, 10, 32)

    m = CoordCrossAtt(inp=32, oup=32, reduction=8, num_heads=2)
    v = m.init(rng, x)
    assert m.apply(v, x).shape == (2, 8, 10, 32)

    m = BiCoordCrossAtt(inp=32, oup=48, reduction=8, num_heads=2)
    v = m.init(rng, x)
    assert m.apply(v, x).shape == (2, 8, 10, 48)

    xs = [x, jax.random.normal(rng, (2, 8, 10, 16))]
    m = BiFPN_Concat(c1=(32, 16), c2=32)
    v = m.init(rng, xs)
    assert m.apply(v, xs).shape == (2, 8, 10, 32)
    # fusion weights start at ones
    np.testing.assert_allclose(np.asarray(v["params"]["w"]), 1.0)


def test_gate_bounds():
    """BiCoordCrossAtt additive gate stays in (0,1) and modulates identity."""
    from fce_yolo_tpu.nn.fce import BiCoordCrossAtt

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 6, 6, 16))
    m = BiCoordCrossAtt(inp=16, oup=16, reduction=2, num_heads=1)
    v = m.init(rng, x)
    y = np.asarray(m.apply(v, x))
    ratio = np.abs(y) / (np.abs(np.asarray(x)) + 1e-9)
    assert (ratio <= 1.0 + 1e-5).all()  # sigmoid gate never amplifies


def test_facade_load_fuse_device(tmp_path):
    """Model.load / .fuse / .device API parity (reference engine/model.py)."""
    import jax

    from fce_yolo_tpu.api import YOLO

    y = YOLO("yolo11n.yaml", nc=3)
    y._ensure_variables(64)
    p = y.save(str(tmp_path / "w"))
    y2 = YOLO("yolo11n.yaml", nc=3)
    y2.load(str(tmp_path / "w"))
    a = jax.tree_util.tree_leaves(y.variables["params"])[0]
    b = jax.tree_util.tree_leaves(y2.variables["params"])[0]
    assert (np.asarray(a) == np.asarray(b)).all()
    assert y2.device in ("cpu", "tpu", "axon")
    flat_before = {"/".join(k.key for k in p): np.asarray(v).copy()
                   for p, v in jax.tree_util.tree_flatten_with_path(
                       y2.variables["params"])[0]}
    y2.reset_weights(seed=7)
    flat_after = {"/".join(k.key for k in p): np.asarray(v)
                  for p, v in jax.tree_util.tree_flatten_with_path(
                      y2.variables["params"])[0]}
    assert set(flat_before) == set(flat_after)  # same parameter tree
    some_kernel = next(k for k in flat_before if k.endswith("kernel"))
    assert flat_before[some_kernel].shape == flat_after[some_kernel].shape
    assert (flat_before[some_kernel] != flat_after[some_kernel]).any()
    # fuse(): round 5 made it REAL Conv+BN weight folding (reference
    # Model.fuse) — bn params disappear, conv gains a bias; idempotent
    assert y2.fuse() is y2
    folded = {"/".join(k.key for k in p)
              for p, _ in jax.tree_util.tree_flatten_with_path(
                  y2.variables["params"])[0]}
    assert not any("/bn/" in k for k in folded)
    assert any(k.endswith("conv/bias") for k in folded)
    assert y2.fuse() is y2  # second call is a no-op
    import pytest as _pytest

    with _pytest.raises(ValueError):
        y2.load("weights.xyz")


def test_facade_embed():
    """Model.embed returns one pooled feature vector per image."""
    from fce_yolo_tpu.api import YOLO

    rng = np.random.RandomState(0)
    y = YOLO("yolo11n.yaml", nc=3)
    a = rng.randint(0, 255, (80, 96, 3), np.uint8)
    b = rng.randint(0, 255, (80, 96, 3), np.uint8)
    vecs = y.embed([a, b], imgsz=64)
    assert len(vecs) == 2 and vecs[0].ndim == 1 and len(vecs[0]) >= 64
    assert (vecs[0] != vecs[1]).any()  # different images -> different vecs

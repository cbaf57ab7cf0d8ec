"""Numerical parity vs the torch reference (gated on /root/reference).

Builds the reference DetectionModel in torch, imports its weights into our
flax model via nn/import_torch.py, and compares raw head features + decoded
predictions on random inputs. This is the strongest correctness evidence the
rebuild has: identical graphs => activations agree to float tolerance.
"""

import contextlib
import io
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.parity

if not os.path.isdir(os.path.join(REF, "ultralytics")):
    pytest.skip("reference repo unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_ultralytics():
    """Import the reference package with a torchvision-metadata shim."""
    import importlib.metadata as md

    orig = md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    md.version = fake_version
    sys.path.insert(0, REF)
    try:
        from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

        yield TorchDetectionModel
    finally:
        sys.path.remove(REF)


def _build_pair(ref_cls, yaml_rel, our_yaml, scale):
    import yaml as pyyaml

    import jax
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/11", yaml_rel)))
    d["scale"] = scale
    with contextlib.redirect_stdout(io.StringIO()):
        tm = ref_cls(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(our_yaml, scale=scale)
    # abstract init (eval_shape): template shapes without RNG/compute cost
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True
        )
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)
    return tm, model, variables


CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")


@pytest.mark.parametrize(
    "yaml_rel,our_name,scale",
    [
        ("yolo11.yaml", "yolo11.yaml", "n"),
        ("yolo11-fce.yaml", "yolo11-fce.yaml", "n"),
        ("yolo11-bifpn.yaml", "yolo11-bifpn.yaml", "n"),
    ],
)
def test_forward_parity(ref_ultralytics, yaml_rel, our_name, scale):
    tm, model, variables = _build_pair(
        ref_ultralytics, yaml_rel, os.path.join(CFG_DIR, our_name), scale
    )

    rng = np.random.RandomState(0)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)

    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_decoded, t_feats = ty  # eval mode: (decoded (B,no,N), feats list (B,no,H,W))

    out = model.apply(variables, x, train=False)

    # raw per-level head features
    for lvl, tf in enumerate(t_feats):
        ours = np.asarray(out["feats"][lvl]).transpose(0, 3, 1, 2)
        ref = tf.numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)

    # decoded predictions: ours (B, N, 4+nc) vs reference (B, 4+nc, N)
    ours_dec = np.asarray(out["preds"]).transpose(0, 2, 1)
    np.testing.assert_allclose(ours_dec, t_decoded.numpy(), rtol=1e-3, atol=5e-4)


def test_parity_batch_and_rect(ref_ultralytics):
    """Parity holds for batch > 1 and non-square inputs."""
    tm, model, variables = _build_pair(
        ref_ultralytics, "yolo11.yaml", os.path.join(CFG_DIR, "yolo11.yaml"), "n"
    )
    rng = np.random.RandomState(1)
    x = rng.rand(2, 96, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_decoded, _ = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out["preds"]).transpose(0, 2, 1), t_decoded.numpy(), rtol=1e-3, atol=5e-4
    )


@pytest.mark.parametrize(
    "yaml_name,task_cls,scale",
    [
        ("yolo11-seg.yaml", "SegmentationModel", "n"),
        ("yolo11-pose.yaml", "PoseModel", "n"),
        ("yolo11-cls.yaml", "ClassificationModel", "n"),
    ],
)
def test_task_head_import_parity(ref_ultralytics, yaml_name, task_cls, scale):
    """Import reference task-model weights (Segment/Pose/Classify heads) and
    compare eval outputs."""
    import contextlib
    import io as _io

    import yaml as pyyaml

    import jax
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model
    from ultralytics.nn import tasks as ref_tasks

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/11", yaml_name)))
    d["scale"] = scale
    with contextlib.redirect_stdout(_io.StringIO()):
        tm = getattr(ref_tasks, task_cls)(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(os.path.join(CFG_DIR, yaml_name), scale=scale)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(variables, x, train=False)

    if task_cls == "ClassificationModel":
        probs, logits = ty  # eval returns (softmax, logits)
        np.testing.assert_allclose(np.asarray(out["logits"]), logits.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["probs"]), probs.numpy(), rtol=1e-3, atol=1e-5)
    elif task_cls == "SegmentationModel":
        dec, (feats, mc, proto) = ty  # (B, 4+nc+nm, N), aux
        ours = np.asarray(out["preds"]).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, dec.numpy(), rtol=1e-3, atol=5e-4)
        ours_proto = np.asarray(out["proto"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours_proto, proto.numpy(), rtol=1e-3, atol=5e-4)
    else:  # Pose
        dec, (feats, kpt) = ty  # (B, 4+nc+nk, N)
        ours = np.asarray(out["preds"]).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, dec.numpy(), rtol=1e-3, atol=5e-4)


def test_nms_keepset_parity(ref_ultralytics):
    """Full-NMS golden parity: identical decoded predictions through our
    batched_nms and the reference non_max_suppression must keep the same
    boxes in the same order (mAP-parity requirement, SURVEY.md §7)."""
    from ultralytics.utils.nms import non_max_suppression

    import jax.numpy as jnp
    from fce_yolo_tpu.ops.nms import batched_nms

    rng = np.random.RandomState(0)
    b, n, nc = 2, 400, 6
    cx = rng.uniform(50, 600, (b, n)); cy = rng.uniform(50, 600, (b, n))
    w = rng.uniform(10, 120, (b, n)); h = rng.uniform(10, 120, (b, n))
    # peaky scores so the conf threshold bites realistically
    scores = (rng.rand(b, n, nc) ** 4).astype(np.float32)
    preds = np.concatenate([np.stack([cx, cy, w, h], -1), scores], -1).astype(np.float32)

    for multi_label in (False, True):
        ref = non_max_suppression(
            # reference wants (B, 4+nc, N) and MUTATES its input in place
            # (xywh2xyxy written back) — pass a copy, never the shared buffer
            torch.from_numpy(preds.transpose(0, 2, 1).copy()),
            conf_thres=0.25, iou_thres=0.45, max_det=50, multi_label=multi_label,
            max_time_img=60.0,  # its python-NMS fallback silently truncates at 0.05s
        )
        ours = batched_nms(
            jnp.asarray(preds), conf_thres=0.25, iou_thres=0.45, max_det=50,
            multi_label=multi_label, impl="scan",
        )
        for i in range(b):
            r = ref[i].numpy()  # (k, 6) xyxy conf cls
            valid = np.asarray(ours["valid"][i])
            o_boxes = np.asarray(ours["boxes"][i])[valid]
            o_scores = np.asarray(ours["scores"][i])[valid]
            o_cls = np.asarray(ours["classes"][i])[valid]
            assert len(r) == len(o_boxes), (multi_label, i, len(r), len(o_boxes))
            # reference sorts by conf desc too -> same order expected
            np.testing.assert_allclose(o_scores, r[:, 4], atol=1e-5)
            np.testing.assert_allclose(o_boxes, r[:, :4], atol=1e-2)
            np.testing.assert_array_equal(o_cls, r[:, 5].astype(int))


def _realistic_val_preds(b=2, n=8400, nc=80, seed=0):
    """Decoded predictions shaped like a trained model at val time: a sparse
    confident set (~2% of anchors) + a dense near-threshold noise floor, so
    conf=0.001 and multi-label expansion bite like production."""
    rng = np.random.RandomState(seed)
    cx = rng.uniform(20, 620, (b, n))
    cy = rng.uniform(20, 620, (b, n))
    w = rng.uniform(8, 150, (b, n))
    h = rng.uniform(8, 150, (b, n))
    # noise floor: most scores ~1e-4..5e-3
    scores = (rng.rand(b, n, nc) ** 2 * 5e-3).astype(np.float32)
    # confident subset: 150 anchors per image, 1-2 strong classes each
    for i in range(b):
        idx = rng.choice(n, 150, replace=False)
        scores[i, idx, rng.randint(0, nc, 150)] = rng.uniform(0.2, 0.95, 150)
        idx2 = rng.choice(idx, 60, replace=False)
        scores[i, idx2, rng.randint(0, nc, 60)] = rng.uniform(0.05, 0.4, 60)
    boxes = np.stack([cx, cy, w, h], -1)
    return np.concatenate([boxes, scores], -1).astype(np.float32)


def test_nms_keepset_parity_production_shape(ref_ultralytics):
    """VERDICT round-1 #4: the round-1 keep-set test ran at N=400 <
    pre_nms_topk, so the hierarchical candidate shortcut (ops/nms.py) was
    never exercised. This runs the real val regime — N=8400, nc=80,
    conf=0.001, iou=0.7, max_det=300, multi_label=True — and checks:

    (a) with a full candidate pool (pre_nms_topk >= N*...) the keep-set is
        EXACTLY the reference's (validates suppression logic at scale);
    (b) with the production pool (1024) the kept boxes agree on the
        high-confidence head, and any tail divergence is conf < 0.02 —
        negligible for mAP (quantified end-to-end in test_e2e_map_parity).
    """
    from ultralytics.utils.nms import non_max_suppression

    import jax.numpy as jnp
    from fce_yolo_tpu.ops.nms import batched_nms

    b, n, nc = 2, 8400, 80
    preds = _realistic_val_preds(b, n, nc)

    ref = non_max_suppression(
        torch.from_numpy(preds.transpose(0, 2, 1).copy()),
        conf_thres=0.001, iou_thres=0.7, max_det=300, multi_label=True,
        max_time_img=60.0,
    )

    def assert_rows_match(o_boxes, o_scores, r, tol=1e-4):
        """Order-insensitive keep-set equality: every reference row must have
        a matching ours row (score within tol, box within 1e-2). Score ties
        between distinct candidates may legally swap emit order between
        torch's stable sort and our top_k."""
        assert len(o_boxes) == len(r), (len(o_boxes), len(r))
        used = np.zeros(len(o_boxes), bool)
        for rb in r:
            cand = np.where(
                ~used
                & (np.abs(o_scores - rb[4]) < tol)
                & (np.abs(o_boxes - rb[:4]).max(1) < 1e-2)
            )[0]
            assert len(cand), f"no match for ref row {rb}"
            used[cand[0]] = True

    # (a) full pool: exact keep-set (order-insensitive on score ties)
    ours_full = batched_nms(
        jnp.asarray(preds), conf_thres=0.001, iou_thres=0.7, max_det=300,
        multi_label=True, pre_nms_topk=8192, impl="scan",
    )
    for i in range(b):
        r = ref[i].numpy()
        valid = np.asarray(ours_full["valid"][i])
        assert_rows_match(
            np.asarray(ours_full["boxes"][i])[valid],
            np.asarray(ours_full["scores"][i])[valid],
            r,
        )

    # (b) production pool: head must match exactly; tail divergence bounded
    ours_prod = batched_nms(
        jnp.asarray(preds), conf_thres=0.001, iou_thres=0.7, max_det=300,
        multi_label=True, pre_nms_topk=1024, impl="scan",
    )
    for i in range(b):
        r = ref[i].numpy()
        valid = np.asarray(ours_prod["valid"][i])
        o_scores = np.asarray(ours_prod["scores"][i])[valid]
        o_boxes = np.asarray(ours_prod["boxes"][i])[valid]
        # identical above conf 0.02
        r_head = r[r[:, 4] > 0.02]
        o_head_n = int((o_scores > 0.02).sum())
        assert o_head_n == len(r_head), (o_head_n, len(r_head))
        np.testing.assert_allclose(o_scores[:o_head_n], r_head[:, 4], atol=1e-5)
        np.testing.assert_allclose(o_boxes[:o_head_n], r_head[:, :4], atol=1e-2)


def test_yolov8_forward_parity(ref_ultralytics):
    """YOLOv8n (C2f backbone, legacy Detect head) weight-import parity."""
    import yaml as pyyaml

    import jax
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/v8/yolov8.yaml")))
    d["scale"] = "n"
    with contextlib.redirect_stdout(io.StringIO()):
        tm = ref_ultralytics(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(os.path.join(CFG_DIR, "yolov8.yaml"), scale="n")
    assert spec.legacy  # v8 uses the legacy cls branch
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        t_decoded, _ = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out["preds"]).transpose(0, 2, 1), t_decoded.numpy(), rtol=1e-3, atol=5e-4
    )


def test_yolov8_seg_import_parity(ref_ultralytics):
    """YOLOv8n-seg: legacy Detect threading through the Segment head."""
    import yaml as pyyaml

    import jax
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model
    from ultralytics.nn.tasks import SegmentationModel

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/v8/yolov8-seg.yaml")))
    d["scale"] = "n"
    with contextlib.redirect_stdout(io.StringIO()):
        tm = SegmentationModel(d, verbose=False)
    tm.eval().float()

    # our yolov8-seg = yolov8 backbone/neck + Segment head
    ours_d = pyyaml.safe_load(open(os.path.join(CFG_DIR, "yolov8.yaml")))
    ours_d["head"][-1] = [[15, 18, 21], 1, "Segment", ["nc", 32, 256]]
    model, spec, strides = build_model(ours_d, scale="n")
    assert spec.legacy
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        dec, (feats, mc, proto) = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out["preds"]).transpose(0, 2, 1), dec.numpy(), rtol=1e-3, atol=5e-4
    )


@pytest.mark.parametrize(
    "rel,scale",
    [
        ("v9/yolov9t.yaml", None),
        ("12/yolo12.yaml", "n"),
        ("v8/yolov8-ghost.yaml", "n"),
        ("v5/yolov5.yaml", "n"),
        ("v3/yolov3-tiny.yaml", None),
    ],
)
def test_new_family_forward_parity(ref_ultralytics, rel, scale):
    """Weight-import activation parity for the v9/v12/ghost/v5/v3 module zoos."""
    import yaml as pyyaml

    import jax
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    path = os.path.join(REF, "ultralytics/cfg/models", rel)
    d = pyyaml.safe_load(open(path))
    if scale:
        d["scale"] = scale
    with contextlib.redirect_stdout(io.StringIO()):
        tm = ref_ultralytics(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(path, scale=scale)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True
        )
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(7)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        t_decoded, t_feats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(variables, x, train=False)
    for lvl, tf in enumerate(t_feats):
        ours = np.asarray(out["feats"][lvl]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, tf.numpy(), rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(out["preds"]).transpose(0, 2, 1), t_decoded.numpy(), rtol=1e-3, atol=5e-4
    )


def test_yolov10_forward_parity(ref_ultralytics):
    """v10Detect end2end head: one2one feats + NMS-free top-k output parity."""
    import yaml as pyyaml

    import jax
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    path = os.path.join(REF, "ultralytics/cfg/models/v10/yolov10n.yaml")
    d = pyyaml.safe_load(open(path))
    d["scale"] = "n"
    with contextlib.redirect_stdout(io.StringIO()):
        tm = ref_ultralytics(d, verbose=False)
    tm.eval().float()
    # random-init scores tie at the shared cls-bias value, making top-k order
    # undefined across frameworks — jitter the biases so ranking is unique
    with torch.no_grad():
        g = torch.Generator().manual_seed(3)
        for branch in tm.model[-1].one2one_cv3:
            branch[-1].bias += torch.randn(branch[-1].bias.shape, generator=g) * 0.05

    model, spec, strides = build_model(path, scale="n")
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True
        )
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(11)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        t_out, t_raw = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(variables, x, train=False)

    # raw one2many + one2one per-level maps match exactly
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(out["feats"][lvl]).transpose(0, 3, 1, 2),
            t_raw["one2many"][lvl].numpy(), rtol=1e-3, atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["one2one_feats"][lvl]).transpose(0, 3, 1, 2),
            t_raw["one2one"][lvl].numpy(), rtol=1e-3, atol=3e-4,
        )

    # NMS-free top-300: identical (box, score, cls) MULTISET. Random-init
    # scores tie in droves (constant cls logits across anchors of a level),
    # so row order is undefined — canonicalize both sides by a full
    # lexicographic sort before comparing.
    ours6 = np.asarray(out["preds6"][0])
    ref6 = t_out[0].numpy()

    def canon(a):
        return a[np.lexsort(a.T[::-1])]

    np.testing.assert_allclose(
        np.sort(ours6[:, 4])[::-1], np.sort(ref6[:, 4])[::-1], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(canon(ours6), canon(ref6), rtol=1e-2, atol=5e-3)


@pytest.mark.parametrize("rel", ["v8/yolov8-world.yaml", "v8/yolov8-worldv2.yaml"])
def test_world_forward_parity(ref_ultralytics, rel):
    """YOLO-World: C2fAttn guidance + ImagePoolingAttn text enhancement +
    WorldDetect contrastive scores match torch bit-for-bit on shared weights
    and the SAME (random) text embeddings — the blocks need no CLIP."""
    import yaml as pyyaml

    import jax
    import jax.numpy as jnp
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model
    from ultralytics.nn.tasks import WorldModel

    path = os.path.join(REF, "ultralytics/cfg/models", rel)
    d = pyyaml.safe_load(open(path))
    d["scale"] = "n"
    torch.manual_seed(2)
    with contextlib.redirect_stdout(io.StringIO()):
        tm = WorldModel(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(path, scale="n")
    txt_np = np.random.RandomState(9).randn(1, spec.nc, 512).astype(np.float32)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True,
            txt_feats=jnp.zeros((1, spec.nc, 512), jnp.float32),
        )
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(4)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        t_decoded, t_feats = tm.predict(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), txt_feats=torch.from_numpy(txt_np)
        )
    out = model.apply(variables, x, train=False, txt_feats=jnp.asarray(txt_np))
    for lvl, tf in enumerate(t_feats):
        np.testing.assert_allclose(
            np.asarray(out["feats"][lvl]).transpose(0, 3, 1, 2), tf.numpy(),
            rtol=1e-3, atol=3e-4,
        )
    np.testing.assert_allclose(
        np.asarray(out["preds"]).transpose(0, 2, 1), t_decoded.numpy(), rtol=1e-3, atol=5e-4
    )


@pytest.mark.parametrize("rel,seg", [("11/yoloe-11.yaml", False), ("11/yoloe-11-seg.yaml", True)])
def test_yoloe_forward_parity(ref_ultralytics, rel, seg):
    """YOLOE prompt heads: reprta text adapter + contrastive scores (and the
    seg variant's proto/coef branches) match torch on shared weights + raw
    text embeddings. Visual-prompt SAVPE parity is covered separately."""
    import yaml as pyyaml

    import jax
    import jax.numpy as jnp
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model
    from ultralytics.nn.tasks import YOLOEModel

    path = os.path.join(REF, "ultralytics/cfg/models", rel)
    d = pyyaml.safe_load(open(path))
    d["scale"] = "n"
    torch.manual_seed(6)
    with contextlib.redirect_stdout(io.StringIO()):
        tm = YOLOEModel(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(path, scale="n")
    txt_np = np.random.RandomState(12).randn(1, spec.nc, 512).astype(np.float32)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True,
            txt_feats=jnp.zeros((1, spec.nc, 512), jnp.float32),
        )
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(8)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tm.predict(torch.from_numpy(x.transpose(0, 3, 1, 2)), tpe=torch.from_numpy(txt_np))
    out = model.apply(variables, x, train=False, txt_feats=jnp.asarray(txt_np))

    if seg:
        dec, (feats, mc, proto) = t_out
        np.testing.assert_allclose(
            np.asarray(out["proto"]).transpose(0, 3, 1, 2), proto.numpy(), rtol=1e-3, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["preds"]).transpose(0, 2, 1), dec.numpy(), rtol=1e-3, atol=7e-4
        )
    else:
        dec, feats = t_out
        for lvl, tf in enumerate(feats):
            np.testing.assert_allclose(
                np.asarray(out["feats"][lvl]).transpose(0, 3, 1, 2), tf.numpy(),
                rtol=1e-3, atol=3e-4,
            )
        np.testing.assert_allclose(
            np.asarray(out["preds"]).transpose(0, 2, 1), dec.numpy(), rtol=1e-3, atol=5e-4
        )


def test_yoloe_savpe_visual_prompt_parity(ref_ultralytics):
    """SAVPE visual-prompt embeddings match torch get_vpe on shared weights."""
    import yaml as pyyaml

    import jax
    import jax.numpy as jnp
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model
    from ultralytics.nn.tasks import YOLOEModel

    path = os.path.join(REF, "ultralytics/cfg/models/11/yoloe-11.yaml")
    d = pyyaml.safe_load(open(path))
    d["scale"] = "n"
    torch.manual_seed(6)
    with contextlib.redirect_stdout(io.StringIO()):
        tm = YOLOEModel(d, verbose=False)
    tm.eval().float()

    model, spec, strides = build_model(path, scale="n")
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True,
            txt_feats=jnp.zeros((1, spec.nc, 512), jnp.float32),
        )
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)

    rng = np.random.RandomState(3)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    # two visual prompts as binary masks on the P3 (stride-8) grid
    vp = np.zeros((1, 2, 20, 20), np.float32)
    vp[0, 0, 2:8, 3:9] = 1.0
    vp[0, 1, 10:18, 10:16] = 1.0

    with torch.no_grad():
        t_vpe = tm.predict(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), vpe=torch.from_numpy(vp),
            return_vpe=True,
        )
    out = model.apply(
        variables, x, train=False,
        txt_feats=jnp.zeros((1, spec.nc, 512), jnp.float32),
    )
    # drive SAVPE via the head with visual prompts and compare the resulting
    # contrastive scores? simpler: run the full model with visual prompts and
    # the torch model with cls_pe = its own vpe — both heads then score
    # against identical embeddings, so compare the vpe tensors directly.
    # our executor path doesn't expose vpe; recompute via the head module.
    from fce_yolo_tpu.nn.yoloe import SAVPE

    head_ls = spec.layers[-1]
    ch = tuple(head_ls.args[-1])
    c3 = max(ch[0], min(spec.nc, 100))
    sav = SAVPE(ch, c3, 512)
    sav_params = {
        "params": variables["params"][f"layers_{head_ls.i}"]["savpe"],
        "batch_stats": variables["batch_stats"][f"layers_{head_ls.i}"]["savpe"],
    }
    # P3/P4/P5 features: re-run the backbone up to the head inputs
    inter = {}
    feats_idx = head_ls.f
    # reuse torch intermediate features for exactness of SAVPE input
    acts = {}
    def hook(i):
        def fn(m, inp, out):
            acts[i] = out
        return fn
    hs = [tm.model[i].register_forward_hook(hook(i)) for i in feats_idx]
    with torch.no_grad():
        tm.predict(torch.from_numpy(x.transpose(0, 3, 1, 2)), tpe=torch.from_numpy(
            np.zeros((1, spec.nc, 512), np.float32)))
    for h in hs:
        h.remove()
    xs = [jnp.asarray(acts[i].numpy().transpose(0, 2, 3, 1)) for i in feats_idx]
    ours_vpe = sav.apply(sav_params, xs, jnp.asarray(vp), False)
    np.testing.assert_allclose(np.asarray(ours_vpe), t_vpe.numpy(), rtol=1e-3, atol=1e-4)

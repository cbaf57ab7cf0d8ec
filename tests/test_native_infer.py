"""Native-runtime export + C++ consumer parity.

Closes the reference's export->native-inference loop
(examples/YOLOv8-ONNXRuntime-CPP/inference.cpp:1-377): export_native writes
the traced eval graph, native/infer/fy_infer.cpp executes it with letterbox +
NMS + scale-back, and these tests assert the C++ boxes match the Python
predictor's on the same inputs.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")

ROOT = os.path.join(os.path.dirname(__file__), "..")
SRC = os.path.join(ROOT, "native", "infer", "fy_infer.cpp")


@pytest.fixture(scope="session")
def fy_infer_bin(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    out = str(tmp_path_factory.mktemp("fyinfer") / "fy_infer")
    subprocess.run(["g++", "-O2", "-std=c++17", "-o", out, SRC], check=True)
    return out


def _export(cfg: str, tmp, imgsz: int = 160, jitter_bias: bool = True):
    import jax.numpy as jnp

    from fce_yolo_tpu.engine.export_native import export_native
    from fce_yolo_tpu.nn.model import build_model, init_variables

    model, spec, strides = build_model(cfg, scale="n")
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    if jitter_bias:
        # random-init cls scores are bias-dominated and tie across anchors;
        # jitter the final cls conv biases so NMS ranking is well-defined
        rng = np.random.RandomState(5)
        head = v["params"][f"layers_{spec.layers[-1].i}"]
        for k in head:
            if k.startswith("cv3_") and k.endswith("_2"):
                b = head[k]["conv2d"]["bias"]
                head[k]["conv2d"]["bias"] = b + jnp.asarray(
                    rng.randn(*b.shape).astype(np.float32)
                )
    ir = export_native(model, v, str(tmp / "model"), imgsz=imgsz)
    return model, v, ir


@pytest.mark.parametrize("cfg", ["yolo11.yaml", "yolo11-fce.yaml"])
def test_raw_graph_parity(fy_infer_bin, tmp_path, cfg):
    """C++ interpreter reproduces the XLA eval forward on random input."""
    import jax.numpy as jnp

    model, v, ir = _export(
        os.path.join(ROOT, "fce_yolo_tpu", "cfg", "models", cfg), tmp_path
    )
    x = np.random.RandomState(0).rand(1, 160, 160, 3).astype(np.float32)
    ref = np.asarray(model.apply(v, jnp.asarray(x), train=False)["preds"])
    x.tofile(tmp_path / "in.f32")
    subprocess.run(
        [fy_infer_bin, str(ir), str(ir.with_suffix(".fybin")), "--raw",
         str(tmp_path / "in.f32"), str(tmp_path / "out.f32")],
        check=True, capture_output=True,
    )
    out = np.fromfile(tmp_path / "out.f32", np.float32).reshape(ref.shape)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_cpp_boxes_match_python_predictor(fy_infer_bin, tmp_path):
    """Full pipeline: PPM -> letterbox -> graph -> NMS -> scale-back in C++
    equals the Python predictor's boxes on the same image."""
    import cv2

    from fce_yolo_tpu.engine.predictor import DetectionPredictor

    model, v, ir = _export(
        os.path.join(ROOT, "fce_yolo_tpu", "cfg", "models", "yolo11.yaml"), tmp_path
    )

    # structured image at exactly the export size (letterbox = identity)
    rng = np.random.RandomState(1)
    img = np.full((160, 160, 3), 70, np.uint8)
    for _ in range(4):
        x1, y1 = rng.randint(0, 100, 2)
        cv2.rectangle(img, (x1, y1), (x1 + rng.randint(20, 55), y1 + rng.randint(20, 55)),
                      tuple(int(c) for c in rng.randint(0, 255, 3)), -1)

    conf, iou = 0.001, 0.7
    pred = DetectionPredictor(
        model, {i: str(i) for i in range(80)}, imgsz=160, conf=conf, iou=iou
    )
    results = pred(v, img)
    r = results[0]
    py = np.concatenate(
        [np.asarray(r.boxes.xyxy), np.asarray(r.boxes.conf)[:, None],
         np.asarray(r.boxes.cls)[:, None]], axis=1,
    )

    ppm = tmp_path / "img.ppm"
    rgb = img[..., ::-1]  # predictor consumes BGR; PPM stores RGB
    with open(ppm, "wb") as f:
        f.write(b"P6\n160 160\n255\n")
        f.write(np.ascontiguousarray(rgb).tobytes())
    # fy_infer consumes the PPM as-is (RGB), matching the predictor's
    # BGR->RGB preprocessing
    out = subprocess.run(
        [fy_infer_bin, str(ir), str(ir.with_suffix(".fybin")), str(ppm),
         str(conf), str(iou)],
        check=True, capture_output=True, text=True,
    )
    rows = [list(map(float, line.split())) for line in out.stdout.splitlines()]
    cpp = np.array(rows, np.float32) if rows else np.zeros((0, 6), np.float32)

    assert len(cpp) == len(py), f"C++ kept {len(cpp)} boxes, Python {len(py)}"
    if len(py):
        order_py = np.lexsort(py.T[::-1])
        order_cpp = np.lexsort(cpp.T[::-1])
        np.testing.assert_allclose(cpp[order_cpp], py[order_py], rtol=1e-2, atol=0.5)


# ---------------------------------------------------------------------------
# multi-task artifacts: segment / pose / classify (reference analog: the Rust
# deploy example runs detect/seg/pose/cls — examples/YOLOv8-ONNXRuntime-Rust)
# ---------------------------------------------------------------------------


def _jitter_biases(tree, rng, scale=1.0):
    """Make random-init head outputs well-separated across anchors: jitter
    every bias (+1-sigma randn) and amplify every kernel (x8). Without the
    kernel gain, single-class heads (pose nc=1) produce anchor scores within
    ~1e-5 of each other — inside cross-implementation fp noise — and the NMS
    keep-set becomes genuinely ambiguous between two correct runtimes."""
    import jax.numpy as jnp

    for k, v in tree.items():
        if isinstance(v, dict):
            _jitter_biases(v, rng, scale)
        elif k == "bias":
            tree[k] = v + jnp.asarray(scale * rng.randn(*v.shape).astype(np.float32))
        elif k == "kernel":
            tree[k] = v * 8.0


def _match_dets(cpp, py, atol=1.0):
    """Associate C++ and Python detections by (class, box) proximity.

    Greedy-NMS tie-breaks at fp tolerance can flip ONE borderline keep between
    the two implementations; association (instead of exact count equality)
    keeps the parity assertion meaningful and stable. Returns index pairs."""
    # Both lists are in NMS keep order (score-descending), so align them with
    # a two-pointer merge: advance past the (at most one) extra keep on either
    # side. Clipped boxes can coincide across anchors, so position + score
    # (C++ prints %.5f -> 1e-5 quantum) + class + box must all agree.
    pairs = []
    i = j = 0
    while i < len(cpp) and j < len(py):
        same = (
            abs(cpp[i, 4] - py[j, 4]) <= 2e-5
            and int(cpp[i, 5]) == int(py[j, 5])
            and np.abs(cpp[i, :4] - py[j, :4]).max() <= atol
        )
        if same:
            pairs.append((i, j))
            i += 1
            j += 1
        elif cpp[i, 4] > py[j, 4]:
            i += 1  # C++ kept a detection Python's NMS suppressed
        else:
            j += 1
    return pairs


def _export_task(cfg_name: str, tmp, imgsz: int = 160):
    import jax.numpy as jnp  # noqa: F401  (jax required)

    from fce_yolo_tpu.engine.export_native import export_native
    from fce_yolo_tpu.nn.model import build_model, init_variables

    cfg = os.path.join(ROOT, "fce_yolo_tpu", "cfg", "models", cfg_name)
    model, spec, strides = build_model(cfg, scale="n")
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    head = v["params"][f"layers_{spec.layers[-1].i}"]
    _jitter_biases(head, np.random.RandomState(5))
    ir = export_native(model, v, str(tmp / "model"), imgsz=imgsz)
    return model, spec, v, ir


def _write_ppm(path, rgb: np.ndarray):
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(rgb).tobytes())


def _boxes_image(h, w, seed=1):
    import cv2

    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 70, np.uint8)
    for _ in range(4):
        x1, y1 = rng.randint(0, w - 60), rng.randint(0, h - 60)
        cv2.rectangle(img, (x1, y1), (x1 + rng.randint(20, 55), y1 + rng.randint(20, 55)),
                      tuple(int(c) for c in rng.randint(0, 255, 3)), -1)
    return img


def test_cpp_segment_masks_match_python(fy_infer_bin, tmp_path):
    """Segment artifact: C++ boxes AND per-detection masks (at original
    resolution, non-square letterboxed input) match the Python predictor."""
    from fce_yolo_tpu.engine.predictor import DetectionPredictor

    model, spec, v, ir = _export_task("yolo11-seg.yaml", tmp_path)
    img = _boxes_image(120, 160)  # non-square: exercises pad strip in masks

    conf, iou = 0.001, 0.7
    pred = DetectionPredictor(model, {i: str(i) for i in range(spec.nc)},
                              imgsz=160, conf=conf, iou=iou, task="segment")
    r = pred(v, img)[0]
    py_boxes = np.concatenate(
        [np.asarray(r.boxes.xyxy), np.asarray(r.boxes.conf)[:, None],
         np.asarray(r.boxes.cls)[:, None]], axis=1)
    py_masks = np.asarray(r.masks.data)

    ppm = tmp_path / "img.ppm"
    _write_ppm(ppm, img[..., ::-1])
    out = subprocess.run(
        [fy_infer_bin, str(ir), str(ir.with_suffix(".fybin")), str(ppm),
         str(conf), str(iou), "300", str(tmp_path / "mask")],
        check=True, capture_output=True, text=True)
    rows = [list(map(float, line.split())) for line in out.stdout.splitlines()]
    assert rows and len(py_boxes), (len(rows), len(py_boxes))
    assert abs(len(rows) - len(py_boxes)) <= 1, (len(rows), len(py_boxes))
    cpp = np.array(rows, np.float32)  # x1 y1 x2 y2 score cls area

    pairs = _match_dets(cpp, py_boxes)
    assert len(pairs) >= max(len(rows) - 1, 1)
    bad = []
    for i_cpp, i_py in pairs:
        np.testing.assert_allclose(cpp[i_cpp, :6], py_boxes[i_py],
                                   rtol=1e-2, atol=0.5)
        pgm = (tmp_path / f"mask_{i_cpp:03d}.pgm").read_bytes()
        hdr_end = pgm.index(b"255\n") + 4
        m_cpp = np.frombuffer(pgm[hdr_end:], np.uint8).reshape(120, 160) > 0
        m_py = py_masks[i_py]
        union = (m_cpp | m_py).sum()
        iou_m = (m_cpp & m_py).sum() / max(union, 1)
        if union and iou_m <= 0.97:
            bad.append((i_cpp, float(iou_m)))
        assert int(cpp[i_cpp, 6]) == int(m_cpp.sum())
    # near-tied anchors (identical clipped box + score within the print
    # quantum) can resolve to different anchors across the two NMS
    # implementations — tolerate ONE such flip; a real mask bug breaks all
    assert len(bad) <= 1, f"mask IoU failures: {bad}"
    assert len(pairs) - len(bad) >= 1


def test_cpp_pose_keypoints_match_python(fy_infer_bin, tmp_path):
    """Pose artifact: C++ keypoints (decoded + scaled back) match Python."""
    from fce_yolo_tpu.engine.predictor import DetectionPredictor

    model, spec, v, ir = _export_task("yolo11-pose.yaml", tmp_path)
    img = _boxes_image(120, 160, seed=2)

    conf, iou = 0.001, 0.7
    pred = DetectionPredictor(model, {i: str(i) for i in range(spec.nc)},
                              imgsz=160, conf=conf, iou=iou, task="pose")
    r = pred(v, img)[0]
    py_boxes = np.concatenate(
        [np.asarray(r.boxes.xyxy), np.asarray(r.boxes.conf)[:, None],
         np.asarray(r.boxes.cls)[:, None]], axis=1)
    py_kpts = np.asarray(r.keypoints.data)  # (N, 17, 3)

    ppm = tmp_path / "img.ppm"
    _write_ppm(ppm, img[..., ::-1])
    out = subprocess.run(
        [fy_infer_bin, str(ir), str(ir.with_suffix(".fybin")), str(ppm),
         str(conf), str(iou)],
        check=True, capture_output=True, text=True)
    rows = [list(map(float, line.split())) for line in out.stdout.splitlines()]
    assert rows and len(py_boxes)
    assert abs(len(rows) - len(py_boxes)) <= 1
    cpp = np.array(rows, np.float32)
    assert cpp.shape[1] == 6 + 17 * 3

    pairs = _match_dets(cpp, py_boxes)
    assert len(pairs) >= max(len(rows) - 1, 1)
    bad = []
    for i_cpp, i_py in pairs:
        np.testing.assert_allclose(cpp[i_cpp, :6], py_boxes[i_py],
                                   rtol=1e-2, atol=0.5)
        kc = cpp[i_cpp, 6:].reshape(17, 3)
        kp = py_kpts[i_py]
        if np.abs(kc[:, :2] - kp[:, :2]).max() > 0.5 or \
                np.abs(kc[:, 2] - kp[:, 2]).max() > 1e-3:
            bad.append(i_cpp)
    # near-tied anchors (identical clipped box + score within the print
    # quantum) can resolve to different anchors across the two NMS
    # implementations — tolerate ONE such flip; a real kpt bug breaks all
    assert len(bad) <= 1, f"kpt mismatches at rows {bad}"
    assert len(pairs) - len(bad) >= 1


def test_cpp_classify_topk_matches_python(fy_infer_bin, tmp_path):
    """Classify artifact: C++ val-transform (shorter-side resize + center
    crop, BGR order) + forward reproduces the Python probs top-5."""
    from fce_yolo_tpu.data.classify import val_transform

    model, spec, v, ir = _export_task("yolo11-cls.yaml", tmp_path, imgsz=160)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (200, 160, 3), np.uint8)  # non-square resize+crop

    import jax.numpy as jnp
    x = val_transform(img, 160)
    probs = np.asarray(
        model.apply(v, jnp.asarray(x[None].astype(np.float32) / 255.0),
                    train=False)["probs"])[0]
    top = np.argsort(-probs)[:5]

    ppm = tmp_path / "img.ppm"
    _write_ppm(ppm, img[..., ::-1])  # img is BGR-convention; PPM wants RGB
    out = subprocess.run(
        [fy_infer_bin, str(ir), str(ir.with_suffix(".fybin")), str(ppm)],
        check=True, capture_output=True, text=True)
    rows = [line.split() for line in out.stdout.splitlines()]
    assert len(rows) == 5
    cpp_idx = [int(r[0]) for r in rows]
    cpp_p = np.array([float(r[1]) for r in rows])
    assert cpp_idx[0] == int(top[0])
    np.testing.assert_allclose(cpp_p, probs[cpp_idx], atol=2e-3)

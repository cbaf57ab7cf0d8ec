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

"""Export formats: StableHLO text, TF SavedModel, TFLite — artifact produced
and (where a runtime exists) output parity with the JAX model."""

import json
from pathlib import Path

import numpy as np
import pytest

from fce_yolo_tpu.api import YOLO
from fce_yolo_tpu.engine.exporter import export_model


@pytest.fixture(scope="module")
def small_model():
    m = YOLO("yolo11n.yaml", nc=2)
    m._ensure_variables(64)
    return m


def test_export_stablehlo(small_model, tmp_path):
    path = export_model(small_model, fmt="stablehlo", imgsz=64, out_dir=str(tmp_path))
    text = Path(path).read_text()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text
    meta = json.loads(Path(path).with_suffix(".json").read_text())
    assert meta["imgsz"] == 64 and meta["layout"] == "NHWC"


@pytest.mark.slow
def test_export_tflite_runs(small_model, tmp_path):
    tf = pytest.importorskip("tensorflow")

    path = export_model(small_model, fmt="tflite", imgsz=64, out_dir=str(tmp_path))
    assert Path(path).stat().st_size > 100_000

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    tfl_preds = interp.get_tensor(out["index"])

    import jax

    ours = np.asarray(
        jax.jit(lambda v, x: small_model.model.apply(v, x, train=False)["preds"])(
            small_model.variables, x
        )
    )
    assert tfl_preds.shape == ours.shape
    np.testing.assert_allclose(tfl_preds, ours, rtol=1e-2, atol=1e-3)


def test_facade_export_method(tmp_path):
    """model.export(...) facade delegates to export_model (reference
    Model.export)."""
    from fce_yolo_tpu.api import YOLO

    y = YOLO("yolo11n.yaml", nc=3)
    path = y.export(format="stablehlo", imgsz=64, out_dir=str(tmp_path))
    assert path.endswith(".stablehlo")
    m = YOLO(path)
    assert m.backend is not None

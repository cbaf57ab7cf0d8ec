"""AutoBackend: exported artifacts load back through `YOLO(path)` and route
predict/val uniformly (VERDICT r2 next-step #3; reference nn/autobackend.py:71
+ utils/benchmarks.py:54).
"""

import numpy as np
import pytest

from fce_yolo_tpu.api import YOLO


@pytest.fixture(scope="module")
def trained_tiny(tmp_path_factory):
    """A tiny detect model + one structured image, exported once per module."""
    rng = np.random.RandomState(0)
    img = np.full((96, 128, 3), 60, np.uint8)
    img[20:60, 30:90] = (255, 80, 80)
    y = YOLO("yolo11n.yaml", nc=3)
    y._ensure_variables(64)
    return y, img


def _boxes(results):
    return results[0].boxes.data


class TestAutoBackend:
    def test_stablehlo_roundtrip(self, trained_tiny, tmp_path):
        from fce_yolo_tpu.engine.exporter import export_model

        y, img = trained_tiny
        path = export_model(y, fmt="stablehlo", imgsz=64, out_dir=str(tmp_path))
        m = YOLO(path)
        assert m.backend is not None and m.backend.fmt == "stablehlo"
        ref = y.predict(img, imgsz=64, conf=0.001)
        out = m.predict(img, conf=0.001)
        np.testing.assert_allclose(_boxes(out), _boxes(ref), rtol=1e-4, atol=1e-3)

    def _raw_preds_match(self, y, fmt, tmp_path, atol):
        """Export -> AutoBackend raw preds vs the native forward on the SAME
        input (junk NMS orderings of an untrained net are not comparable
        across FP paths; raw tensors are)."""
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.engine.exporter import export_model

        path = export_model(y, fmt=fmt, imgsz=64, out_dir=str(tmp_path))
        m = YOLO(path)
        assert m.backend.fmt == fmt
        x = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
        got = m.backend(x)
        v = y._ensure_variables(64)
        ref = jax.jit(
            lambda v, t: y.model.apply(v, t / 255.0, train=False)["preds"]
        )(v, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol)
        # and the predict plumbing end-to-end produces Results
        img = np.random.RandomState(1).randint(0, 255, (96, 128, 3), np.uint8)
        out = m.predict(img, conf=0.25)
        assert len(out) == 1 and out[0].boxes is not None

    @pytest.mark.slow
    def test_tflite_roundtrip(self, trained_tiny, tmp_path):
        y, _ = trained_tiny
        self._raw_preds_match(y, "tflite", tmp_path, atol=2e-2)

    @pytest.mark.slow
    def test_saved_model_roundtrip(self, trained_tiny, tmp_path):
        y, _ = trained_tiny
        self._raw_preds_match(y, "saved_model", tmp_path, atol=2e-2)

    @pytest.mark.slow
    def test_backend_val_matches_native(self, trained_tiny, tiny_dataset, tmp_path):
        from fce_yolo_tpu.engine.exporter import export_model

        y0 = YOLO("yolo11n.yaml", nc=3)
        res = y0.train(data=tiny_dataset, epochs=2, batch=4, imgsz=64, workers=0,
                       val=False, verbose=False, project=str(tmp_path), name="t")
        best = res["save_dir"] + "/weights/last"
        y = YOLO(best)
        native = y.val(data=tiny_dataset, imgsz=64, batch=4, verbose=False)
        path = export_model(y, fmt="tflite", imgsz=64, out_dir=str(tmp_path))
        m = YOLO(path)
        backend = m.val(data=tiny_dataset, imgsz=64, batch=4, verbose=False)
        assert abs(backend["metrics/mAP50-95(B)"] - native["metrics/mAP50-95(B)"]) <= 0.01

    @pytest.mark.slow
    def test_benchmark_matrix(self, trained_tiny, tmp_path):
        from fce_yolo_tpu.utils.benchmarks import benchmark

        y, _ = trained_tiny
        rows = benchmark(y, imgsz=64, batch=4, verbose=False, export_dir=str(tmp_path))
        fmts = {r["format"]: r["status"] for r in rows}
        assert "jax (native)" in fmts
        assert {"stablehlo", "saved_model", "tflite"} <= set(fmts)
        ok = [f for f, s in fmts.items() if s == "OK"]
        assert len(ok) >= 3, fmts

    @pytest.mark.slow
    def test_tflite_int8_roundtrip(self, trained_tiny, tmp_path):
        """int8 PTQ artifact loads and runs through AutoBackend; raw preds
        stay broadly faithful to fp32 (quantization-loose tolerance)."""
        from fce_yolo_tpu.engine.exporter import export_model

        import jax
        import jax.numpy as jnp

        y, img = trained_tiny
        path = export_model(y, fmt="tflite", imgsz=64, int8=True,
                            out_dir=str(tmp_path / "int8"))
        m = YOLO(path)
        assert m.backend.fmt == "tflite"
        x = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
        got = np.asarray(m.backend(x), np.float32)
        v = y._ensure_variables(64)
        ref = np.asarray(jax.jit(
            lambda v, t: y.model.apply(v, t / 255.0, train=False)["preds"]
        )(v, jnp.asarray(x)))
        assert got.shape == ref.shape and np.isfinite(got).all()
        # int8 errors are large in absolute units of the raw head outputs;
        # demand strong correlation, not closeness
        corr = np.corrcoef(got.reshape(-1), ref.reshape(-1))[0, 1]
        assert corr > 0.95, f"int8 preds decorrelated from fp32 (r={corr:.3f})"
        out = m.predict(img, conf=0.25)
        assert len(out) == 1 and out[0].boxes is not None


class TestProfileModels:
    """ProfileModels analog (reference utils/benchmarks.py:370)."""

    def test_sigma_clipping_removes_outliers(self):
        from fce_yolo_tpu.utils.benchmarks import ProfileModels

        data = np.array([10.0, 10.1, 9.9, 10.05, 9.95, 100.0])
        out = ProfileModels.iterative_sigma_clipping(data, sigma=2.0, max_iters=3)
        assert 100.0 not in out and len(out) == 5

    def test_profile_native_yaml(self, capsys):
        from fce_yolo_tpu.utils.benchmarks import ProfileModels

        rows = ProfileModels(
            ["yolo11n.yaml"], num_timed_runs=2, num_warmup_runs=1, min_time=0.0,
            imgsz=64, half=False,
        ).run()
        assert len(rows) == 1
        r = rows[0]
        assert r["runtime"] == "jax (native)" and r["ms/img"] > 0
        assert r["params(M)"] > 1.0 and r["FLOPs(B)"] > 0
        assert "Speed (ms/im)" in capsys.readouterr().out

    @pytest.mark.slow
    def test_profile_exported_artifact(self, trained_tiny, tmp_path):
        from fce_yolo_tpu.engine.exporter import export_model
        from fce_yolo_tpu.utils.benchmarks import ProfileModels

        y, _ = trained_tiny
        path = export_model(y, fmt="stablehlo", imgsz=64, out_dir=str(tmp_path))
        rows = ProfileModels(
            [path], num_timed_runs=2, num_warmup_runs=1, min_time=0.0, imgsz=64,
        ).run()
        assert rows[0]["runtime"] == "stablehlo" and rows[0]["ms/img"] > 0
        assert rows[0]["params(M)"] > 1.0  # params recovered from export metadata

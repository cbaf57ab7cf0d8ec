"""Model export: StableHLO / TF SavedModel / TFLite.

Analog of the reference Exporter (engine/exporter.py:253) re-targeted to
the formats that matter from JAX: the reference's 19-format matrix is
CUDA/mobile-centric (TensorRT, CoreML, NCNN...); the TPU-native export
story is (a) StableHLO bytecode — the portable XLA interchange that any
XLA/PJRT runtime (and IREE) can consume, (b) TF SavedModel via jax2tf for
TF-Serving, and (c) TFLite for edge. NMS can be baked into the graph
(reference NMSModel analog, exporter.py:1482) so consumers get boxes out.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import numpy as np

__all__ = ["export_model", "try_export"]


def try_export(fn):
    """Decorator: time the export, catch + report failure (exporter.py:230)."""

    def wrapper(*args, **kwargs):
        name = fn.__name__.replace("_export_", "")
        t0 = time.time()
        try:
            out = fn(*args, **kwargs)
            print(f"export {name}: done in {time.time() - t0:.1f}s -> {out}")
            return out
        except Exception as e:
            print(f"export {name}: FAILED after {time.time() - t0:.1f}s: {e}")
            raise

    return wrapper


def _predict_fn(model, variables, nms: bool, conf: float, iou: float, max_det: int):
    """Build the jittable inference graph images(u8 or f32) -> preds/boxes."""
    import jax.numpy as jnp

    from fce_yolo_tpu.ops import batched_nms

    def fn(img):
        x = img.astype(jnp.float32)
        x = jnp.where(x.max() > 2.0, x / 255.0, x)  # accept u8-range or normalized
        preds = model.apply(variables, x, train=False)["preds"]
        if not nms:
            return preds
        out = batched_nms(preds, conf_thres=conf, iou_thres=iou, max_det=max_det)
        return {k: out[k] for k in ("boxes", "scores", "classes", "valid")}

    return fn


def export_model(
    yolo,
    fmt: str = "tflite",
    imgsz: int = 640,
    batch: int = 1,
    nms: bool = False,
    int8: bool = False,
    conf: float = 0.25,
    iou: float = 0.7,
    max_det: int = 300,
    out_dir: str | None = None,
) -> str:
    """Export a YOLO facade model. Returns the artifact path.

    Formats: "stablehlo" | "saved_model" | "tflite".
    """
    variables = yolo._ensure_variables(imgsz)
    fn = _predict_fn(yolo.model, variables, nms, conf, iou, max_det)
    shape = (batch, imgsz, imgsz, 3)
    stem = Path(yolo.cfg_yaml).stem + (f"{yolo.scale}" if yolo.scale else "")
    out = Path(out_dir or ".") / f"{stem}_{imgsz}"

    from fce_yolo_tpu.nn.model import param_count

    meta = {
        "model": stem, "imgsz": imgsz, "batch": batch, "nc": yolo.nc,
        "names": yolo.names, "strides": list(yolo.strides), "nms": nms,
        "layout": "NHWC", "input": "uint8-or-float [0,255]/[0,1]",
        "params": param_count(variables),
    }
    if fmt == "stablehlo":
        return _export_stablehlo(fn, shape, out, meta)
    if fmt == "saved_model":
        return _export_saved_model(fn, shape, out, meta, tflite=False)
    if fmt == "tflite":
        return _export_tflite(fn, shape, out, meta, int8=int8)
    if fmt == "native":
        # .fyir/.fybin artifact for the zero-dependency C++ runtime
        # (native/infer/fy_infer.cpp)
        from fce_yolo_tpu.engine.export_native import export_native

        return str(export_native(yolo.model, variables, out, imgsz=imgsz))
    raise ValueError(
        f"unknown export format {fmt!r} (stablehlo|saved_model|tflite|native)"
    )


@try_export
def _export_stablehlo(fn, shape, out: Path, meta: dict) -> str:
    import jax
    import jax.numpy as jnp

    lowered = jax.jit(fn).lower(jnp.zeros(shape, jnp.float32))
    out = out.with_suffix(".stablehlo")
    out.parent.mkdir(parents=True, exist_ok=True)
    mlir = lowered.compiler_ir(dialect="stablehlo")
    out.write_text(str(mlir))
    out.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return str(out)


def _tf_module(fn, shape):
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    module = tf.Module()
    module.f = tf.function(
        tf_fn, autograph=False, input_signature=[tf.TensorSpec(shape, tf.float32, name="images")]
    )
    return module


@try_export
def _export_saved_model(fn, shape, out: Path, meta: dict, tflite: bool) -> str:
    import tensorflow as tf

    module = _tf_module(fn, shape)
    path = str(out) + "_saved_model"
    tf.saved_model.save(module, path)
    Path(path, "metadata.json").write_text(json.dumps(meta, indent=2))
    return path


@try_export
def _export_tflite(fn, shape, out: Path, meta: dict, int8: bool) -> str:
    import tensorflow as tf

    module = _tf_module(fn, shape)
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [module.f.get_concrete_function()], module
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if int8:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]

        def rep_data():
            rng = np.random.RandomState(0)
            for _ in range(16):
                yield [rng.rand(*shape).astype(np.float32)]

        converter.representative_dataset = rep_data
    blob = converter.convert()
    path = out.with_suffix(".tflite")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return str(path)

"""Inference benchmarking (reference utils/benchmarks.py:54 `benchmark`).

Times the full device pipeline (normalize -> forward -> decode -> NMS) at a
given batch size, and optionally vals a dataset for the mAP column. Prints
the reference-style table and returns rows as dicts.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

__all__ = ["benchmark", "profile_inference"]


def profile_inference(
    yolo, imgsz: int = 640, batch: int = 16, iters: int = 20, warmup: int = 3, bf16: bool = True
) -> dict[str, float]:
    """Measure e2e images/sec on the current default device."""
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.ops import batched_nms

    variables = yolo._ensure_variables(imgsz)
    if bf16:
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables["params"])
        variables = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        in_dtype = jnp.bfloat16
    else:
        in_dtype = jnp.float32
    model = yolo.model

    @jax.jit
    def predict(v, img_u8):
        x = img_u8.astype(in_dtype) / 255.0
        preds = model.apply(v, x, train=False)["preds"]
        out = batched_nms(preds, conf_thres=0.25, iou_thres=0.7, max_det=300)
        # scalar checksum: forces full computation even where block_until_ready
        # is a no-op (remote-tunnel plugins); see bench.py measurement notes
        return out["boxes"].sum() + out["scores"].sum()

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    rt = (time.perf_counter() - t0) / 10

    rng = np.random.RandomState(0)
    imgs = [
        jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    for i in range(warmup):
        _ = float(predict(variables, imgs[i % 4]))
    t0 = time.perf_counter()
    outs = [predict(variables, imgs[i % 4]) for i in range(iters)]
    _ = float(sum(outs))
    dt = max(time.perf_counter() - t0 - rt, 1e-9) / iters
    return {
        "images_per_sec": batch / dt,
        "ms_per_image": dt / batch * 1000,
        "ms_per_batch": dt * 1000,
        "batch": batch,
        "imgsz": imgsz,
    }


EXPORT_FORMATS = ("stablehlo", "saved_model", "tflite")


def _bench_backend(backend, imgsz: int, iters: int = 8, warmup: int = 2) -> float:
    """ms/img through an AutoBackend runtime."""
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (backend.batch, imgsz, imgsz, 3)).astype(np.float32)
    for _ in range(warmup):
        backend(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        backend(x)
    return (time.perf_counter() - t0) / iters / backend.batch * 1000


def benchmark(
    yolo,
    data: str | None = None,
    imgsz: int = 640,
    batch: int = 16,
    formats: tuple[str, ...] | None = None,
    export_dir: str | None = None,
    verbose: bool = True,
) -> list[dict[str, Any]]:
    """Export every format, then time + (optionally) val each through its own
    runtime (reference utils/benchmarks.py:54: `benchmark()` = export matrix
    x AutoBackend val). The native JAX row is always first. A format that
    fails to export or run gets a FAILED row, like the reference's
    pandas-table contract.
    """
    import tempfile

    from fce_yolo_tpu.api import YOLO

    rows = []
    prof = profile_inference(yolo, imgsz=imgsz, batch=batch)
    row = {
        "format": "jax (native)",
        "status": "OK",
        "imgsz": imgsz,
        "batch": batch,
        "ms/img": round(prof["ms_per_image"], 2),
        "images/sec": round(prof["images_per_sec"], 1),
        "mAP50-95": None,
    }
    if data:
        res = yolo.val(data=data, imgsz=imgsz, batch=batch, verbose=False)
        row["mAP50-95"] = round(res["metrics/mAP50-95(B)"], 4)
    rows.append(row)

    tmp = tempfile.mkdtemp(prefix="fy_bench_") if export_dir is None else export_dir
    for fmt in formats if formats is not None else EXPORT_FORMATS:
        row = {"format": fmt, "status": "OK", "imgsz": imgsz, "batch": 1,
               "ms/img": None, "images/sec": None, "mAP50-95": None}
        try:
            from fce_yolo_tpu.engine.exporter import export_model

            path = export_model(yolo, fmt=fmt, imgsz=imgsz, out_dir=tmp)
            m = YOLO(path)  # routes through AutoBackend
            ms = _bench_backend(m.backend, imgsz)
            row["ms/img"] = round(ms, 2)
            row["images/sec"] = round(1000.0 / ms, 1)
            if data:
                res = m.val(data=data, imgsz=imgsz, batch=batch, verbose=False)
                row["mAP50-95"] = round(res["metrics/mAP50-95(B)"], 4)
        except Exception as e:  # keep the matrix going (reference try_export)
            row["status"] = f"FAILED: {type(e).__name__}: {e}"[:60]
        rows.append(row)

    if verbose:
        keys = list(rows[0].keys())
        print(" | ".join(f"{k:>12}" for k in keys))
        for r in rows:
            print(" | ".join(f"{str(v):>12}" for v in r.values()))
    return rows

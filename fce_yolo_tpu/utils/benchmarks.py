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


def benchmark(
    yolo,
    data: str | None = None,
    imgsz: int = 640,
    batch: int = 16,
    verbose: bool = True,
) -> list[dict[str, Any]]:
    """Benchmark the native JAX path (and report mAP if ``data`` given)."""
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
    if verbose:
        keys = list(rows[0].keys())
        print(" | ".join(f"{k:>12}" for k in keys))
        for r in rows:
            print(" | ".join(f"{str(v):>12}" for v in r.values()))
    return rows

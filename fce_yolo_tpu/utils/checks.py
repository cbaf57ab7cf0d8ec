"""Validation helpers (reference utils/checks.py analogs that apply on TPU).

check_imgsz: stride-multiple rounding; check_version: semantic version gate;
check_numeric_stability: the check_amp analog — a bf16-vs-f32 forward probe
verifying mixed precision is numerically sane on this device.
"""

from __future__ import annotations

import re

__all__ = ["check_imgsz", "check_version", "check_numeric_stability", "cuda_is_available"]


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, floor: int = 0):
    """Round image size(s) up to the nearest stride multiple
    (reference checks.py check_imgsz semantics)."""
    vals = [imgsz] if isinstance(imgsz, int) else list(imgsz)
    out = [max(int(-(-v // stride) * stride), max(floor, stride)) for v in vals]
    if out != vals:
        print(f"imgsz {vals} not a multiple of stride {stride}; using {out}")
    if isinstance(imgsz, int):
        return out[0]
    if min_dim == 2 and len(out) == 1:
        out = out * 2
    return out


def check_version(current: str, required: str = "") -> bool:
    """Version constraint check: '>=1.2.3', '==...', '<...', bare = '>='."""
    if not required:
        return True

    def parse(v: str):
        return tuple(int(x) for x in re.findall(r"\d+", v)[:3])

    m = re.match(r"([<>=!]*)\s*([\d.]+)", required)
    op, ver = (m.group(1) or ">="), m.group(2)
    c, r = parse(current), parse(ver)
    return {
        ">=": c >= r, ">": c > r, "<=": c <= r, "<": c < r, "==": c == r, "!=": c != r,
    }[op]


def check_numeric_stability(model=None, variables=None, imgsz: int = 64, atol: float = 0.5) -> bool:
    """bf16 sanity probe (reference check_amp's NaN forward analog):
    run one forward in f32 and bf16 and require finite, close outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if model is None:
        from fce_yolo_tpu.nn.model import build_model

        model, _, _ = build_model("fce_yolo_tpu/cfg/models/yolo11.yaml", scale="n")
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, imgsz, imgsz, 3), jnp.float32)
    f32 = model.apply(variables, x, train=False)["preds"]
    bparams = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), variables["params"])
    bf = model.apply(
        {"params": bparams, "batch_stats": variables.get("batch_stats", {})},
        x.astype(jnp.bfloat16), train=False,
    )["preds"]
    ok = bool(jnp.isfinite(bf).all()) and float(jnp.abs(f32 - bf.astype(jnp.float32)).mean()) < atol
    return ok


def cuda_is_available() -> bool:
    """Always False here — the accelerator is a TPU (API-parity shim)."""
    return False

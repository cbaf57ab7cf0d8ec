"""Validation helpers (reference utils/checks.py analogs that apply on TPU).

check_imgsz: stride-multiple rounding; check_version: semantic version gate;
check_numeric_stability: the check_amp analog — a bf16-vs-f32 forward probe
verifying mixed precision is numerically sane on this device.
"""

from __future__ import annotations

import re

__all__ = ["check_imgsz", "check_version", "check_numeric_stability", "cuda_is_available",
           "collect_system_info"]


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


def collect_system_info(device_timeout: float = 10.0) -> dict:
    """Print + return environment/system info (reference
    checks.py collect_system_info, backing the `yolo checks` CLI command).

    Accelerator discovery runs in a daemon thread with a timeout: under the
    TPU tunnel, jax.devices() can hang indefinitely when the tunnel is down,
    and a diagnostics command must never hang.
    """
    import platform
    import sys
    import threading

    import fce_yolo_tpu

    from fce_yolo_tpu.utils.sysinfo import CPUInfo, GitRepo

    info: dict = {
        "version": fce_yolo_tpu.__version__,
        "python": platform.python_version(),
        "platform": platform.platform(),
        "cpu": CPUInfo.name(),
        "executable": sys.executable,
    }
    repo = GitRepo()
    if repo.is_repo:
        info["git"] = f"{repo.branch or 'detached'} @ {(repo.commit or '?')[:12]}"
    for pkg in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            mod = __import__(pkg)
            # "orbax.checkpoint" imports as the top-level "orbax" namespace
            for sub in pkg.split(".")[1:]:
                mod = getattr(mod, sub)
            info[pkg] = getattr(mod, "__version__", "installed")
        except ImportError:
            info[pkg] = "not installed"

    devices: list[str] = []

    def probe():
        import jax

        devices.extend(str(d) for d in jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(device_timeout)
    info["devices"] = devices if devices else f"unavailable (no response in {device_timeout:.0f}s)"

    width = max(len(k) for k in info)
    for k, v in info.items():
        print(f"{k:<{width}}  {v}")
    return info

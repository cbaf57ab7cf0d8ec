"""Logging + profiling utilities.

Reference analogs: global LOGGER (utils/__init__.py:464), Profile timer
(utils/ops.py:18-70), SystemLogger hardware telemetry (utils/logger.py:266),
and the jax.profiler bridge replacing torch's CUDA-sync timing (SURVEY.md §5:
"TPU equivalent: jax.profiler traces + XLA cost analysis; same 3-stage speed
dict contract").
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

__all__ = ["LOGGER", "Profile", "SystemLogger", "trace_profile"]


def _make_logger(name: str = "fce_yolo_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(h)
        level = os.environ.get("FCE_YOLO_VERBOSE", "1") == "1"
        logger.setLevel(logging.INFO if level else logging.WARNING)
        logger.propagate = False
    return logger


LOGGER = _make_logger()


class Profile:
    """Accumulating wall-clock timer context (reference utils/ops.py:18-70).

    For device work, wrap code that ends in a host sync (device_get / a float()
    on a result) — plain block_until_ready is a no-op on some remote plugins.

        with Profile() as t:
            out = jax.device_get(fn(x))
        print(t.t)  # accumulated seconds
    """

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self._start
        self.t += self.dt

    def __str__(self):
        return f"{self.t:.6f}s"


@contextmanager
def trace_profile(log_dir: str = "runs/profile"):
    """jax.profiler trace context: view with tensorboard/xprof.

    The TPU-native replacement for the reference's per-layer thop profiling
    (nn/tasks.py:198-222) — the XLA trace shows fused-op timings directly.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class SystemLogger:
    """Host + device utilization snapshots (reference utils/logger.py:266-430,
    minus NVML: TPU memory comes from jax's memory_stats)."""

    def snapshot(self) -> dict:
        out: dict = {"time": time.time()}
        try:
            la1, la5, la15 = os.getloadavg()
            out["cpu_load_1m"] = round(la1, 2)
        except OSError:
            pass
        try:
            import shutil

            du = shutil.disk_usage("/")
            out["disk_used_frac"] = round(du.used / du.total, 3)
        except Exception:
            pass
        try:
            with open("/proc/meminfo") as f:
                info = dict(line.split(":", 1) for line in f if ":" in line)
            total = float(info["MemTotal"].split()[0])
            avail = float(info["MemAvailable"].split()[0])
            out["ram_used_frac"] = round(1 - avail / total, 3)
        except Exception:
            pass
        try:
            import jax

            d = jax.devices()[0]
            ms = d.memory_stats() if hasattr(d, "memory_stats") else None
            if ms:
                out["device_mem_used"] = ms.get("bytes_in_use")
                out["device_mem_limit"] = ms.get("bytes_limit")
        except Exception:
            pass
        return out


def colorstr(*input) -> str:
    """ANSI-colored string: colorstr('blue', 'bold', 'hello') (reference
    utils/__init__.py colorstr). With one argument, defaults to blue+bold."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]

"""Utilities: metrics, callbacks, logging, profiling.

Convenience re-exports mirror the reference's `from ultralytics.utils
import LOGGER, SETTINGS` surface; heavier submodules import lazily.
"""

from typing import Any

__all__ = ["LOGGER", "SETTINGS", "Profile", "TQDM", "colors", "colorstr"]

_LAZY = {
    "LOGGER": ("fce_yolo_tpu.utils.logger", "LOGGER"),
    "TQDM": ("fce_yolo_tpu.utils.tqdm", "TQDM"),
    "Profile": ("fce_yolo_tpu.utils.logger", "Profile"),
    "SETTINGS": ("fce_yolo_tpu.utils.settings", "SETTINGS"),
    "colors": ("fce_yolo_tpu.utils.annotator", "colors"),
    "colorstr": ("fce_yolo_tpu.utils.logger", "colorstr"),
}


def __getattr__(name: str) -> Any:
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

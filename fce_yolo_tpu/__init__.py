"""FCE-YOLO-TPU: a TPU-native JAX re-implementation of the FCE-YOLOv11 framework.

A from-scratch rebuild of the capabilities of ShioMisaka/fce-yolo
(an Ultralytics-YOLO11 fork adding FCE attention modules and WIoU loss)
designed for TPU: NHWC layouts, static shapes, XLA-friendly control flow,
`jax.sharding.Mesh` data/spatial parallelism, and Pallas kernels on the
hot paths.

Public API mirrors the reference's `from ultralytics import YOLO` facade
(reference: engine/model.py) with a functional JAX core underneath.
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "RTDETR", "SAM", "SAM2", "SAM3", "FastSAM", "NAS",
           "YOLOE", "YOLOWorld", "SETTINGS", "__version__"]

# the reference's `from ultralytics import YOLO, RTDETR, SAM, FastSAM, NAS,
# YOLOWorld, settings` surface (ultralytics/__init__.py)
_LAZY = {
    "YOLO": ("fce_yolo_tpu.api", "YOLO"),
    "RTDETR": ("fce_yolo_tpu.models.rtdetr", "RTDETR"),
    "SAM": ("fce_yolo_tpu.models.sam", "SAM"),
    "SAM2": ("fce_yolo_tpu.models.sam2", "SAM2"),
    "SAM3": ("fce_yolo_tpu.models.sam3", "SAM3"),
    "FastSAM": ("fce_yolo_tpu.models.fastsam", "FastSAM"),
    "NAS": ("fce_yolo_tpu.models.nas", "NAS"),
    "YOLOE": ("fce_yolo_tpu.models.yoloe", "YOLOE"),
    "YOLOWorld": ("fce_yolo_tpu.models.world", "YOLOWorld"),
    "SETTINGS": ("fce_yolo_tpu.utils.settings", "SETTINGS"),
}


def __getattr__(name):
    # Lazy import keeps `import fce_yolo_tpu.ops.boxes`-style imports cheap
    # and avoids pulling jax/flax at package-import time for pure-numpy users.
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

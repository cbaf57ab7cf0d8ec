"""YOLO-NAS facade (reference models/nas/model.py:1-80).

The reference NAS class is a thin wrapper that can ONLY load pretrained
super-gradients checkpoints ("yolo_nas_s.pt" etc., downloaded at runtime) —
it cannot train and has no YAML architecture. This environment has no
egress, so those checkpoints cannot exist here; the class keeps the API
surface (predict/val via the shared engine) and accepts any in-framework
checkpoint whose graph was imported from a converted NAS state dict.
"""

from __future__ import annotations

from pathlib import Path

from fce_yolo_tpu.api import YOLO

__all__ = ["NAS"]


class NAS(YOLO):
    """YOLO-NAS wrapper: pretrained-checkpoint-only (reference parity)."""

    def __init__(self, model: str = "yolo_nas_s.pt", **kw):
        p = Path(model)
        if not p.exists():
            raise FileNotFoundError(
                f"YOLO-NAS requires a local pretrained checkpoint ({model!r} "
                "not found). The reference downloads super-gradients weights "
                "at runtime (models/nas/model.py), which is impossible in "
                "this zero-egress environment — supply a converted "
                "checkpoint instead."
            )
        assert p.suffix not in (".yaml", ".yml"), \
            "YOLO-NAS models only support pre-trained checkpoints (reference nas/model.py:61)"
        super().__init__(model, **kw)

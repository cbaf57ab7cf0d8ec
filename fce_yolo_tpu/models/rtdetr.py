"""RT-DETR facade (reference models/rtdetr/model.py): the transformer
detector as a named entry point. Dispatch (DETR loss, NMS-free decoder
postprocess) lives in the shared facade via task="rtdetr"."""

from __future__ import annotations

from fce_yolo_tpu.api import YOLO

__all__ = ["RTDETR"]


class RTDETR(YOLO):
    """Real-Time DEtection TRansformer (rtdetr-l.yaml by default)."""

    def __init__(self, model: str = "rtdetr-l.yaml", **kw):
        super().__init__(model, **kw)
        assert self.task == "rtdetr", f"not an RT-DETR config: {model}"

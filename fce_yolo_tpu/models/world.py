"""YOLO-World facade (reference WorldModel, nn/tasks.py:824-950 +
models/yolo/model.py YOLOWorld): open-vocabulary detection with text-defined
classes. Text embeddings come from the offline hash encoder
(nn/text_model.py) — stable but NOT semantic; plug a real CLIP encoder by
overriding :meth:`get_text_pe`."""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.api import YOLO

__all__ = ["YOLOWorld"]


class YOLOWorld(YOLO):
    """Open-vocab detect facade over the WorldDetect graph."""

    def __init__(self, model: str = "yolov8-world.yaml",
                 text_model: str = "hash:512", **kw):
        super().__init__(model, **kw)
        assert self.spec.needs_text, f"not a world config: {model}"
        # "clip:<local-ckpt>" switches to the real CLIP tower (text_model.py)
        self.text_model = text_model
        # reference placeholder: random text features until set_classes
        self.txt_feats = np.random.RandomState(0).randn(1, self.spec.nc, 512).astype(np.float32)

    def get_text_pe(self, text: list[str]) -> np.ndarray:
        from fce_yolo_tpu.nn.text_model import build_text_model

        enc = build_text_model(self.text_model)
        return enc.encode_text(enc.tokenize(text))[None]

    def set_classes(self, text: list[str]) -> None:
        """Bind class names -> embeddings for offline inference
        (reference WorldModel.set_classes, tasks.py:861-870)."""
        self.txt_feats = np.asarray(self.get_text_pe(text), np.float32)
        self.names = dict(enumerate(text))

    def predict(self, source, **kw):
        import jax.numpy as jnp

        outer = self.model
        txt = jnp.asarray(self.txt_feats)

        class _TextBound:
            """Adapter: injects txt_feats into every apply (the predictor is
            text-agnostic)."""

            def apply(self, variables, x, train=False, **akw):
                t = jnp.broadcast_to(txt, (x.shape[0],) + txt.shape[1:])
                return outer.apply(variables, x, train=train, txt_feats=t, **akw)

        # materialize variables with the REAL model before shimming
        self._ensure_variables(kw.get("imgsz", 640))
        real = self.model
        try:
            self.model = _TextBound()
            return super().predict(source, **kw)
        finally:
            self.model = real


class _TextBoundModel:
    """Module adapter binding txt_feats for text-agnostic engine code
    (trainer/predictor/validator jit the wrapped apply at trace time)."""

    def __init__(self, model, txt):
        self._model = model
        self._txt = txt

    def __getattr__(self, k):
        return getattr(self._model, k)

    def apply(self, variables, x, train=False, txt_feats=None, **kw):
        import jax.numpy as jnp

        # explicit per-batch texts (multimodal train step) override the bound
        # class embeddings; engine code that passes none gets the binding
        t = txt_feats if txt_feats is not None else jnp.broadcast_to(
            self._txt, (x.shape[0],) + self._txt.shape[1:]
        )
        return self._model.apply(variables, x, train=train, txt_feats=t, **kw)


def _bind_text(fn):
    """Run a facade method with the model swapped for its text-bound shim."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *a, **kw):
        import jax.numpy as jnp

        self._ensure_variables(kw.get("imgsz", 640))
        real = self.model
        try:
            self.model = _TextBoundModel(real, jnp.asarray(self.txt_feats))
            return fn(self, *a, **kw)
        finally:
            self.model = real

    return wrapper


class YOLOWorldTrainable(YOLOWorld):
    """YOLOWorld whose train/val also run with the bound class embeddings
    (reference WorldTrainer: standard v8 detection loss over text-scored
    logits, models/yolo/world/train.py)."""

    def train(self, *a, **kw):
        # follow the dataset class names like the reference WorldTrainer —
        # a stale set_classes binding with a different nc would shift the
        # head's class-slot slicing (see YOLOE.train)
        data = kw.get("data") or (a[0] if a else None)
        if data is not None:
            from fce_yolo_tpu.data.dataset import check_det_dataset

            d = check_det_dataset(data)
            names = d.get("names") or {i: f"class_{i}" for i in range(d["nc"])}
            names = {int(k): str(v) for k, v in (
                names.items() if isinstance(names, dict) else enumerate(names)
            )}
            if len(names) != len(getattr(self, "names", None) or {}):
                self.set_classes([v for _, v in sorted(names.items())])
        return self._train_text_bound(*a, **kw)

    @_bind_text
    def _train_text_bound(self, *a, **kw):
        return YOLO.train(self, *a, **kw)

    @_bind_text
    def val(self, *a, **kw):
        return YOLO.val(self, *a, **kw)

    def train_multimodal(self, data, max_samples: int | None = None, **kw):
        """Open-vocabulary training with per-batch sampled texts (reference
        WorldTrainerFromScratch over YOLOMultiModalDataset,
        models/yolo/world/train_world.py): every batch carries its own
        positive+negative text embeddings as one static (B, M, D) tensor;
        class logits score against those M slots. Per-epoch val uses the
        bound full class list via the text shim."""
        from fce_yolo_tpu.data.dataset import check_det_dataset

        d = check_det_dataset(data)
        names = d.get("names") or {i: f"class_{i}" for i in range(d["nc"])}
        names = {int(k): str(v) for k, v in (
            names.items() if isinstance(names, dict) else enumerate(names)
        )}
        # bind the full class list (first synonym each) for init + val —
        # must happen BEFORE _bind_text captures self.txt_feats
        self.set_classes([v.split("/")[0] for _, v in sorted(names.items())])
        m = min(len(names), 80) if max_samples is None else max_samples
        return self._train_multimodal_bound(data, names, m, **kw)

    @_bind_text
    def _train_multimodal_bound(self, data, names, m, **kw):
        from fce_yolo_tpu.data.multimodal import YOLOMultiModalDataset

        return YOLO.train(
            self, data=data,
            dataset_cls=YOLOMultiModalDataset,
            dataset_kw={"names": names, "max_samples": m},
            **kw,
        )

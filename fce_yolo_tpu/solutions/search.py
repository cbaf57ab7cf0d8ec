"""Visual similarity search + batch inference app analogs
(reference solutions/{similarity_search,streamlit_inference}.py).

The reference's VisualAISearch embeds images with CLIP and answers text
queries. Two backends live here:
- default: an offline HSV color-signature embedding answering IMAGE queries
  (query-by-example) — no weights needed;
- ``clip_weights=`` (or ``backend="clip"``): the in-repo CLIP pair
  (nn/clip_vision.py image tower + nn/text_model.py text tower) — the
  reference's actual mechanism; TEXT queries work and are semantic when a
  local CLIP checkpoint is supplied (random-init otherwise).
The API shape (index directory -> search(query, k)) matches the reference.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["VisualAISearch", "Inference"]


class VisualAISearch:
    """Query-by-example image search over a directory.

    Reference similarity_search.py:VisualAISearch with the CLIP text encoder
    swapped for an offline HSV-histogram embedding (no egress for weights).
    """

    def __init__(self, data: str = "images", k: int = 5,
                 backend: str = "hsv", clip_weights: str | None = None,
                 encoders: tuple | None = None):
        import cv2

        self.data = Path(data)
        self.k = k
        self._clip = encoders  # (text_encoder, image_encoder) injection
        if self._clip is None and (clip_weights or backend == "clip"):
            from fce_yolo_tpu.nn.clip_vision import CLIPImageEncoder
            from fce_yolo_tpu.nn.text_model import CLIPTextEncoder

            self._clip = (CLIPTextEncoder(weights=clip_weights),
                          CLIPImageEncoder(weights=clip_weights))
        self.paths: list[Path] = sorted(
            p for p in self.data.rglob("*") if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp")
        )
        feats = []
        for p in self.paths:
            img = cv2.imread(str(p))
            feats.append(self._embed(img) if self._clip is None
                         else self._clip[1].encode_image([img])[0])
        self.feats = np.stack(feats, 0) if feats else np.zeros((0, 512), np.float32)

    @staticmethod
    def _embed(img: np.ndarray) -> np.ndarray:
        import cv2

        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        # 8x8x8 joint histogram on a 2x2 spatial grid -> 2048-d, L2-normalized
        h, w = hsv.shape[:2]
        cells = []
        for iy in range(2):
            for ix in range(2):
                cell = hsv[iy * h // 2 : (iy + 1) * h // 2, ix * w // 2 : (ix + 1) * w // 2]
                hist = cv2.calcHist([cell], [0, 1, 2], None, [8, 8, 8], [0, 180, 0, 256, 0, 256])
                cells.append(hist.reshape(-1))
        v = np.concatenate(cells).astype(np.float32)
        return v / (np.linalg.norm(v) + 1e-9)

    def search(self, query: str | np.ndarray, k: int | None = None) -> list[tuple[str, float]]:
        """Top-k (path, similarity) matches. Query: an image (path/array),
        or — with the clip backend — free text (reference text queries)."""
        import cv2

        if isinstance(query, (str, Path)) and not Path(str(query)).exists():
            assert self._clip is not None, \
                "text queries need the clip backend (clip_weights=/backend='clip')"
            q = self._clip[0].encode_text([str(query)])[0]
        elif self._clip is not None:
            img = cv2.imread(str(query)) if isinstance(query, (str, Path)) else np.asarray(query)
            q = self._clip[1].encode_image([img])[0]
        else:
            if isinstance(query, (str, Path)):
                query = cv2.imread(str(query))
            q = self._embed(np.asarray(query))
        sims = self.feats @ q
        order = np.argsort(-sims)[: (k or self.k)]
        return [(str(self.paths[i]), float(sims[i])) for i in order]

    __call__ = search


class Inference:
    """Batch inference app: run a model over a source and write annotated
    frames (reference streamlit_inference.py re-scoped headless — no
    streamlit/webcam in this environment; same model/conf/iou surface)."""

    def __init__(self, model: str = "yolo11n.yaml", conf: float = 0.25, iou: float = 0.7,
                 imgsz: int = 640, out_dir: str = "runs/inference"):
        from fce_yolo_tpu.api import YOLO

        self.model = model if not isinstance(model, str) else YOLO(model)
        self.conf, self.iou, self.imgsz = conf, iou, imgsz
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)

    def __call__(self, source) -> list[str]:
        import cv2

        written = []
        for i, r in enumerate(
            self.model.predict(source, conf=self.conf, iou=self.iou, imgsz=self.imgsz, stream=True)
        ):
            p = self.out_dir / f"frame_{i:05d}.jpg"
            cv2.imwrite(str(p), r.plot())
            written.append(str(p))
        return written

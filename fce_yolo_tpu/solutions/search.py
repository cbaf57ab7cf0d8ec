"""Visual similarity search + batch inference app analogs
(reference solutions/{similarity_search,streamlit_inference}.py).

The reference's VisualAISearch embeds images with CLIP and answers text
queries; CLIP weights are unavailable offline, so this re-scope indexes
images by an HSV color-signature embedding and answers IMAGE queries
(query-by-example). The API shape (index directory -> search(query, k))
matches the reference so a CLIP backend can drop in when weights exist.
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

    def __init__(self, data: str = "images", k: int = 5):
        import cv2

        self.data = Path(data)
        self.k = k
        self.paths: list[Path] = sorted(
            p for p in self.data.rglob("*") if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp")
        )
        feats = []
        for p in self.paths:
            img = cv2.imread(str(p))
            feats.append(self._embed(img))
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
        """Return the top-k (path, similarity) matches for a query image."""
        import cv2

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

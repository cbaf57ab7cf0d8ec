"""Streaming inference loaders: video streams, screenshots, in-memory tensors.

Behavioral parity targets: reference data/loaders.py:53 (LoadStreams —
threaded per-source capture with buffered/latest-frame modes), :226
(LoadScreenshots via mss), :562 (LoadTensor validation). Webcams and real
RTSP endpoints don't exist in this environment, but the class contracts do:
LoadStreams drives any cv2.VideoCapture URL (file paths act as test
streams), and LoadScreenshots degrades with a clear error when mss is
absent.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path

import cv2
import numpy as np

__all__ = ["LoadStreams", "LoadScreenshots", "LoadTensor"]


class LoadStreams:
    """Threaded multi-stream frame loader.

    Each source gets a daemon reader thread pushing into a small ring buffer;
    iteration yields the per-source latest frame (``buffer=False``, dropping
    stale frames like the reference's stream mode) or the oldest buffered one
    (``buffer=True``).

    Args:
        sources: one URL/path or a list, or a path to a ``.streams`` text
            file with one source per line (reference CLI contract).
        buffer: keep a FIFO instead of latest-frame-wins.
        vid_stride: sample every Nth frame.
    """

    def __init__(self, sources, buffer: bool = False, vid_stride: int = 1, max_buffer: int = 30):
        if isinstance(sources, (str, Path)) and str(sources).endswith(".streams"):
            sources = [s.strip() for s in Path(sources).read_text().splitlines() if s.strip()]
        elif not isinstance(sources, (list, tuple)):
            sources = [sources]
        self.sources = [str(s) for s in sources]
        self.buffer = buffer
        self.vid_stride = vid_stride
        self.max_buffer = max_buffer
        self.running = True
        self.caps: list[cv2.VideoCapture] = []
        self.frames: list[list[np.ndarray]] = [[] for _ in self.sources]
        self.locks = [threading.Lock() for _ in self.sources]
        self.finished = [False] * len(self.sources)
        self.threads = []
        for i, s in enumerate(self.sources):
            src = int(s) if s.isnumeric() else s
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s!r}")
            self.caps.append(cap)
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int) -> None:
        n = 0
        cap = self.caps[i]
        while self.running and cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            n += 1
            if n % self.vid_stride:
                continue
            with self.locks[i]:
                if self.buffer:
                    if len(self.frames[i]) < self.max_buffer:
                        self.frames[i].append(frame)
                    else:
                        time.sleep(0.005)
                else:
                    self.frames[i] = [frame]
        self.finished[i] = True

    def __iter__(self):
        return self

    def __next__(self):
        """Return (sources, frames) — one frame per live source."""
        out = []
        for i in range(len(self.sources)):
            frame = None
            deadline = time.time() + 5.0
            while frame is None:
                with self.locks[i]:
                    if self.frames[i]:
                        frame = self.frames[i].pop(0) if self.buffer else self.frames[i][-1]
                        if not self.buffer:
                            self.frames[i] = []
                if frame is None:
                    if self.finished[i] or time.time() > deadline:
                        self.close()
                        raise StopIteration
                    time.sleep(0.002)
            out.append(frame)
        return self.sources, out

    def __len__(self) -> int:
        return len(self.sources)

    def close(self) -> None:
        self.running = False
        for t in self.threads:
            t.join(timeout=1.0)
        for cap in self.caps:
            cap.release()


class LoadScreenshots:
    """Screen-capture frame source (reference loaders.py:226, mss-backed).

    Source grammar: ``"screen"`` or ``"screen 0 left top width height"``.
    Raises ImportError with guidance when mss is unavailable (headless env).
    """

    def __init__(self, source: str = "screen"):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "screenshot capture requires `mss`, which is not available in "
                "this environment"
            ) from e
        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.region = [int(p) for p in parts[2:6]] if len(parts) > 2 else None
        self.sct = mss.mss()

    def __iter__(self):
        return self

    def __next__(self):
        mon = self.sct.monitors[self.screen + 1]
        if self.region:
            left, top, width, height = self.region
            mon = {"left": mon["left"] + left, "top": mon["top"] + top,
                   "width": width, "height": height}
        frame = np.asarray(self.sct.grab(mon))[..., :3]  # BGRA -> BGR
        return ["screen"], [np.ascontiguousarray(frame)]


class LoadTensor:
    """Validate + yield in-memory arrays (reference loaders.py:562).

    Accepts numpy / jax / torch arrays, HWC or BHWC (BGR uint8 or 0-1 float);
    CHW layouts (torch convention) are transposed to HWC.
    """

    def __init__(self, tensor):
        arr = np.asarray(tensor)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4:
            raise ValueError(f"expected 3D/4D tensor, got shape {arr.shape}")
        if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):  # BCHW -> BHWC
            arr = arr.transpose(0, 2, 3, 1)
        if arr.dtype != np.uint8:
            if arr.max() > 1.0 + 1e-3:
                raise ValueError(
                    "float tensor inputs must be normalized to [0, 1] "
                    "(reference LoadTensor contract)"
                )
            arr = (arr * 255).astype(np.uint8)
        self.arr = arr

    def __iter__(self):
        self._i = 0
        return self

    def __next__(self):
        if self._i >= len(self.arr):
            raise StopIteration
        im = self.arr[self._i]
        self._i += 1
        return [f"tensor{self._i - 1}"], [im]

    def __len__(self) -> int:
        return len(self.arr)

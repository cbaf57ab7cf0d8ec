"""ctypes bridge to the native C++ data-loading engine (native/dataloader/).

Drop-in replacement for data/loader.py's DataLoader: same batch dict
contract, but decode + mosaic + affine + HSV + collate all run in C++
worker threads (no GIL, no numpy intermediate) — the framework's native
input-pipeline runtime. Build once with:

    cmake -B native/build native -G Ninja && ninja -C native/build

`available()` reports whether the shared library is present; callers fall
back to the Python loader when it isn't.
"""

from __future__ import annotations

import ctypes as C
from pathlib import Path

import numpy as np

__all__ = ["available", "NativeDataLoader", "native_letterbox",
           "native_decode_batch"]

_LIB_PATHS = [
    Path(__file__).resolve().parent.parent.parent / "native" / "build" / "libfy_loader.so",
    Path(__file__).resolve().parent / "libfy_loader.so",
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = C.CDLL(str(p))
            lib.fy_loader_create.restype = C.c_void_p
            lib.fy_loader_create.argtypes = [
                C.POINTER(C.c_char_p), C.c_int, C.POINTER(C.c_float),
                C.POINTER(C.c_int64), C.c_int, C.c_int, C.c_int, C.c_int,
                C.c_int, C.c_uint64, C.c_int, C.POINTER(C.c_float),
            ]
            lib.fy_loader_len.restype = C.c_int64
            lib.fy_loader_len.argtypes = [C.c_void_p, C.c_int]
            lib.fy_loader_start_epoch.argtypes = [C.c_void_p, C.c_int, C.c_int, C.c_int]
            lib.fy_loader_next.restype = C.c_int
            lib.fy_loader_next.argtypes = [
                C.c_void_p, C.POINTER(C.c_uint8), C.POINTER(C.c_float),
                C.POINTER(C.c_float), C.POINTER(C.c_uint8), C.POINTER(C.c_float),
            ]
            lib.fy_loader_destroy.argtypes = [C.c_void_p]
            lib.fy_letterbox.argtypes = [
                C.POINTER(C.c_uint8), C.c_int, C.c_int, C.c_int, C.c_int,
                C.POINTER(C.c_uint8), C.POINTER(C.c_float), C.POINTER(C.c_float),
                C.POINTER(C.c_float),
            ]
            if hasattr(lib, "fy_decode_letterbox_batch"):  # round-5 rebuilds
                lib.fy_decode_letterbox_batch.restype = C.c_int
                lib.fy_decode_letterbox_batch.argtypes = [
                    C.POINTER(C.c_char_p), C.c_int, C.c_int, C.c_int, C.c_int,
                    C.POINTER(C.c_uint8), C.POINTER(C.c_float),
                ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def native_decode_batch(paths, imgsz: int, scaleup: bool = False,
                        workers: int = 4, out: np.ndarray | None = None):
    """Threaded C++ JPEG decode + letterbox + RGB into one model-ready batch.

    The system-throughput front end (image bytes on disk -> (N, imgsz,
    imgsz, 3) uint8): reference predictor preprocess contract
    (engine/predictor.py:277 / data/build.py:286) done off the interpreter.
    Returns (batch, meta) where meta rows are [ratio, padw, padh, h0, w0].
    ``out`` reuses a caller-owned buffer (double-buffered pipelines).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fy_decode_letterbox_batch"):
        raise RuntimeError("native loader not built (make native)")
    n = len(paths)
    arr = (C.c_char_p * n)(*[str(p).encode() for p in paths])
    if out is None:
        out = np.empty((n, imgsz, imgsz, 3), np.uint8)
    meta = np.empty((n, 5), np.float32)
    ok = lib.fy_decode_letterbox_batch(
        arr, n, imgsz, int(scaleup), workers,
        out.ctypes.data_as(C.POINTER(C.c_uint8)),
        meta.ctypes.data_as(C.POINTER(C.c_float)),
    )
    if ok != n:
        import warnings

        warnings.warn(f"native_decode_batch: {n - ok}/{n} images failed to decode")
    return out, meta


def native_letterbox(img: np.ndarray, new_size: int, scaleup: bool = True):
    """C++ letterbox (same geometry as data/augment.py::letterbox)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((new_size, new_size, 3), np.uint8)
    r, pw, ph = C.c_float(), C.c_float(), C.c_float()
    lib.fy_letterbox(
        img.ctypes.data_as(C.POINTER(C.c_uint8)), img.shape[0], img.shape[1],
        new_size, int(scaleup), out.ctypes.data_as(C.POINTER(C.c_uint8)),
        C.byref(r), C.byref(pw), C.byref(ph),
    )
    return out, r.value, (pw.value, ph.value)


class NativeDataLoader:
    """Same iteration contract as data/loader.py::DataLoader."""

    def __init__(self, dataset, batch_size=16, shuffle=True, workers=8, max_labels=128,
                 prefetch=3, seed=0, drop_last=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader library not built (see native/CMakeLists.txt)")
        self._lib = lib
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_labels = max_labels
        self.imgsz = dataset.imgsz
        self.train = dataset.mode == "train"
        self.drop_last = drop_last if drop_last is not None else self.train
        self.epoch = 0
        self._mosaic_enabled = self.train

        paths = [p.encode() for p in dataset.im_files]
        self._paths_arr = (C.c_char_p * len(paths))(*paths)
        flat, offsets = [], [0]
        for lab in dataset.labels:
            rows = np.concatenate([lab["cls"][:, None], lab["xywhn"]], 1) if len(lab["cls"]) else np.zeros((0, 5), np.float32)
            flat.append(rows.astype(np.float32))
            offsets.append(offsets[-1] + len(rows))
        self._flat = np.concatenate(flat, 0) if flat else np.zeros((0, 5), np.float32)
        self._flat = np.ascontiguousarray(self._flat, np.float32)
        self._offsets = np.asarray(offsets, np.int64)

        hyp = dataset.hyp
        h = np.asarray(
            [hyp.mosaic, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v, hyp.degrees, hyp.translate,
             hyp.scale, hyp.shear, hyp.perspective, hyp.flipud, hyp.fliplr],
            np.float32,
        )
        self._hyp_arr = np.ascontiguousarray(h)
        self._handle = lib.fy_loader_create(
            self._paths_arr, len(paths),
            self._flat.ctypes.data_as(C.POINTER(C.c_float)),
            self._offsets.ctypes.data_as(C.POINTER(C.c_int64)),
            self.imgsz, batch_size, max_labels, workers, prefetch,
            C.c_uint64(seed), int(self.train),
            self._hyp_arr.ctypes.data_as(C.POINTER(C.c_float)),
        )

    def __len__(self) -> int:
        return int(self._lib.fy_loader_len(self._handle, int(self.drop_last)))

    def set_epoch(self, epoch: int, close_mosaic_at=None, total_epochs=None):
        self.epoch = epoch
        if close_mosaic_at and total_epochs and epoch >= total_epochs - close_mosaic_at:
            self._mosaic_enabled = False

    def __iter__(self):
        b, s, m = self.batch_size, self.imgsz, self.max_labels
        self._lib.fy_loader_start_epoch(
            self._handle, self.epoch, int(self._mosaic_enabled), int(self.drop_last)
        )
        n = len(self)
        for _ in range(n):
            img = np.empty((b, s, s, 3), np.uint8)
            cls = np.empty((b, m), np.float32)
            boxes = np.empty((b, m, 4), np.float32)
            mask = np.empty((b, m), np.uint8)
            meta = np.empty((b, 5), np.float32)
            nv = self._lib.fy_loader_next(
                self._handle,
                img.ctypes.data_as(C.POINTER(C.c_uint8)),
                cls.ctypes.data_as(C.POINTER(C.c_float)),
                boxes.ctypes.data_as(C.POINTER(C.c_float)),
                mask.ctypes.data_as(C.POINTER(C.c_uint8)),
                meta.ctypes.data_as(C.POINTER(C.c_float)),
            )
            if nv < 0:
                break
            out = {"img": img, "cls": cls, "bboxes": boxes, "mask": mask.astype(bool), "n_valid": nv}
            if not self.train:
                out["ratio"] = meta[:, 0]
                out["pad"] = meta[:, 1:3]
                out["orig_shape"] = meta[:, 3:5].astype(np.int32)
            yield out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.fy_loader_destroy(self._handle)
                self._handle = None
        except Exception:
            pass

"""AutoBackend: uniform inference over exported artifacts.

Analog of the reference nn/autobackend.py:71 — one wrapper class that makes
`YOLO(path).predict/val/benchmark` work for every format the exporter
writes, with metadata (nc/names/strides/imgsz) recovery from the artifact's
sidecar:

  suffix / shape                 runtime
  -----------------------------  ------------------------------------------
  .tflite                        tf.lite.Interpreter (+XNNPACK)
  <stem>_saved_model/            tf.saved_model.load
  .stablehlo                     PJRT compile_and_load of the MLIR text
                                 (runs on the session's JAX backend — the
                                 TPU-native "compiled artifact" path)
  .fyir                          native C++ interpreter (fy_infer --raw)
  orbax dir / .yaml / .pt        handled natively by the YOLO facade

All backends expose ``self(images)`` with images (B, H, W, 3) float32 in
[0,1] or uint8-range, returning the exported graph's output: raw preds
(B, A, 4+nc) when the artifact was exported without NMS, or the
boxes/scores/classes/valid dict when NMS was baked in.
"""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path
from typing import Any

import numpy as np

__all__ = ["AutoBackend", "is_exported_artifact"]


def is_exported_artifact(path: str) -> bool:
    p = Path(path)
    if p.suffix in (".tflite", ".stablehlo", ".fyir"):
        return True
    return p.is_dir() and (p / "saved_model.pb").exists()


class AutoBackend:
    """Load an exported artifact + metadata; callable on image batches."""

    def __init__(self, path: str):
        p = Path(path)
        self.path = str(p)
        if p.suffix == ".tflite":
            self.fmt = "tflite"
            self._meta_from(p.with_suffix(".json"))
            self._init_tflite(p)
        elif p.suffix == ".stablehlo":
            self.fmt = "stablehlo"
            self._meta_from(p.with_suffix(".json"))
            self._init_stablehlo(p)
        elif p.suffix == ".fyir":
            self.fmt = "fyir"
            self._meta_from(p.with_suffix(".json"), optional=True)
            self._init_fyir(p)
        elif p.is_dir() and (p / "saved_model.pb").exists():
            self.fmt = "saved_model"
            self._meta_from(p / "metadata.json")
            self._init_saved_model(p)
        else:
            raise ValueError(f"not an exported artifact: {path}")

    # ------------------------------------------------------------- metadata
    def _meta_from(self, path: Path, optional: bool = False):
        meta: dict[str, Any] = {}
        if path.exists():
            meta = json.loads(path.read_text())
        elif not optional:
            raise FileNotFoundError(f"metadata sidecar missing: {path}")
        self.meta = meta
        self.nc = int(meta.get("nc", 80))
        self.names = {int(k): v for k, v in (meta.get("names") or {}).items()} or {
            i: f"class_{i}" for i in range(self.nc)
        }
        self.imgsz = int(meta.get("imgsz", 640))
        self.batch = int(meta.get("batch", 1))
        self.strides = tuple(meta.get("strides", (8, 16, 32)))
        self.nms_baked = bool(meta.get("nms", False))

    # ------------------------------------------------------------- backends
    def _init_tflite(self, p: Path):
        import tensorflow as tf

        self._interp = tf.lite.Interpreter(model_path=str(p))
        self._interp.allocate_tensors()
        self._in = self._interp.get_input_details()
        self._out = self._interp.get_output_details()

        def run(x: np.ndarray):
            d = self._in[0]
            xin = x.astype(d["dtype"])
            if tuple(d["shape"]) != xin.shape:
                self._interp.resize_tensor_input(d["index"], xin.shape)
                self._interp.allocate_tensors()
            self._interp.set_tensor(d["index"], xin)
            self._interp.invoke()
            outs = [self._interp.get_tensor(o["index"]) for o in self._out]
            return self._pack(outs)

        self._run = run

    def _init_saved_model(self, p: Path):
        import tensorflow as tf

        mod = tf.saved_model.load(str(p))
        fn = mod.f if hasattr(mod, "f") else mod.signatures["serving_default"]

        def run(x: np.ndarray):
            out = fn(tf.constant(x.astype(np.float32)))
            if isinstance(out, dict):
                return {k: np.asarray(v) for k, v in out.items()}
            if isinstance(out, (list, tuple)):
                return self._pack([np.asarray(o) for o in out])
            return np.asarray(out)

        self._run = run

    def _init_stablehlo(self, p: Path):
        import jax
        import jax.extend as jex

        backend = jex.backend.get_backend()
        exe = backend.compile_and_load(p.read_text(), [backend.devices()[0]])
        self._backend = backend

        def run(x: np.ndarray):
            bufs = exe.execute([backend.buffer_from_pyval(x.astype(np.float32))])
            outs = [np.asarray(b) for b in bufs]
            return outs[0] if len(outs) == 1 else self._pack(outs)

        self._run = run

    def _init_fyir(self, p: Path):
        root = Path(__file__).resolve().parents[2]
        binary = root / "native" / "infer" / "fy_infer"
        if not binary.exists():
            raise FileNotFoundError(
                f"native runtime binary not built: {binary} "
                "(g++ -O2 -std=c++17 -o fy_infer fy_infer.cpp)"
            )
        weights = p.with_suffix(".fybin")

        def run(x: np.ndarray):
            import tempfile

            outs = []
            with tempfile.TemporaryDirectory() as td:
                for i, img in enumerate(x):
                    fin = Path(td) / f"in{i}.bin"
                    fout = Path(td) / f"out{i}.bin"
                    fin.write_bytes(np.ascontiguousarray(img, np.float32).tobytes())
                    subprocess.run(
                        [str(binary), str(p), str(weights), "--raw", str(fin), str(fout)],
                        check=True, capture_output=True,
                    )
                    raw = np.frombuffer(fout.read_bytes(), np.float32)
                    a = sum((img.shape[0] // s) * (img.shape[1] // s) for s in self.strides)
                    outs.append(raw.reshape(1, a, -1))
            return np.concatenate(outs, 0)

        self._run = run

    # --------------------------------------------------------------- call
    @staticmethod
    def _pack(outs: list[np.ndarray]):
        """Singleton passthrough, or name the NMS-dict outputs by rank/dtype."""
        if len(outs) == 1:
            return outs[0]
        named: dict[str, np.ndarray] = {}
        for o in outs:
            if o.ndim == 3 and o.shape[-1] == 4:
                named["boxes"] = o
            elif o.ndim == 2 and np.issubdtype(o.dtype, np.floating):
                named["scores"] = o
            elif o.ndim == 2 and o.dtype in (np.int32, np.int64):
                named["classes"] = o
            else:
                named["valid"] = o.astype(bool)
        return named

    def __call__(self, images: np.ndarray):
        x = np.asarray(images)
        if x.dtype == np.uint8:
            x = x.astype(np.float32)
        b, eb = x.shape[0], self.batch
        if b == eb:
            return self._run(x)
        # exported graphs have a static batch; chunk + pad + trim
        outs = []
        for i in range(0, b, eb):
            chunk = x[i : i + eb]
            if chunk.shape[0] < eb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], eb - chunk.shape[0], axis=0)]
                )
            outs.append(self._run(chunk))
        if isinstance(outs[0], dict):
            return {k: np.concatenate([o[k] for o in outs], 0)[:b] for k in outs[0]}
        return np.concatenate(outs, 0)[:b]

    def warmup(self):
        """One dummy invocation (reference AutoBackend.warmup)."""
        self(np.zeros((self.batch, self.imgsz, self.imgsz, 3), np.float32))
        return self

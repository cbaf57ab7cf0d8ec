"""Serving: binary protocol end-to-end — Python server + (when built) the
native C++ client from examples/cpp_client."""

import socket
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

CLIENT = Path(__file__).resolve().parent.parent / "examples" / "cpp_client" / "build" / "fy_client"


@pytest.fixture(scope="module")
def server():
    from fce_yolo_tpu.serve import InferenceServer

    srv = InferenceServer("yolo11n.yaml", imgsz=96, conf=0.25, nc=3).start()
    yield srv
    srv.stop()


def _request(port: int, img: np.ndarray) -> np.ndarray:
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        h, w = img.shape[:2]
        s.sendall(struct.pack("<II", h, w) + np.ascontiguousarray(img).tobytes())
        hdr = s.recv(4, socket.MSG_WAITALL)
        (n,) = struct.unpack("<I", hdr)
        body = b""
        while len(body) < n * 24:
            body += s.recv(n * 24 - len(body))
    return np.frombuffer(body, "<f4").reshape(n, 6)


def test_python_client_roundtrip(server):
    img = np.random.randint(0, 255, (120, 160, 3), np.uint8)
    rows = _request(server.port, img)
    assert rows.shape[1] == 6
    # repeatable: same image, same detections
    rows2 = _request(server.port, img)
    np.testing.assert_allclose(rows, rows2, atol=1e-4)


def test_remote_model_client(server):
    """RemoteModel (reference TritonRemoteModel analog) over a live server."""
    from fce_yolo_tpu.utils.remote import RemoteModel

    img = np.random.randint(0, 255, (96, 128, 3), np.uint8)
    with RemoteModel(f"tcp://127.0.0.1:{server.port}") as rm:
        rows = rm(img)
        assert rows.shape[1] == 6 and rows.dtype == np.float32
        np.testing.assert_allclose(rows, _request(server.port, img), atol=1e-4)
        rows.fill(0)  # rows must be writable (detached from the recv buffer)
        # reconnect path: drop the socket behind the client's back
        rm._sock.close()
        np.testing.assert_allclose(rm(img), _request(server.port, img), atol=1e-4)


def test_remote_model_bad_url():
    from fce_yolo_tpu.utils.remote import RemoteModel

    with pytest.raises(ValueError, match="tcp://host:port"):
        RemoteModel("tcp://no-port")


def test_facade_remote_predict(server):
    """YOLO('tcp://...') routes predict through the serving endpoint."""
    from fce_yolo_tpu.api import YOLO

    m = YOLO(f"tcp://127.0.0.1:{server.port}", names={0: "a", 1: "b", 2: "c"})
    assert m.task == "detect"
    img = np.random.randint(0, 255, (96, 128, 3), np.uint8)
    results = m.predict([img, img])
    assert len(results) == 2
    ref = _request(server.port, img)
    np.testing.assert_allclose(results[0].boxes.data, ref, atol=1e-4)
    assert results[0].orig_shape == (96, 128)
    m.remote.close()


@pytest.mark.skipif(not CLIENT.exists(), reason="C++ client not built")
def test_cpp_client(server, tmp_path):
    import cv2

    img_path = tmp_path / "in.jpg"
    cv2.imwrite(str(img_path), np.random.randint(0, 255, (120, 160, 3), np.uint8))
    out = subprocess.run(
        [str(CLIENT), "127.0.0.1", str(server.port), str(img_path), str(tmp_path / "out.jpg")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "detections" in out.stdout
    assert (tmp_path / "out.jpg").exists()

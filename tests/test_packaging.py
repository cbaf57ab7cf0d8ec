"""Wheel packaging: build, clean-install, and drive the installed package
(backs .github/workflows/publish.yml; reference analog is the pip-installed
`yolo` CLI working away from a source checkout)."""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

DRIVE = """
import jax; jax.config.update("jax_platforms", "cpu")
import sys
assert not any("repo" in p and "wheelenv" not in p for p in sys.path if p), sys.path
import fce_yolo_tpu
assert "wheelenv" in fce_yolo_tpu.__file__, fce_yolo_tpu.__file__
from fce_yolo_tpu.cfg import entrypoint
entrypoint(["version"])
import numpy as np
from fce_yolo_tpu import YOLO
m = YOLO("yolo11n.yaml")  # packaged-YAML bare-name resolution
r = m.predict(np.zeros((96, 96, 3), np.uint8), imgsz=96, conf=0.5)
assert len(r) == 1
assert YOLO("yolo11-fce.yaml").task == "detect"  # fork variant ships too
print("WHEEL-DRIVE-OK")
"""


@pytest.mark.slow
def test_wheel_build_install_drive(tmp_path):
    dist = tmp_path / "dist"
    env_dir = tmp_path / "wheelenv"
    subprocess.run(
        [sys.executable, "-m", "build", "--wheel", "--no-isolation", "-o", str(dist)],
        cwd=ROOT, check=True, capture_output=True, timeout=600,
    )
    wheels = list(dist.glob("fce_yolo_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--quiet",
         "--target", str(env_dir), str(wheels[0])],
        check=True, capture_output=True, timeout=300,
    )
    # every on-disk YAML must ship (cfg models/datasets + tracker cfgs)
    disk = {p.relative_to(ROOT).as_posix() for p in (ROOT / "fce_yolo_tpu").rglob("*.yaml")}
    shipped = {p.relative_to(env_dir).as_posix() for p in env_dir.rglob("*.yaml")}
    assert disk <= shipped, disk - shipped
    out = subprocess.run(
        [sys.executable, "-c", DRIVE],
        cwd=tmp_path, env={"PYTHONPATH": str(env_dir), "PATH": "/usr/bin:/bin",
                           "HOME": str(tmp_path)},
        capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WHEEL-DRIVE-OK" in out.stdout

"""Multi-host mesh: 2 processes x 4 CPU devices build one dp4 x sp2 mesh via
jax.distributed.initialize and match the single-process loss (VERDICT r2
next-step #7 — makes parallel/mesh.py's DCN/multi-host claim real; reference
analog: the DDP launcher, utils/dist.py:28-104).
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_loss_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model
    from fce_yolo_tpu.train.loss import DetectionLossCfg
    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
    from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

    # single-process expected loss (same seeds/config as the workers)
    imgsz, batch, m_pad, nc = 64, 4, 8, 8
    model, spec, strides = build_model(
        "fce_yolo_tpu/cfg/models/yolo11-fce.yaml", scale="n", nc=nc
    )
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, imgsz, imgsz, 3)), train=True)
    )(jax.random.PRNGKey(0))
    tx = build_optimizer(OptimCfg(optimizer="SGD", batch_size=batch, nc=nc), variables["params"])
    state = create_train_state(model, dict(variables), tx)
    step = jax.jit(make_train_step(model, tx, DetectionLossCfg(nc=nc, strides=tuple(strides))))
    rng = np.random.RandomState(0)
    raw = {
        "img": jnp.asarray(rng.rand(batch, imgsz, imgsz, 3).astype(np.float32)),
        "cls": jnp.asarray(rng.randint(0, nc, (batch, m_pad)).astype(np.float32)),
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (batch, m_pad, 4)).astype(np.float32)),
        "mask": jnp.asarray(np.ones((batch, m_pad), bool)),
    }
    _, metrics = step(state, raw)
    expected = float(metrics["loss"])
    exp_file = tmp_path / "expected_loss.txt"
    exp_file.write_text(f"{expected:.10f}")

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "multihost_worker.py"),
             str(port), str(pid), "2", str(exp_file)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=str(ROOT),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "OK" in out

"""Worker process for the multi-host mesh test (run via subprocess).

Usage: python tests/multihost_worker.py <coordinator_port> <process_id>
       <num_processes> <expected_loss_file>

Each process contributes 4 virtual CPU devices; together they form the same
dp x sp mesh `dryrun_multichip` uses, but spanning TWO OS processes — the
localhost stand-in for the reference's multi-node DDP launch
(utils/dist.py:28-104) and for `jax.distributed.initialize` over DCN
(parallel/mesh.py design notes).
"""

from __future__ import annotations

import sys

import numpy as np


def main(port: int, pid: int, nprocs: int, expected_file: str) -> None:
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    # per-RUN compile cache shared by both workers, NOT the repo-wide one:
    # a stale repo-cache AOT entry (written under different CPU target
    # features) can hit on one worker while the other compiles fresh, giving
    # the two processes different collective schedules — their Gloo cliques
    # then never line up and GetKeyValue times out after its hard 30 s.
    cache = os.path.join(os.path.dirname(expected_file), "jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from fce_yolo_tpu.nn.model import build_model
    from fce_yolo_tpu.parallel.mesh import data_mesh, replicated
    from fce_yolo_tpu.train.loss import DetectionLossCfg
    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
    from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

    n = len(jax.devices())
    assert n == 4 * nprocs, f"expected {4 * nprocs} global devices, got {n}"
    assert len(jax.local_devices()) == 4

    sp = 2
    mesh = data_mesh(n, sp=sp)
    dp = n // sp
    imgsz, batch, m_pad, nc = 64, dp, 8, 8

    model, spec, strides = build_model(
        "fce_yolo_tpu/cfg/models/yolo11-fce.yaml", scale="n", nc=nc
    )
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, imgsz, imgsz, 3)), train=True)
    )(jax.random.PRNGKey(0))

    tx = build_optimizer(OptimCfg(optimizer="SGD", batch_size=batch, nc=nc), variables["params"])
    state = jax.device_put(create_train_state(model, dict(variables), tx), replicated(mesh))
    step = jax.jit(
        make_train_step(model, tx, DetectionLossCfg(nc=nc, strides=tuple(strides))),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )

    # every process generates the SAME deterministic global batch, then
    # contributes only its addressable shards
    rng = np.random.RandomState(0)
    raw = {
        "img": rng.rand(batch, imgsz, imgsz, 3).astype(np.float32),
        "cls": rng.randint(0, nc, (batch, m_pad)).astype(np.float32),
        "bboxes": rng.uniform(0.3, 0.6, (batch, m_pad, 4)).astype(np.float32),
        "mask": np.ones((batch, m_pad), bool),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P

    def globalize(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    batch_data = {
        "img": globalize(raw["img"], P("dp", "sp")),
        "cls": globalize(raw["cls"], P("dp")),
        "bboxes": globalize(raw["bboxes"], P("dp")),
        "mask": globalize(raw["mask"], P("dp")),
    }

    # AOT-compile first, then rendezvous at the coordination-service barrier
    # (10-min timeout) so BOTH processes enter the Gloo collective together —
    # Gloo's own context-init timeout is a hard 30 s, which a cold-cache
    # compile on a loaded machine can overshoot if one process runs ahead.
    compiled = step.lower(state, batch_data).compile()
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        _dist.global_state.client.wait_at_barrier("fy_compiled", timeout_in_ms=600_000)
    new_state, metrics = compiled(state, batch_data)
    jax.block_until_ready(new_state.params)
    loss = float(metrics["loss"])
    expected = float(open(expected_file).read().strip())
    assert np.isfinite(loss), f"non-finite multi-process loss: {loss}"
    assert abs(loss - expected) <= 1e-3 * max(1.0, abs(expected)), (
        f"process {pid}: multi-process loss {loss} != single-process {expected}"
    )
    print(f"proc {pid}/{nprocs}: mesh dp{dp}xsp{sp} over {nprocs} processes "
          f"loss={loss:.5f} (expected {expected:.5f}) OK", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

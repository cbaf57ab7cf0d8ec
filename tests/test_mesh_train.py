"""Data-parallel facade training over a virtual 8-device mesh (conftest
forces 8 CPU devices; the driver separately dry-runs dp x sp via
__graft_entry__.dryrun_multichip)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_facade_train_on_mesh(tiny_dataset, tmp_path):
    import jax
    from jax.sharding import Mesh

    from fce_yolo_tpu.api import YOLO

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("dp",))
    m = YOLO("yolo11n.yaml", nc=3)
    out = m.train(
        data=tiny_dataset, epochs=2, batch=8, imgsz=96, workers=2, max_labels=16,
        mosaic=0.0, optimizer="AdamW", lr0=0.005, warmup_epochs=0.0, close_mosaic=0,
        project=str(tmp_path), name="mesh", verbose=False, val=True,
        device_mesh=mesh, native_loader=False,
    )
    assert out["epochs_run"] == 2
    assert np.isfinite(out["results"][-1]["train/box_loss"])


def test_parallel_mesh_helpers():
    import jax

    from fce_yolo_tpu.parallel.mesh import data_mesh, replicated, shard_batch

    mesh = data_mesh(8, sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    batch = {
        "img": np.zeros((8, 16, 16, 3), np.float32),
        "cls": np.zeros((8, 4), np.float32),
        "bboxes": np.zeros((8, 4, 4), np.float32),
        "mask": np.ones((8, 4), bool),
    }
    sharded = shard_batch(batch, mesh, spatial=True)
    # image sharded over dp (batch) and sp (height)
    assert sharded["img"].sharding.spec == ("dp", "sp")

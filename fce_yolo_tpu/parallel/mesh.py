"""Mesh construction and sharding policies.

Design (SURVEY.md §2.8 TPU-native equivalents):
- ``dp`` axis: data parallelism — batch-dim sharding. The gradient
  all-reduce the reference gets from DDP (engine/trainer.py:310,429) is
  emitted automatically by XLA when the loss reduces over a dp-sharded batch.
- ``sp`` axis: spatial parallelism — the activation H dimension is sharded
  for large-resolution (1280px+) streaming; XLA's SPMD partitioner inserts
  halo exchanges for the convolutions (the "context parallel" analog for
  dense vision, SURVEY.md §5 long-context note).
- Multi-host: the same mesh spans hosts (``jax.distributed.initialize`` +
  ``mesh_utils.create_device_mesh``); dp rides DCN, sp stays on ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(
    n_devices: int | None = None, sp: int = 1, devices=None
) -> Mesh:
    """Build a ('dp', 'sp') mesh over the available devices.

    Args:
        n_devices: total devices to use (default: all).
        sp: spatial-parallel degree; dp = n_devices // sp.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % sp != 0:
        raise ValueError(f"{n} devices not divisible by sp={sp}")
    arr = np.asarray(devices).reshape(n // sp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over dp; replicate over sp."""
    return NamedSharding(mesh, P("dp"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over dp, height over sp (XLA handles conv halos)."""
    return NamedSharding(mesh, P("dp", "sp"))


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = False) -> dict:
    """Place a train batch on the mesh: images (B,H,W,C) get dp(+sp) sharding,
    per-image label tensors get dp sharding."""
    img_sh = spatial_sharding(mesh) if spatial else batch_sharding(mesh)
    lbl_sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(v, img_sh if k == "img" else lbl_sh)
    return out

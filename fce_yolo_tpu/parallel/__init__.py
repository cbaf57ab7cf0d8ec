"""Parallelism layer: device meshes and sharding policies.

Replaces the reference's DDP machinery (SURVEY.md §2.8 — subprocess
relaunch, NCCL process groups, rank-gated code paths) with single-controller
JAX SPMD: one `jax.sharding.Mesh`, NamedShardings, and XLA-inserted
collectives over ICI.
"""

from fce_yolo_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "batch_sharding",
    "data_mesh",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]

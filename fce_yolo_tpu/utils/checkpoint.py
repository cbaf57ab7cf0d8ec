"""Orbax-based checkpoints.

TPU-native replacement for the reference's single-pickle .pt checkpoints
(engine/trainer.py:584-624): a checkpoint is a DIRECTORY containing an
orbax pytree (params / batch_stats / optional EMA + optimizer state) plus a
meta.json (model yaml + scale + names + train args + fitness) so a model
can be rebuilt without unpickling arbitrary code (the reference needs
torch_safe_load shims for that; we need none).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

__all__ = ["save_checkpoint", "load_checkpoint", "is_checkpoint"]

_META = "meta.json"
_TREE = "tree"


def is_checkpoint(path: str | Path) -> bool:
    return Path(path).is_dir() and (Path(path) / _META).exists()


def save_checkpoint(path: str | Path, tree: dict, meta: dict[str, Any]) -> str:
    """Write pytree + metadata to ``path`` (replacing any existing checkpoint)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    tree_dir = path / _TREE
    ckpt = ocp.StandardCheckpointer()
    if tree_dir.exists():
        import shutil

        shutil.rmtree(tree_dir)
    ckpt.save(tree_dir, tree)
    ckpt.wait_until_finished()
    (path / _META).write_text(json.dumps(_jsonable(meta), indent=2))
    return str(path)


def load_checkpoint(path: str | Path) -> tuple[dict, dict]:
    """Read (pytree, meta) back. Arrays restore as numpy on the host."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    meta = json.loads((path / _META).read_text())
    with ocp.PyTreeCheckpointer() as ckpt:
        tree = ckpt.restore(path / _TREE)
    return tree, meta


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    if isinstance(obj, Path):
        return str(obj)
    return obj

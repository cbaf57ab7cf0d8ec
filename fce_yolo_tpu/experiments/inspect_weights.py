"""Post-hoc diagnosis of trained FCE modules (rebuild of script/inspect_weights.py:43-170).

Reads a checkpoint's params tree, reports:
- BiFPN_Concat learned fusion weights (raw + relu-normalized) with a verdict
  on whether the fusion learned a preference or collapsed to plain averaging
  (reference inspect_bifpn, script/inspect_weights.py:54-73).
- BiCoordCrossAtt gate-projection weight statistics (out_h / out_w /
  identity norms; reference inspect_bicoord:75-92).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["inspect_variables", "inspect_checkpoint", "bifpn_fusion_weights"]


def _walk(tree: dict, prefix: str = ""):
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _walk(v, path)
        else:
            yield path, np.asarray(v)


def bifpn_fusion_weights(params: dict, epsilon: float = 1e-4) -> dict[str, dict]:
    """Collect every BiFPN fusion weight vector `w` -> normalized + verdict."""
    out = {}
    for path, arr in _walk(params):
        if path.endswith("/w") and arr.ndim == 1 and arr.size <= 8:
            relu = np.maximum(arr, 0)
            normed = relu / (relu.sum() + epsilon)
            n = arr.size
            max_dev = float(np.abs(normed - 1.0 / n).max())
            if max_dev < 0.02:
                verdict = "≈ uniform fusion (no learned preference; equivalent to plain Concat)"
            elif max_dev < 0.10:
                verdict = "slight preference"
            else:
                verdict = "strong learned fusion preference"
            out[path] = {
                "raw": arr.tolist(),
                "normalized": [round(float(x), 4) for x in normed],
                "max_dev_from_uniform": round(max_dev, 4),
                "verdict": verdict,
            }
    return out


def _tensor_stats(arr: np.ndarray) -> dict[str, float]:
    return {
        "shape": list(arr.shape),
        "mean": round(float(arr.mean()), 5),
        "std": round(float(arr.std()), 5),
        "l2": round(float(np.linalg.norm(arr)), 4),
    }


def bicoord_gate_stats(params: dict) -> dict[str, dict]:
    """Per-BiCoordCrossAtt layer: out_h/out_w/identity kernel statistics.

    A near-zero gate-projection norm means the branch's sigmoid sits at a
    constant ~0.5 and the attention is inactive.
    """
    layers: dict[str, dict] = {}
    for path, arr in _walk(params):
        for tag in ("out_h", "out_w", "identity"):
            marker = f"/{tag}/kernel"
            if path.endswith(marker):
                layer = path[: -len(marker)]
                # only count layers that also have the cross-attn projections
                layers.setdefault(layer, {})[tag] = _tensor_stats(arr)
    # filter to genuine BiCoordCrossAtt layers (must have both gates)
    return {k: v for k, v in layers.items() if "out_h" in v and "out_w" in v}


def inspect_variables(variables: dict) -> dict[str, Any]:
    params = variables.get("params", variables)
    return {"bifpn": bifpn_fusion_weights(params), "bicoord": bicoord_gate_stats(params)}


def inspect_checkpoint(path: str, verbose: bool = True) -> dict[str, Any]:
    from fce_yolo_tpu.utils.checkpoint import load_checkpoint

    tree, meta = load_checkpoint(path)
    report = inspect_variables(tree)
    report["meta"] = {k: meta.get(k) for k in ("cfg_yaml", "scale", "nc", "epoch", "fitness")}
    if verbose:
        print(f"checkpoint: {path} ({report['meta']})")
        for name, info in report["bifpn"].items():
            print(f"  [BiFPN] {name}: w={info['normalized']} dev={info['max_dev_from_uniform']} -> {info['verdict']}")
        for name, info in report["bicoord"].items():
            print(f"  [BiCoordCrossAtt] {name}: " + ", ".join(f"{t} l2={s['l2']}" for t, s in info.items()))
    return report

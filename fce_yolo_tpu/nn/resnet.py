"""Flax ResNet trunks + the YAML `TorchVision` passthrough module.

Reference: nn/modules/block.py:1554 (TorchVision — wraps a torchvision model,
optionally unwrapped/truncated) as used by cfg/models/11/yolo11-cls-resnet18
.yaml (`[512, resnet18, DEFAULT, True, 2]`: the resnet18 trunk with avgpool+
fc truncated). torchvision itself cannot exist in this environment, so the
supported passthroughs (resnet18/34/50) are rebuilt here in flax with
torchvision's exact architecture and state-dict key layout —
`resnet_state_dict_to_variables` imports a real torchvision checkpoint's
weights unchanged (activation parity tested against a key-identical torch
twin in tests/test_resnet.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["BasicBlock", "BottleneckBlock", "ResNetTrunk", "TorchVision",
           "resnet_state_dict_to_variables", "RESNET_DEPTHS"]

# variant -> (block kind, stage depths, expansion)
RESNET_DEPTHS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1),
    "resnet34": ("basic", (3, 4, 6, 3), 1),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 4),
}

_BN = dict(momentum=0.9, epsilon=1e-5)  # torchvision defaults (not YOLO's 1e-3)


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, name=name, **_BN)


def _conv(c2: int, k: int, s: int, name: str):
    p = (k - 1) // 2
    return nn.Conv(c2, (k, k), (s, s), padding=[(p, p), (p, p)], use_bias=False, name=name)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3(s) -> 3x3, identity/1x1-downsample add."""

    c2: int
    s: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        y = _conv(self.c2, 3, self.s, "conv1")(x)
        y = jax.nn.relu(_bn("bn1", train)(y))
        y = _conv(self.c2, 3, 1, "conv2")(y)
        y = _bn("bn2", train)(y)
        if self.s != 1 or x.shape[-1] != self.c2:
            identity = _conv(self.c2, 1, self.s, "down_conv")(x)
            identity = _bn("down_bn", train)(identity)
        return jax.nn.relu(y + identity)


class BottleneckBlock(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3), expansion 4."""

    c2: int  # inner width; output is 4*c2
    s: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_out = self.c2 * 4
        identity = x
        y = _conv(self.c2, 1, 1, "conv1")(x)
        y = jax.nn.relu(_bn("bn1", train)(y))
        y = _conv(self.c2, 3, self.s, "conv2")(y)
        y = jax.nn.relu(_bn("bn2", train)(y))
        y = _conv(c_out, 1, 1, "conv3")(y)
        y = _bn("bn3", train)(y)
        if self.s != 1 or x.shape[-1] != c_out:
            identity = _conv(c_out, 1, self.s, "down_conv")(x)
            identity = _bn("down_bn", train)(identity)
        return jax.nn.relu(y + identity)


class ResNetTrunk(nn.Module):
    """conv1/bn1/maxpool + 4 stages; output is the stage-4 feature map
    (torchvision resnet with avgpool+fc truncated — `truncate=2`)."""

    variant: str = "resnet18"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind, depths, _ = RESNET_DEPTHS[self.variant]
        block = BasicBlock if kind == "basic" else BottleneckBlock
        x = _conv(64, 7, 2, "conv1")(x)
        x = jax.nn.relu(_bn("bn1", train)(x))
        x = jax.lax.reduce_window(  # maxpool 3x3 s2 p1
            x.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        ).astype(x.dtype)
        for stage, n in enumerate(depths):
            c2 = 64 * (2 ** stage)
            for j in range(n):
                s = 2 if (stage > 0 and j == 0) else 1
                x = block(c2, s, name=f"layer{stage + 1}_{j}")(x, train)
        return x


class TorchVision(nn.Module):
    """YAML passthrough module (reference block.py:1554). Positional args
    mirror the reference YAML contract: (c2, model, weights, unwrap,
    truncate, split). Only the trunk form (unwrap=True, truncate=2,
    split=False) of resnet18/34/50 is supported — exactly what the
    reference model zoo uses."""

    c2: int
    model: str = "resnet18"
    weights: str = "DEFAULT"  # YAML parity; offline env has no weight hub
    unwrap: bool = True
    truncate: int = 2
    split: bool = False

    def setup(self):
        if self.model not in RESNET_DEPTHS:
            raise NotImplementedError(
                f"TorchVision passthrough supports {sorted(RESNET_DEPTHS)}, got {self.model!r}"
            )
        if not self.unwrap or self.truncate != 2 or self.split:
            raise NotImplementedError(
                "TorchVision passthrough supports the trunk form only "
                "(unwrap=True, truncate=2, split=False)"
            )
        self.m = ResNetTrunk(self.model, name="m")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.m(x, train)


def resnet_state_dict_to_variables(sd: dict[str, Any], variant: str = "resnet18") -> dict:
    """torchvision resnet state dict -> ResNetTrunk flax variables.

    Accepts the exact torchvision key layout (conv1.weight, bn1.*,
    layer{i}.{j}.conv{k}.weight, layer{i}.{j}.bn{k}.*,
    layer{i}.{j}.downsample.{0,1}.*); avgpool/fc keys are ignored.
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def put(tree: dict, path: tuple[str, ...], value: np.ndarray):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv_w(v) -> np.ndarray:
        return np.asarray(v, np.float32).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    for key, v in sd.items():
        parts = key.split(".")
        if parts[0] in ("fc", "avgpool"):
            continue
        v_np = np.asarray(v, np.float32)
        if parts[0] == "conv1":
            put(params, ("conv1", "kernel"), conv_w(v_np))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn1",), parts[1], v_np)
        elif parts[0].startswith("layer"):
            blk = f"{parts[0]}_{parts[1]}"
            sub = parts[2]
            if sub.startswith("conv"):
                put(params, (blk, sub, "kernel"), conv_w(v_np))
            elif sub.startswith("bn"):
                _put_bn(params, stats, (blk, sub), parts[3], v_np)
            elif sub == "downsample":
                if parts[3] == "0":
                    put(params, (blk, "down_conv", "kernel"), conv_w(v_np))
                else:
                    _put_bn(params, stats, (blk, "down_bn"), parts[4], v_np)
    return {"params": params, "batch_stats": stats}


def _put_bn(params: dict, stats: dict, path: tuple[str, ...], field: str, v: np.ndarray):
    tree, leaf = {
        "weight": (params, "scale"),
        "bias": (params, "bias"),
        "running_mean": (stats, "mean"),
        "running_var": (stats, "var"),
    }.get(field, (None, None))
    if tree is None:  # num_batches_tracked
        return
    node = tree
    for k in path:
        node = node.setdefault(k, {})
    node[leaf] = v

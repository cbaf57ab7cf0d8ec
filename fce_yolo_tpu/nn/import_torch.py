"""Torch checkpoint import: reference .pt / state_dict -> flax variables.

The flax module tree mirrors torch attribute paths (nn/modules.py naming
convention), so import is a pure name rewrite plus layout transposes:

  torch                              flax
  -----                              ----
  model.0.conv.weight   (OIHW)  ->   params/layers_0/conv/kernel   (HWIO)
  model.0.bn.{weight,bias}      ->   params/layers_0/bn/{scale,bias}
  model.0.bn.running_{mean,var} ->   batch_stats/layers_0/bn/{mean,var}
  model.23.cv2.0.2.weight       ->   params/layers_23/cv2_0_2/conv2d/kernel
  model.12.w                    ->   params/layers_12/w   (BiFPN fusion)
  model.23.dfl.conv.weight      ->   (skipped — our DFL decode is parameter-free)

Covers reference checkpoint layout of nn/tasks.py DetectionModel
(state_dict keys "model.{i}.<path>") for the yolo11/-fce/-bifpn graphs.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Any, Mapping

import numpy as np


def _merge_numeric_tokens(tokens: list[str]) -> list[str]:
    """["cv2", "0", "2"] -> ["cv2_0_2"] (torch ModuleList/Sequential indices
    are folded into flax submodule names)."""
    out: list[str] = []
    for t in tokens:
        if t.isdigit() and out:
            out[-1] = f"{out[-1]}_{t}"
        else:
            out.append(t)
    return out


def torch_key_to_flax(key: str) -> tuple[str, tuple[str, ...], str] | None:
    """Map one torch state_dict key to (collection, flax path, kind).

    kind in {"conv_kernel", "tensor"}; returns None for keys to skip.
    """
    key = re.sub(r"^(module\.)?(model\.)?", "", key)
    tokens = key.split(".")
    leaf = tokens[-1]
    body = _merge_numeric_tokens(tokens[:-1])
    if not body:
        return None
    # "0" layer index -> layers_0  (first token is always the layer index)
    m = re.match(r"^(\d+)(.*)$", body[0])
    if m:
        body[0] = f"layers_{m.group(1)}{m.group(2)}"
    if "dfl" in body:
        return None  # parameter-free DFL decode
    if leaf == "num_batches_tracked":
        return None

    # RT-DETR decoder: torch "decoder.layers.N" nests; our head flattens to
    # "decoder_layers_N" (nn/heads.py RTDETRDecoder)
    for i, t in enumerate(body[:-1]):
        if t == "decoder" and re.fullmatch(r"layers_\d+", body[i + 1]):
            body[i : i + 2] = [f"decoder_{body[i + 1]}"]
            break

    parent = body[-1] if body else ""
    if parent == "out_proj":  # torch MultiheadAttention out projection
        # our _TorchMHA keeps torch's (out, in) layout -> no transpose
        return ("params", tuple(body[:-1] + [f"out_proj_{leaf}"]), "tensor")
    if parent in ("denoising_class_embed", "tgt_embed"):  # embedding tables
        return ("params", tuple(body), "tensor")
    # RT-DETR Linear layers (dense_kernel transpose): MSDeformAttn projections,
    # FFN linears, score heads, MLP sublayers ("layers_N" below the top level),
    # enc_output.0
    rtdetr_linear = (
        parent in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj", "linear1", "linear2", "enc_score_head",
                   "enc_output_0")
        or re.fullmatch(r"dec_score_head_\d+", parent)
        or (re.fullmatch(r"layers_\d+", parent) and len(body) > 1)
    )
    if rtdetr_linear:
        if leaf == "weight":
            return ("params", tuple(body + ["kernel"]), "dense_kernel")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent == "enc_output_1":  # LayerNorm in the Sequential
        if leaf == "weight":
            return ("params", tuple(body + ["scale"]), "tensor")
        return ("params", tuple(body + [leaf]), "tensor")
    if re.fullmatch(r"input_proj_\d+_1", parent):  # plain BatchNorm2d
        if leaf == "weight":
            return ("params", tuple(body + ["scale"]), "tensor")
        if leaf == "bias":
            return ("params", tuple(body + ["bias"]), "tensor")
    if parent in ("fc1", "fc2"):  # transformer FFN Linears
        if leaf == "weight":
            return ("params", tuple(body + ["kernel"]), "dense_kernel")
        return ("params", tuple(body + [leaf]), "tensor")
    # world-model Linears (MaxSigmoidAttnBlock.gl, ImagePoolingAttn
    # query/key/value Sequential index 1 + proj)
    # (a bare "proj" parent only occurs on ImagePoolingAttn's Linear — conv
    # projs elsewhere are Conv modules whose keys end in .conv.weight)
    if parent in ("gl", "query_1", "key_1", "value_1", "proj", "w12", "w3"):
        if leaf == "weight":
            return ("params", tuple(body + ["kernel"]), "dense_kernel")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent in ("query_0", "key_0", "value_0"):  # world LayerNorms
        if leaf == "weight":
            return ("params", tuple(body + ["scale"]), "tensor")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent.startswith("norm"):  # LayerNorm, or BatchNorm (BNContrastiveHead)
        if leaf == "running_mean":
            return ("batch_stats", tuple(body + ["mean"]), "tensor")
        if leaf == "running_var":
            return ("batch_stats", tuple(body + ["var"]), "tensor")
        if leaf == "weight":
            return ("params", tuple(body + ["scale"]), "tensor")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent == "upsample":  # Proto's ConvTranspose2d (block.py:83-104)
        if leaf == "weight":
            return ("params", tuple(body + ["kernel"]), "convT_kernel")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent == "linear":  # Classify head's nn.Linear (head.py:387-438)
        if leaf == "weight":
            return ("params", tuple(body + ["kernel"]), "dense_kernel")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent.startswith("bn") or leaf in ("running_mean", "running_var"):
        if leaf == "running_mean":
            return ("batch_stats", tuple(body + ["mean"]), "tensor")
        if leaf == "running_var":
            return ("batch_stats", tuple(body + ["var"]), "tensor")
        if leaf == "weight":
            return ("params", tuple(body + ["scale"]), "tensor")
        return ("params", tuple(body + [leaf]), "tensor")
    if parent == "conv":  # ConvBNAct inner conv (bias=False)
        if leaf == "weight":
            return ("params", tuple(body + ["kernel"]), "conv_kernel")
        return ("params", tuple(body + [leaf]), "tensor")
    # raw nn.Parameter biases (world MaxSigmoidAttnBlock.bias, ContrastiveHead
    # cv4_N.bias) — not conv biases
    if leaf == "bias" and (parent == "attn" or re.fullmatch(r"cv4_\d+", parent or "")):
        return ("params", tuple(body + [leaf]), "tensor")
    if leaf == "weight":
        # bare torch Conv2d (wrapped as our Conv2d module -> "conv2d" scope)
        return ("params", tuple(body + ["conv2d", "kernel"]), "conv_kernel")
    if leaf == "bias":
        return ("params", tuple(body + ["conv2d", "bias"]), "tensor")
    # raw parameters (e.g. BiFPN fusion weight "w")
    return ("params", tuple(body + [leaf]), "tensor")


def state_dict_to_variables(
    state_dict: Mapping[str, Any], template: dict | None = None
) -> dict:
    """Convert a torch state_dict (name -> array-like) into flax variables.

    Args:
        state_dict: torch parameter mapping; values must support ``.numpy()``
            or be numpy arrays already.
        template: optional variables pytree from ``model.init`` — used to
            validate that every template leaf gets filled and shapes agree.
    """
    variables: dict[str, dict] = {"params": {}, "batch_stats": {}}
    for key, val in state_dict.items():
        mapped = torch_key_to_flax(key)
        if mapped is None:
            continue
        coll, path, kind = mapped
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") else np.asarray(val)
        if kind == "conv_kernel":
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        elif kind == "convT_kernel":
            arr = np.transpose(arr, (2, 3, 0, 1))  # torch ConvT (I,O,kH,kW) -> (kH,kW,I,O)
        elif kind == "dense_kernel":
            arr = np.transpose(arr, (1, 0))  # (out, in) -> (in, out)
        node = variables[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    # task heads (Segment/Pose/OBB) nest the Detect trunk under a "detect"
    # scope in our tree while torch keeps cv2/cv3 flat on the head module —
    # reconcile using the template's structure
    if template is not None:
        for coll in ("params", "batch_stats"):
            tp = template.get(coll, {})
            got = variables[coll]
            for layer, sub in list(got.items()):
                t_layer = tp.get(layer) if hasattr(tp, "get") else None
                if not isinstance(t_layer, (dict,)) or not isinstance(sub, dict):
                    continue
                if "detect" in t_layer and "detect" not in sub:
                    # move any flat torch key that the template nests under
                    # the detect scope (cv2_/cv3_ trunks; YOLOE adds cv4_,
                    # reprta, savpe)
                    t_det = t_layer["detect"]
                    moved = {
                        k: sub.pop(k)
                        for k in list(sub)
                        if k not in t_layer and k in t_det
                    }
                    if moved:
                        sub["detect"] = moved

    if template is not None:
        import jax

        t_flat = jax.tree_util.tree_flatten_with_path(template)[0]
        v = variables

        def get(coll_path):
            node: Any = v
            for p in coll_path:
                k = getattr(p, "key", None) or getattr(p, "name", None) or str(p)
                if k not in node:
                    return None
                node = node[k]
            return node

        missing, mismatched = [], []
        for path, leaf in t_flat:
            keys = tuple(
                getattr(p, "key", None) or getattr(p, "name", None) or str(p) for p in path
            )
            got = get(path)
            if got is None:
                missing.append("/".join(keys))
            elif tuple(got.shape) != tuple(leaf.shape):
                mismatched.append(f"{'/'.join(keys)}: {got.shape} vs {leaf.shape}")
        if missing or mismatched:
            raise ValueError(
                f"weight import incomplete; missing={missing[:8]} mismatched={mismatched[:8]}"
            )
    return variables


def load_pt_state_dict(path: str, allow_unsafe: bool = False) -> dict[str, np.ndarray]:
    """Read a torch .pt checkpoint into a numpy state_dict.

    Handles the reference trainer's checkpoint format (engine/trainer.py:
    584-624: dict with 'model'/'ema' entries) *and* bare state_dict saves.

    Loads with torch.load(weights_only=True) by default so untrusted .pt
    files cannot execute pickle payloads. Checkpoints that store full
    nn.Module objects (the reference's default save format) need full
    unpickling; pass allow_unsafe=True to opt in explicitly for files
    you trust.
    """
    try:
        import torch
    except ImportError as e:  # torch-free fallback: numpy-only zip reader
        raise RuntimeError(
            "torch unavailable; torch-free .pt reading not yet implemented"
        ) from e

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_unsafe:
            raise ValueError(
                f"{path}: checkpoint needs full (unsafe) unpickling — it stores "
                "module objects, not just tensors. Re-call with allow_unsafe=True "
                "ONLY if you trust the file's origin."
            ) from None
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model") if isinstance(ckpt, dict) else ckpt
    if hasattr(model, "state_dict"):
        model = model.state_dict()
    return {k: v.float().numpy() for k, v in model.items() if hasattr(v, "numpy")}


def import_torch_checkpoint(path_or_sd, model, imgsz: int = 64) -> dict:
    """One-call import: .pt path or state_dict -> validated flax variables."""
    import jax

    sd = load_pt_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    template = model.init(jax.random.PRNGKey(0), np.zeros((1, imgsz, imgsz, 3), np.float32), train=True)
    return state_dict_to_variables(sd, template=template)

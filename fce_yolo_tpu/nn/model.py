"""Graph-executor detection model.

The parsed :class:`~fce_yolo_tpu.nn.parser.ModelSpec` is interpreted by a
single flax module that walks the layer list carrying a savelist cache —
the functional analog of the reference's ``BaseModel._predict_once`` layer
loop (nn/tasks.py:160-188). Because the walk happens at trace time, XLA
sees one flat fused graph; there is no interpreter overhead at runtime.

Stride resolution mirrors the reference's dummy-forward probe
(nn/tasks.py:396-406) but uses ``jax.eval_shape`` — zero FLOPs.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

from fce_yolo_tpu.nn import fce
from fce_yolo_tpu.nn import modules as M
from fce_yolo_tpu.nn.parser import LayerSpec, ModelSpec, load_model_yaml, parse_model_yaml


# Modules whose flax dataclass field order equals the reference constructor
# arg order — instantiated positionally from the parsed args.
_POSITIONAL: dict[str, Any] = {
    "Conv2": M.Conv2,
    "ConvTranspose": M.ConvTranspose,
    "nn.ConvTranspose2d": M.ConvTranspose2d,
    "Focus": M.Focus,
    "GhostConv": M.GhostConv,
    "GhostBottleneck": M.GhostBottleneck,
    "SPP": M.SPP,
    "C1": M.C1,
    "C2": M.C2,
    "C3x": M.C3x,
    "C3Ghost": M.C3Ghost,
    "BottleneckCSP": M.BottleneckCSP,
    "ResNetLayer": M.ResNetLayer,
    "RepNCSPELAN4": M.RepNCSPELAN4,
    "ELAN1": M.ELAN1,
    "AConv": M.AConv,
    "ADown": M.ADown,
    "SPPELAN": M.SPPELAN,
    "CBLinear": M.CBLinear,
    "CBFuse": M.CBFuse,
    "RepVGGDW": M.RepVGGDW,
    "CIB": M.CIB,
    "C2fCIB": M.C2fCIB,
    "PSA": M.PSA,
    "C2fPSA": M.C2fPSA,
    "SCDown": M.SCDown,
    "A2C2f": M.A2C2f,
    "CBAM": M.CBAM,
    "ChannelAttention": M.ChannelAttention,
    "SpatialAttention": M.SpatialAttention,
    "Index": M.Index,
    "nn.MaxPool2d": M.MaxPool2d,
    "nn.ZeroPad2d": M.ZeroPad2d,
    "nn.Identity": M.Identity,
    "Bottleneck": M.Bottleneck,
    "LightConv": M.LightConv,
}


def make_layer(ls: LayerSpec, strides: tuple[int, ...] | None, export: bool = False, legacy: bool = False) -> nn.Module:
    """Instantiate the flax module for one LayerSpec (reference-arg convention)."""
    name = f"layers_{ls.i}"
    a = ls.args
    n = ls.name
    if n == "Conv":
        # (c1, c2, k=1, s=1, p=None, g=1, d=1, act=True)
        return M.ConvBNAct(
            c2=a[1],
            k=a[2] if len(a) > 2 else 1,
            s=a[3] if len(a) > 3 else 1,
            p=a[4] if len(a) > 4 else None,
            g=a[5] if len(a) > 5 else 1,
            d=a[6] if len(a) > 6 else 1,
            act=a[7] if len(a) > 7 else True,
            name=name,
        )
    if n == "DWConv":
        import math as _math

        return M.DWConvBNAct(
            c2=a[1],
            k=a[2] if len(a) > 2 else 1,
            s=a[3] if len(a) > 3 else 1,
            g=_math.gcd(a[0], a[1]),
            name=name,
        )
    if n == "C3k2":
        return M.C3k2(
            c1=a[0],
            c2=a[1],
            n=a[2],
            c3k=a[3] if len(a) > 3 else False,
            e=a[4] if len(a) > 4 else 0.5,
            name=name,
        )
    if n in ("C3", "C3k"):
        cls = M.C3k if n == "C3k" else M.C3
        return cls(
            c1=a[0], c2=a[1], n=a[2], shortcut=a[3] if len(a) > 3 else True, name=name
        )
    if n == "SPPF":
        return M.SPPF(c1=a[0], c2=a[1], k=a[2] if len(a) > 2 else 5, name=name)
    if n == "C2PSA":
        return M.C2PSA(c1=a[0], c2=a[1], n=a[2], e=a[3] if len(a) > 3 else 0.5, name=name)
    if n in ("nn.Upsample", "Upsample"):
        # YAML: [None, 2, "nearest"]
        return M.Upsample(scale=int(a[1]), mode=a[2] if len(a) > 2 else "nearest", name=name)
    if n == "Concat":
        return M.Concat(name=name)
    if n == "C2f":
        return M.C2f(c1=a[0], c2=a[1], n=a[2], shortcut=a[3] if len(a) > 3 else False, name=name)
    if n == "Detect":
        return M.Detect(nc=a[0], ch=tuple(a[-1]), strides=strides, export=export,
                        legacy=legacy, name=name)
    if n == "Segment":
        from fce_yolo_tpu.nn import heads as H

        return H.Segment(
            nc=a[0], nm=a[1] if len(a) > 2 else 32, npr=a[2] if len(a) > 3 else 256,
            ch=tuple(a[-1]), strides=strides, export=export, legacy=legacy, name=name,
        )
    if n == "Pose":
        from fce_yolo_tpu.nn import heads as H

        return H.Pose(nc=a[0], kpt_shape=tuple(a[1]), ch=tuple(a[-1]),
                      strides=strides, export=export, legacy=legacy, name=name)
    if n == "OBB":
        from fce_yolo_tpu.nn import heads as H

        return H.OBB(nc=a[0], ne=a[1] if len(a) > 2 else 1, ch=tuple(a[-1]),
                     strides=strides, export=export, legacy=legacy, name=name)
    if n == "Classify":
        from fce_yolo_tpu.nn import heads as H

        return H.Classify(c2=a[1], k=a[2] if len(a) > 2 else 1,
                          s=a[3] if len(a) > 3 else 1, name=name)
    if n == "RepC3":
        return M.RepC3(c1=a[0], c2=a[1], n=a[2], e=a[3] if len(a) > 3 else 1.0, name=name)
    if n == "RepConv":
        return M.RepConv(c1=a[0], c2=a[1], k=a[2] if len(a) > 2 else 3,
                         s=a[3] if len(a) > 3 else 1, name=name)
    if n == "HGStem":
        return M.HGStem(c1=a[0], cm=a[1], c2=a[2], name=name)
    if n == "HGBlock":
        # (c1, cm, c2, k, n, lightconv, shortcut)
        return M.HGBlock(c1=a[0], cm=a[1], c2=a[2],
                         k=a[3] if len(a) > 3 else 3,
                         n=a[4] if len(a) > 4 else 6,
                         lightconv=a[5] if len(a) > 5 else False,
                         shortcut=a[6] if len(a) > 6 else False, name=name)
    if n == "AIFI":
        from fce_yolo_tpu.nn.transformer import AIFI

        return AIFI(c1=a[0], cm=a[1] if len(a) > 1 else 2048,
                    num_heads=a[2] if len(a) > 2 else 8, name=name)
    if n == "RTDETRDecoder":
        from fce_yolo_tpu.nn import heads as H

        # optional extras beyond the reference's [nc]: hd, nq, ndl (tiny
        # configs for tests / low-memory deployments)
        return H.RTDETRDecoder(
            nc=a[0], ch=tuple(a[1]),
            hd=a[2] if len(a) > 2 else 256,
            nq=a[3] if len(a) > 3 else 300,
            ndl=a[4] if len(a) > 4 else 6,
            export=export, name=name,
        )
    if n == "v10Detect":
        from fce_yolo_tpu.nn import heads as H

        return H.V10Detect(nc=a[0], ch=tuple(a[-1]), strides=strides, export=export,
                           name=name)
    if n == "C2fAttn":
        from fce_yolo_tpu.nn import world as W

        return W.C2fAttn(c1=a[0], c2=a[1], n=a[2], ec=a[3], nh=a[4],
                         gc=a[5] if len(a) > 5 else 512, name=name)
    if n == "ImagePoolingAttn":
        from fce_yolo_tpu.nn import world as W

        return W.ImagePoolingAttn(
            ec=a[0], ch=tuple(a[1]), ct=a[2] if len(a) > 2 else 512,
            nh=a[3] if len(a) > 3 else 8, k=a[4] if len(a) > 4 else 3,
            scale=a[5] if len(a) > 5 else False, name=name,
        )
    if n == "WorldDetect":
        from fce_yolo_tpu.nn import world as W

        return W.WorldDetect(
            nc=a[0], embed=a[1] if len(a) > 2 else 512,
            with_bn=a[2] if len(a) > 3 else False, ch=tuple(a[-1]),
            strides=strides, export=export, name=name,
        )
    if n == "YOLOEDetect":
        from fce_yolo_tpu.nn import yoloe as Y

        return Y.YOLOEDetect(
            nc=a[0], embed=a[1] if len(a) > 2 else 512,
            with_bn=a[2] if len(a) > 3 else True, ch=tuple(a[-1]),
            strides=strides, export=export, name=name,
        )
    if n == "YOLOESegment":
        from fce_yolo_tpu.nn import yoloe as Y

        return Y.YOLOESegment(
            nc=a[0], nm=a[1] if len(a) > 2 else 32, npr=a[2] if len(a) > 3 else 256,
            embed=a[3] if len(a) > 4 else 512, with_bn=a[4] if len(a) > 5 else True,
            ch=tuple(a[-1]), strides=strides, export=export, name=name,
        )
    if n == "TorchVision":
        from fce_yolo_tpu.nn.resnet import TorchVision

        return TorchVision(
            c2=a[0], model=a[1], weights=a[2] if len(a) > 2 else "DEFAULT",
            unwrap=a[3] if len(a) > 3 else True,
            truncate=a[4] if len(a) > 4 else 2,
            split=a[5] if len(a) > 5 else False, name=name,
        )
    if n in _POSITIONAL:
        cls = _POSITIONAL[n]
        clean = tuple(tuple(x) if isinstance(x, list) else x for x in a)
        return cls(*clean, name=name)
    if n == "BiFPN_Concat":
        return fce.BiFPN_Concat(c1=tuple(a[0]), c2=a[1], name=name)
    if n == "CoordAtt":
        return fce.CoordAtt(inp=a[0], oup=a[1], reduction=a[2], name=name)
    if n == "CoordCrossAtt":
        return fce.CoordCrossAtt(inp=a[0], oup=a[1], reduction=a[2], num_heads=a[3], name=name)
    if n == "BiCoordCrossAtt":
        return fce.BiCoordCrossAtt(inp=a[0], oup=a[1], reduction=a[2], num_heads=a[3], name=name)
    raise KeyError(f"unknown module {n!r} at layer {ls.i}")


class DetectionModel(nn.Module):
    """YAML-defined detection graph (reference DetectionModel, nn/tasks.py:339-490).

    ``__call__`` returns the Detect head's output dict:
      train=True  -> {"feats": [per-level (B,H,W,4*reg_max+nc)]}
      train=False -> {"preds": (B, N, 4+nc) decoded xywh+scores, "feats": ...}
    """

    spec: ModelSpec
    strides: tuple[int, ...] | None = None
    export: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 txt_feats: jnp.ndarray | None = None,
                 dn: dict[str, jnp.ndarray] | None = None,
                 visual_prompts: jnp.ndarray | None = None,
                 start_layer: int = 0):
        saved: dict[int, jnp.ndarray] = {}
        out: Any = x
        # start_layer > 0: x is already the output of layer start_layer-1
        # (the Pallas fused stem, ops/pallas_stem.py, computes layers 0..2
        # outside the flax graph at inference). Only valid when no skipped
        # layer's output is consumed downstream.
        if start_layer > 0:
            assert not any(i in self.spec.save for i in range(start_layer - 1)), (
                "start_layer skips layers whose outputs are consumed later"
            )
            if start_layer - 1 in self.spec.save:
                saved[start_layer - 1] = x
        # open-vocab threading (reference WorldModel.predict, tasks.py:896-940):
        # C2fAttn consumes the running (possibly ImagePoolingAttn-enhanced)
        # embeddings; WorldDetect always sees the originals
        if txt_feats is None and self.spec.needs_text:
            # open-vocab graph driven without explicit text: zero embeddings
            # (the reference keeps a random txt_feats buffer on the model;
            # zeros keep init/forward well-defined and shape-stable)
            txt_feats = jnp.zeros((1, self.spec.nc, 512), x.dtype)
        txt = txt0 = txt_feats
        for ls in self.spec.layers:
            if ls.i < start_layer:
                continue
            if ls.is_multi_input:
                # negative indices are relative to the current layer
                # (reference savelist normalization x % i, tasks.py:1738)
                inp = [out if j == -1 else saved[j % ls.i] for j in ls.f]
            else:
                inp = out if ls.f == -1 else saved[ls.f % ls.i]
            layer = make_layer(ls, self.strides, self.export, legacy=self.spec.legacy)
            if ls.name == "C2fAttn":
                out = layer(inp, txt, train=train)
            elif ls.name == "ImagePoolingAttn":
                # updates only the threaded text features; the running output
                # stays the previous layer's value (reference WorldModel
                # forward leaves x unchanged, tasks.py:893-899)
                txt = layer(inp, txt, train=train)
            elif ls.name == "WorldDetect":
                out = layer(inp, txt0, train=train)
            elif ls.name in ("YOLOEDetect", "YOLOESegment"):
                # visual prompts (B, Q, H3, W3) switch scoring to SAVPE
                # embeddings (reference YOLOEModel get_visual_pe, tasks.py)
                out = layer(inp, txt0, train=train, visual_prompts=visual_prompts)
            elif ls.name == "RTDETRDecoder" and dn is not None:
                # contrastive-denoising queries (train only; reference
                # RTDETRDetectionModel.loss builds them via get_cdn_group)
                out = layer(inp, train=train, dn_cls=dn["dn_cls"],
                            dn_bbox=dn["dn_bbox"], attn_mask=dn["dn_attn_mask"])
            else:
                out = layer(inp, train=train)
            if ls.i in self.spec.save:
                saved[ls.i] = out
        return out


def resolve_strides(spec: ModelSpec, probe: int = 256) -> tuple[int, ...]:
    """Infer per-level strides with an abstract (eval_shape) forward."""
    if spec.task == "classify":
        return ()
    if spec.layers[-1].name == "RTDETRDecoder":
        # anchor-free normalized-box head; strides only label the P3/P4/P5
        # inputs (reference RTDETRDetectionModel skips the stride probe too)
        return (8, 16, 32)
    model = DetectionModel(spec=spec, strides=None)
    txt = (
        jax.ShapeDtypeStruct((1, spec.nc, 512), jnp.float32) if spec.needs_text else None
    )

    def run(x):
        t = jnp.zeros(txt.shape, txt.dtype) if txt is not None else None
        variables = model.init(jax.random.PRNGKey(0), x, train=True, txt_feats=t)
        out, _ = model.apply(variables, x, train=True, txt_feats=t, mutable=["batch_stats"])
        return out

    shapes = jax.eval_shape(run, jax.ShapeDtypeStruct((1, probe, probe, 3), jnp.float32))
    return tuple(probe // f.shape[1] for f in shapes["feats"])


@functools.lru_cache(maxsize=32)
def _cached_spec(cfg_path: str, scale: str | None) -> ModelSpec:
    return load_model_yaml(cfg_path, scale=scale)


def build_model(
    cfg: str | dict,
    scale: str | None = None,
    nc: int | None = None,
    export: bool = False,
) -> tuple[DetectionModel, ModelSpec, tuple[int, ...]]:
    """Parse + two-phase build: probe strides abstractly, then return the
    decode-capable model. Returns (model, spec, strides)."""
    if isinstance(cfg, dict):
        spec = parse_model_yaml(dict(cfg), ch=3, scale=scale)
    else:
        spec = _cached_spec(str(cfg), scale)
    if nc is not None and nc != spec.nc:
        d = dict(spec.yaml_dict)
        d["nc"] = nc
        spec = parse_model_yaml(d, ch=3, scale=scale or spec.scale)
    strides = resolve_strides(spec)
    return DetectionModel(spec=spec, strides=strides, export=export), spec, strides


def init_variables(
    model: DetectionModel, rng: jax.Array, imgsz: int = 640, bias_prior: bool = True
) -> dict:
    """Initialize variables and apply the Detect bias priors (head.py:169-188)."""
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    txt = (
        jnp.zeros((1, model.spec.nc, 512), jnp.float32) if model.spec.needs_text else None
    )
    variables = unfreeze(model.init(rng, x, train=True, txt_feats=txt))
    head_ls = model.spec.layers[-1]
    if bias_prior and head_ls.name in ("Detect", "Segment", "Pose", "OBB"):
        prefix = f"layers_{head_ls.i}"
        if head_ls.name != "Detect":  # nested Detect submodule in task heads
            prefix += "/detect"
        variables = M.Detect.bias_init_fn(variables, model.spec.nc, model.strides, prefix)
    elif bias_prior and head_ls.name == "WorldDetect":
        # box-branch prior only (reference WorldDetect.bias_init, head.py:487)
        head = variables["params"][f"layers_{head_ls.i}"]
        for i in range(len(model.strides)):
            head[f"cv2_{i}_2"]["conv2d"]["bias"] = jnp.ones_like(
                head[f"cv2_{i}_2"]["conv2d"]["bias"]
            )
    return variables


def param_count(variables: dict) -> int:
    """Trainable parameter count (matches the reference's 'gradients' number —
    our DFL decode is parameter-free, like the frozen conv it replaces)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


def estimate_flops(model: DetectionModel, imgsz: int = 640, batch: int = 1) -> float:
    """FLOPs of one eval forward, from XLA's compiled-HLO cost analysis.

    Analog of reference ``get_flops`` (utils/torch_utils.py:390, thop-based:
    GFLOPs = 2 x MACs); XLA counts a fused multiply-add as 2 flops, so the
    numbers are directly comparable (yolo11n @640 = ~6.5e9 both ways).
    Requires a compile (~seconds); call on demand, not in hot paths.
    """
    x_s = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    v_s = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False),
        jax.random.PRNGKey(0),
    )
    compiled = (
        jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(v_s, x_s).compile()
    )
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0))


def fold_conv_bn(variables: dict) -> dict:
    """Fold every ConvBNAct's BatchNorm into its conv weights (reference
    Model.fuse / fuse_conv_and_bn, nn/tasks.py): kernel' = kernel * g/std,
    bias' = beta - mean * g/std, then drop the bn params/stats. The result
    runs under ``modules.fused_bn_scope()`` — ConvBNAct traces as a biased
    conv with no normalize op, eliminating the standalone BN kernels and
    layout copies the round-5 l/x traces surfaced.

    Only sibling ("conv", "bn") pairs are folded — exactly ConvBNAct /
    DWConvBNAct scopes; RepConv's parallel-BN branches, head-internal BNs
    and resnet BNs keep their eval-BN math (they are a negligible share of
    inference time). Returns a NEW variables dict (f64-free, f32 fold math);
    the fold is exact in f32 up to one reassociation rounding.
    """
    import numpy as np

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return p_node, s_node
        p_out, s_out = {}, {}
        keys = set(p_node) | set(s_node if isinstance(s_node, dict) else {})
        for k in keys:
            pv = p_node.get(k)
            sv = s_node.get(k) if isinstance(s_node, dict) else None
            if (
                isinstance(pv, dict)
                # EXACTLY a ConvBNAct scope: {conv, bn} and nothing else.
                # RepConv/RepVGGDW-style modules carry extra siblings
                # (cv2/conv1/...) whose BN normalizes a SUM — never fold those.
                and set(pv.keys()) == {"conv", "bn"}
                and isinstance(pv.get("conv"), dict)
                and isinstance(pv.get("bn"), dict)
                and "kernel" in pv["conv"]
                and "bias" not in pv["conv"]
                and isinstance(sv, dict)
                and isinstance(sv.get("bn"), dict)
                and "mean" in sv["bn"]
            ):
                kern = np.asarray(pv["conv"]["kernel"], np.float32)
                gamma = np.asarray(pv["bn"]["scale"], np.float32)
                beta = np.asarray(pv["bn"]["bias"], np.float32)
                mean = np.asarray(sv["bn"]["mean"], np.float32)
                var = np.asarray(sv["bn"]["var"], np.float32)
                g_std = gamma / np.sqrt(var + 1e-3)  # BN_EPS
                p_out[k] = {"conv": {
                    "kernel": (kern * g_std).astype(kern.dtype),
                    "bias": (beta - mean * g_std).astype(kern.dtype),
                }}
            elif isinstance(pv, dict) or isinstance(sv, dict):
                rp, rs = walk(pv if isinstance(pv, dict) else {},
                              sv if isinstance(sv, dict) else {})
                if rp or pv is not None:
                    p_out[k] = rp if isinstance(pv, dict) else pv
                if rs or (sv is not None and not isinstance(sv, dict)):
                    s_out[k] = rs if isinstance(sv, dict) else sv
            else:
                if pv is not None:
                    p_out[k] = pv
                if sv is not None:
                    s_out[k] = sv
        return p_out, s_out

    new_params, new_stats = walk(params, stats)
    out = dict(variables)
    # back onto the device: leaving numpy leaves here would re-upload every
    # weight on each dispatch (measured 8x slower through the axon tunnel)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, new_params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, new_stats)
    return out

"""Native-runtime export: trace the eval forward to a flat op-graph artifact.

The deployment analog of the reference's export->native-runtime story
(engine/exporter.py:141-178 + examples/YOLOv8-ONNXRuntime-CPP): instead of
translating to a third-party format, the jitted eval forward is traced to a
jaxpr — the same program XLA compiles — and serialized to a self-contained
two-file artifact:

  model.fyir   line-based text IR: tensors, op records, graph I/O
  model.fybin  raw little-endian blob of every constant (weights, BN stats,
               anchor tables), referenced by offset

``native/infer/fy_infer.cpp`` is the zero-dependency C++ interpreter that
executes the artifact (letterbox -> graph -> NMS -> scale-back, mirroring
examples/YOLOv8-ONNXRuntime-CPP/inference.cpp:1-377 semantics).

Any model built by this framework exports automatically — the op set below
covers the traced eval forwards of the detect/seg/pose model zoo; an
unsupported primitive raises at export time, never at run time.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["export_native"]

# primitives the C++ interpreter implements (native/infer/fy_infer.cpp)
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "pow",
}
_UNARY = {
    "logistic", "exp", "log", "tanh", "rsqrt", "sqrt", "neg", "sign", "erf",
    "floor", "stop_gradient", "convert_element_type", "copy", "integer_pow",
    "abs",
}
_SUPPORTED = _ELEMENTWISE | _UNARY | {
    "conv_general_dilated", "dot_general", "reshape", "transpose", "slice",
    "concatenate", "broadcast_in_dim", "squeeze", "expand_dims",
    "reduce_sum", "reduce_max", "reduce_window_max", "reduce_window_sum",
    "iota", "split", "pad", "select_n", "rev",
}


def _fmt_ints(xs) -> str:
    return ",".join(str(int(v)) for v in xs)


class _Writer:
    def __init__(self):
        self.lines: list[str] = []
        self.blob = bytearray()
        self.var_ids: dict = {}
        self.next_id = 0

    def tid(self, var) -> int:
        key = id(var)
        if key not in self.var_ids:
            self.var_ids[key] = self.next_id
            self.next_id += 1
        return self.var_ids[key]

    def fresh(self) -> int:
        i = self.next_id
        self.next_id += 1
        return i

    def const(self, arr: np.ndarray) -> int:
        i = self.fresh()
        arr = np.ascontiguousarray(arr)
        if arr.dtype != np.float32:
            arr = arr.astype(np.float32)  # int iotas/indices are exact in f32
        off = len(self.blob)
        self.blob += arr.tobytes()
        dims = _fmt_ints(arr.shape) if arr.ndim else ""
        self.lines.append(f"const {i} {arr.ndim} {dims} {off} {arr.nbytes}")
        return i


def _emit_eqn(w: _Writer, eqn, env: dict) -> None:
    """Serialize one jaxpr equation (inlining nested call primitives)."""
    from jax.extend import core

    prim = eqn.primitive.name

    def vin(v):
        if isinstance(v, core.Literal):
            return w.const(np.asarray(v.val))
        return env[v]

    # inline nested jaxprs (pjit, custom_jvp, checkpoint, custom_vjp)
    if prim in ("jit", "pjit", "closed_call", "core_call", "xla_call",
                "custom_jvp_call", "custom_vjp_call", "remat", "checkpoint",
                "custom_vjp_call_jaxpr"):
        inner = None
        for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
            if key in eqn.params:
                inner = eqn.params[key]
                break
        assert inner is not None, f"no inner jaxpr on {prim}: {list(eqn.params)}"
        ij = inner.jaxpr if hasattr(inner, "jaxpr") else inner
        consts = list(getattr(inner, "consts", []))
        ienv: dict = {}
        for cv, cval in zip(ij.constvars, consts):
            ienv[cv] = w.const(np.asarray(cval))
        for iv, ov in zip(ij.invars, eqn.invars):
            ienv[iv] = vin(ov)
        for ieqn in ij.eqns:
            _emit_eqn(w, ieqn, ienv)
        for outer, innerv in zip(eqn.outvars, ij.outvars):
            if isinstance(innerv, core.Literal):
                env[outer] = w.const(np.asarray(innerv.val))
            else:
                env[outer] = ienv[innerv]
        return

    if prim not in _SUPPORTED:
        raise NotImplementedError(
            f"primitive {prim!r} is not in the native runtime op set; "
            "extend native/infer/fy_infer.cpp and _SUPPORTED together"
        )

    ins = [vin(v) for v in eqn.invars]
    outs = []
    for ov in eqn.outvars:
        env[ov] = w.fresh()
        outs.append(env[ov])
        shape = getattr(ov.aval, "shape", ())
        w.lines.append(f"shape {env[ov]} {len(shape)} {_fmt_ints(shape)}")

    p = eqn.params
    extra = ""
    if prim == "conv_general_dilated":
        dn = p["dimension_numbers"]
        lhs_spec = "".join(str(d) for d in dn.lhs_spec)
        rhs_spec = "".join(str(d) for d in dn.rhs_spec)
        out_spec = "".join(str(d) for d in dn.out_spec)
        pad = ";".join(f"{a},{b}" for a, b in p["padding"])
        extra = (
            f"strides={_fmt_ints(p['window_strides'])} pad={pad} "
            f"lhs_dil={_fmt_ints(p['lhs_dilation'])} rhs_dil={_fmt_ints(p['rhs_dilation'])} "
            f"groups={p['feature_group_count']} lhs_spec={lhs_spec} "
            f"rhs_spec={rhs_spec} out_spec={out_spec}"
        )
    elif prim == "dot_general":
        (lc, rc), (lb, rb) = p["dimension_numbers"]
        extra = (
            f"lc={_fmt_ints(lc) or '-'} rc={_fmt_ints(rc) or '-'} "
            f"lb={_fmt_ints(lb) or '-'} rb={_fmt_ints(rb) or '-'}"
        )
    elif prim in ("reshape", "broadcast_in_dim"):
        if prim == "broadcast_in_dim":
            extra = f"bdims={_fmt_ints(p['broadcast_dimensions']) or '-'}"
    elif prim == "transpose":
        extra = f"perm={_fmt_ints(p['permutation'])}"
    elif prim == "slice":
        strides = p["strides"] or [1] * len(p["start_indices"])
        extra = (
            f"start={_fmt_ints(p['start_indices'])} limit={_fmt_ints(p['limit_indices'])} "
            f"stride={_fmt_ints(strides)}"
        )
    elif prim == "concatenate":
        extra = f"dim={p['dimension']}"
    elif prim in ("reduce_sum", "reduce_max"):
        extra = f"axes={_fmt_ints(p['axes'])}"
    elif prim in ("squeeze", "expand_dims"):
        extra = f"dims={_fmt_ints(p['dimensions']) or '-'}"
    elif prim in ("reduce_window_max", "reduce_window_sum"):
        pad = ";".join(f"{a},{b}" for a, b in p["padding"])
        extra = (
            f"win={_fmt_ints(p['window_dimensions'])} "
            f"strides={_fmt_ints(p['window_strides'])} pad={pad}"
        )
    elif prim == "iota":
        extra = f"dim={p['dimension']}"
    elif prim == "split":
        extra = f"sizes={_fmt_ints(p['sizes'])} axis={p['axis']}"
    elif prim == "pad":
        cfg = ";".join(f"{lo},{hi},{im}" for lo, hi, im in p["padding_config"])
        extra = f"cfg={cfg}"
    elif prim == "rev":
        extra = f"dims={_fmt_ints(p['dimensions'])}"
    elif prim == "integer_pow":
        extra = f"y={p['y']}"

    w.lines.append(
        f"eqn {prim} {len(ins)} {' '.join(map(str, ins))} "
        f"{len(outs)} {' '.join(map(str, outs))} {extra}".rstrip()
    )


def export_native(model, variables: dict, path: str | Path, imgsz: int = 640,
                  task: str | None = None) -> Path:
    """Trace the eval forward at (1, imgsz, imgsz, 3) and write
    ``<path>.fyir`` + ``<path>.fybin``.

    Per task (auto-detected from the model spec, like the reference's
    task-aware Exporter, engine/exporter.py:208) the artifact carries:

    - detect/obb: preds (1, A, 4+nc[+1])
    - segment:    preds (1, A, 4+nc+nm) AND proto (1, Hp, Wp, nm)
    - pose:       preds (1, A, 4+nc+nk*nd) with decoded keypoints appended
    - classify:   probs (1, nc)

    plus a ``meta`` line (task, nc, kpt shape) so the C++ runtime
    (native/infer/fy_infer.cpp) can postprocess without guessing — the
    analog of the reference's sidecar metadata recovery
    (nn/autobackend.py:71). Returns the .fyir path. Weights are baked as
    constants — the artifact is a frozen deployment snapshot, like an
    exported .onnx.
    """
    import jax
    import jax.numpy as jnp

    spec = getattr(model, "spec", None)
    if task is None:
        task = spec.task if spec is not None else "detect"

    if task == "classify":
        def f(x):
            return (model.apply(variables, x, train=False)["probs"],)
    elif task == "segment":
        def f(x):
            out = model.apply(variables, x, train=False)
            return (out["preds"], out["proto"])
    else:  # detect / pose / obb — single preds tensor
        def f(x):
            return (model.apply(variables, x, train=False)["preds"],)

    closed = jax.make_jaxpr(f)(jnp.zeros((1, imgsz, imgsz, 3), jnp.float32))
    jaxpr = closed.jaxpr

    w = _Writer()
    env: dict = {}
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        env[cv] = w.const(np.asarray(cval))
    assert len(jaxpr.invars) == 1
    in_id = w.fresh()
    env[jaxpr.invars[0]] = in_id
    meta = f"meta task={task}"
    if spec is not None:
        meta += f" nc={spec.nc}"
        if task == "pose":
            kpt = spec.yaml_dict.get("kpt_shape", [17, 3])
            meta += f" kpt={int(kpt[0])},{int(kpt[1])}"
    w.lines.append(meta)
    w.lines.append(f"input {in_id} 4 1,{imgsz},{imgsz},3")

    for eqn in jaxpr.eqns:
        _emit_eqn(w, eqn, env)

    for out_var in jaxpr.outvars:
        w.lines.append(f"output {env[out_var]}")

    path = Path(path)
    ir = path.with_suffix(".fyir")
    ir.write_text("FYIR 1\n" + "\n".join(w.lines) + "\n")
    path.with_suffix(".fybin").write_bytes(bytes(w.blob))
    return ir

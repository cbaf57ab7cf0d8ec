"""Pallas fused narrow-conv stem: normalize + Conv(s2) + Conv(s2) + C3k2.

Why this kernel exists (EVIDENCE.md round-3 fifth block): XLA's
narrow-channel conv emitters relayout every conv->conv edge of the first
three YOLO11 layers (~820 MB/step of pure copy kernels at m/640/b32, ~5 ms
of a 33 ms e2e inference step), and the plan is not reachable from JAX —
TPU layout flags don't parse under this client. The idea: hold the entire
narrow stage in VMEM — ONE Pallas kernel reads the uint8 image and writes
only the C3k2 output (stride 4), eliminating the normalize buffer, the
input relayout, both stride-2 conv round-trips and every C3k2-interior HBM
tensor.

STATUS — measured WIN (round 4, real v5e chip; full trail in
EVIDENCE.md): e2e inference A/B at 640/b32 with identical preds:
yolo11s 26.22 -> 15.11 ms (1.74x, 144% of the baseline graph's
bytes-accessed roofline) and yolo11m 33.00 -> 28.44 ms (1.16x, 92% of
roofline, from 79%). Enabled by default for eligible graphs (first three
layers = Conv s2 / Conv s2 / C3k2 e=0.25, c2 % 128 == 0 — i.e. s and
up); disable with FY_NO_FUSED_STEM=1 or fused_stem=False.

Maps the reference graph exactly (inference, BN folded):
  L0: Conv c0 3x3 s2   (ultralytics yolo11.yaml backbone row 0)
  L1: Conv c1 3x3 s2   (row 1)
  L2: C3k2(c2, e=0.25) (row 2) — inner blocks are plain Bottleneck(e=0.5)
      at n/s scales, C3k (two e=1.0 bottlenecks between 1x1s) at m/l/x
      (the parser's forced c3k=True, reference tasks.py:1611-1614)
/255 normalization is folded into L0's weights; each Conv+BN+SiLU is a
folded matmul + bias + SiLU (reference conv.py:39-91 forward_fuse).

TPU design notes (hard-won Mosaic findings, each measured by compile
probe — see EVIDENCE.md round 4):
- Mosaic's layout inference rejects lane regroupings below 128 lanes
  (reshape (T, W*3)->(T, W/2, 6): "unsupported shape cast"), concats whose
  operands carry layout offsets from prior row/channel slices ("offset
  mismatch on non-concat dimension"), 2D broadcasts, and HBM DMA slices
  not 128-lane aligned. Group-128 regroups, 3D shifts/concats of offset-0
  tensors, and (T, W, C)->(T*W, C) flattens all compile.
- The kernel therefore NEVER regroups lanes or slices channels:
  * the uint8 image is space-to-depth-by-4 packed in XLA into
    (B, H/4 + halo pad, W/4, 48->128 zero-padded channels); s2d rows
    outside the image are exactly zero, so the conv boundary conditions
    need no in-kernel cases;
  * L0 (3x3 s2) = two matmuls over the 2x2-block window (K = 512) with
    scatter-padded weights, producing two phase-PAIR tensors (N = 2*c0);
  * L1 (3x3 s2) selects phases through zero-padded WEIGHT rows over
    [colshift(pair) | pair] taps (K = 4*c0 per dy), never slicing lanes;
  * C3k2's stride-1 3x3s are 3 dy-sliced matmuls over lane-concatenated
    col shifts (K = 3*C); 1x1 splits use weight-column matmuls.
- grid (B,): per image, a double-buffered fori_loop pipeline over row
  tiles (prefetch next input DMA, compute, async output staging).
- out-of-image rows are re-zeroed after every conv stage (a conv's padded
  input must be zero AT ITS OWN resolution); W edges inherit zeros from
  the shifted-concat construction; tile-edge halo garbage provably cannot
  reach the output window (halo = chain receptive field).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

BN_EPS = 1e-3  # reference BatchNorm2d eps (modules.py BN_MOMENTUM/BN_EPS)


@dataclass(frozen=True)
class StemSpec:
    """Static shape/arch info for the fused stem (one YOLO11-family scale)."""

    H: int  # input image height (e.g. 640)
    W: int  # input image width
    c0: int  # L0 out channels
    c1: int  # L1 out channels
    c2: int  # C3k2 out channels
    ch: int  # C3k2 hidden width c = int(c2 * 0.25)
    n: int = 1  # C3k2 inner-block repeats (depth-scaled)
    c3k: bool = False  # inner block is C3k (m/l/x) vs plain Bottleneck (n/s)
    tile_h: int = 20  # output rows (H/4 res) per grid program
    stages: int = 9  # perf-ablation knob: 0=DMA+cast, 1=+L0, 2=+L1, 9=full

    @property
    def h4(self) -> int:
        return self.H // 4

    @property
    def w4(self) -> int:
        return self.W // 4

    @property
    def halo(self) -> int:
        """160-res halo: one row per 3x3 conv in the inner chain."""
        return self.n * (4 if self.c3k else 2)

    @property
    def t2(self) -> int:  # 160-res rows computed per tile
        return self.tile_h + 2 * self.halo

    @property
    def t_l0(self) -> int:  # L0 phase-tensor rows (block index space)
        return self.t2 + 1

    @property
    def t_in(self) -> int:  # s2d-4 input rows per tile (block index space)
        return self.t2 + 2


def fold_conv_bn(params: dict, stats: dict, normalize: bool = False):
    """Conv kernel [kh,kw,cin,cout] (or [cin,cout] for 1x1) + BN ->
    (W', b') with BN folded; L0 also folds the /255 normalization.
    jnp ops throughout so folding can run inside the predict jit (it is a
    handful of scalar-vector ops on weight-sized arrays — XLA CSEs it)."""
    k = jnp.asarray(params["conv"]["kernel"], jnp.float32)
    if "bias" in params["conv"]:
        # variables already BN-folded (nn.model.fold_conv_bn) — pass through
        w, b = k, jnp.asarray(params["conv"]["bias"], jnp.float32)
    else:
        g = jnp.asarray(params["bn"]["scale"], jnp.float32)
        beta = jnp.asarray(params["bn"]["bias"], jnp.float32)
        mean = jnp.asarray(stats["bn"]["mean"], jnp.float32)
        var = jnp.asarray(stats["bn"]["var"], jnp.float32)
        s = g * jax.lax.rsqrt(var + BN_EPS)
        w = k * s  # broadcast over cout (last axis)
        b = beta - mean * s
    if normalize:
        w = w / 255.0
    return w.reshape(-1, w.shape[-1]), b[None]  # matmul form, (dy,dx,cin) rows


def fold_stem_params(variables: dict, spec: StemSpec) -> list:
    """Extract + fold layers 0..2 into the kernel's flat bf16 weight list.

    Layout: [w0, b0, w1, b1, wc1, bc1, <inner blocks>, wc2, bc2] where each
    inner block contributes:
      plain Bottleneck: wb1 (9ch, ch/2), bb1, wb2 (9ch/2, ch), bb2
      C3k: wk1 (ch, c_), bk1, wk2 (ch, c_), bk2,
           {wbj1 (9c_, c_), bbj1, wbj2 (9c_, c_), bbj2} x2,
           wk3 (2c_, ch), bk3          (c_ = ch // 2)
    """
    p, st = variables["params"], variables.get("batch_stats", {})
    # pre-folded variables (nn.model.fold_conv_bn) have no bn stats; the
    # per-scope helper passes folded conv weights straight through
    empty: dict = {}
    out = []
    out += fold_conv_bn(p["layers_0"], st.get("layers_0", empty), normalize=True)
    out += fold_conv_bn(p["layers_1"], st.get("layers_1", empty))
    l2p, l2s = p["layers_2"], st.get("layers_2", empty)
    out += fold_conv_bn(l2p["cv1"], l2s.get("cv1", empty))
    for i in range(spec.n):
        bp, bs = l2p[f"m_{i}"], l2s.get(f"m_{i}", empty)
        if spec.c3k:
            out += fold_conv_bn(bp["cv1"], bs.get("cv1", empty))
            out += fold_conv_bn(bp["cv2"], bs.get("cv2", empty))
            for j in range(2):
                ip, isd = bp[f"m_{j}"], bs.get(f"m_{j}", empty)
                out += fold_conv_bn(ip["cv1"], isd.get("cv1", empty))
                out += fold_conv_bn(ip["cv2"], isd.get("cv2", empty))
            out += fold_conv_bn(bp["cv3"], bs.get("cv3", empty))
        else:
            out += fold_conv_bn(bp["cv1"], bs.get("cv1", empty))
            out += fold_conv_bn(bp["cv2"], bs.get("cv2", empty))
    out += fold_conv_bn(l2p["cv2"], l2s.get("cv2", empty))
    return [jnp.asarray(a, jnp.bfloat16) for a in out]


def _n_inner_arrays(spec: StemSpec) -> int:
    return (14 if spec.c3k else 4) * spec.n


# --------------------------------------------------------------------------
# pure-jnp reference of the folded stem (correctness oracle + CPU fallback)
# --------------------------------------------------------------------------

def _conv(x, w, b, stride, kh):
    """NHWC conv from the folded matmul-form weight (kh*kh*cin, cout)."""
    cin = x.shape[-1]
    cout = w.shape[-1]
    k4 = w.reshape(kh, kh, cin, cout).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k4, (stride, stride),
        [(kh // 2, kh // 2)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b[0].astype(jnp.float32)
    return jax.nn.silu(y)


def stem_reference_jnp(x_u8: jnp.ndarray, folded: list, spec: StemSpec) -> jnp.ndarray:
    """Same math as the kernel, expressed as plain XLA convs (f32)."""
    w0, b0, w1, b1, wc1, bc1 = folded[:6]
    x = x_u8.astype(jnp.float32)  # /255 folded into w0
    y = _conv(x, w0, b0, 2, 3)
    y = _conv(y, w1, b1, 2, 3)
    y = _conv(y, wc1, bc1, 1, 1)
    c = spec.ch
    ys = [y[..., :c], y[..., c:]]
    idx = 6
    for _ in range(spec.n):
        if spec.c3k:
            wk1, bk1, wk2, bk2 = folded[idx: idx + 4]
            a = _conv(ys[-1], wk1, bk1, 1, 1)
            bb = _conv(ys[-1], wk2, bk2, 1, 1)
            for j in range(2):
                w1_, b1_, w2_, b2_ = folded[idx + 4 + 4 * j: idx + 8 + 4 * j]
                z = _conv(a, w1_, b1_, 1, 3)
                z = _conv(z, w2_, b2_, 1, 3)
                a = a + z
            wk3, bk3 = folded[idx + 12: idx + 14]
            ys.append(_conv(jnp.concatenate([a, bb], -1), wk3, bk3, 1, 1))
            idx += 14
        else:
            wb1, bb1, wb2, bb2 = folded[idx: idx + 4]
            z = _conv(ys[-1], wb1, bb1, 1, 3)
            z = _conv(z, wb2, bb2, 1, 3)
            ys.append(ys[-1] + z)
            idx += 4
    wc2, bc2 = folded[idx: idx + 2]
    return _conv(jnp.concatenate(ys, -1), wc2, bc2, 1, 1)


# --------------------------------------------------------------------------
# the Pallas kernel
# --------------------------------------------------------------------------

def _silu(x):
    return x * jax.nn.sigmoid(x)


def _mm(a, w, b):
    """(M, K) @ (K, N) + bias, f32 accumulate, SiLU, back to bf16."""
    y = jnp.dot(a, w[:], preferred_element_type=jnp.float32)
    return _silu(y + b[0].astype(jnp.float32)).astype(jnp.bfloat16)


def _row_mask(x, base, hi):
    """Zero rows whose global index base+i falls outside [0, hi)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
    return jnp.where((rows >= 0) & (rows < hi), x, jnp.zeros_like(x))


@functools.lru_cache(maxsize=8)
def _w0_scatter_rows(_: int = 0) -> tuple:
    """Per-phase source-row index (length 192) into the natural L0 weight
    (27 rows, order (dy, dx, cin)) for the 2x2-block window matmul; row 27
    addresses an appended zero row (unused block-phase taps).

    Window lane = (bdy*2 + bdx)*128 + (ry*4 + rx)*3 + cin (the s2d image
    is zero-padded 48 -> 128 channels: HBM DMA slices must be 128-lane
    aligned). For output phase
    (py, px): dy = ry - 2*py + 1 (bdy=1) or ry - 2*py - 3 (bdy=0), valid
    when 0 <= dy <= 2; same for dx."""
    import numpy as _np

    def off(rblk, bphase, ophase):
        d = rblk - 2 * ophase + (1 if bphase == 1 else -3)
        return d if 0 <= d <= 2 else None

    out = []
    for py in range(2):
        for px in range(2):
            rows = _np.full((512,), 27, _np.int64)
            for bdy in range(2):
                for bdx in range(2):
                    for ry in range(4):
                        for rx in range(4):
                            dy = off(ry, bdy, py)
                            dx = off(rx, bdx, px)
                            if dy is None or dx is None:
                                continue
                            for cin in range(3):
                                lane = (bdy * 2 + bdx) * 128 + (ry * 4 + rx) * 3 + cin
                                rows[lane] = (dy * 3 + dx) * 3 + cin
            out.append(rows)
    return tuple(out)


def _scatter_w0(w0: jnp.ndarray, b0: jnp.ndarray) -> tuple:
    """(27, c0) natural weight -> (512, 4*c0) block-window weight producing
    the four phase outputs channel-grouped, + tiled bias (1, 4*c0)."""
    w0_ext = jnp.concatenate([w0, jnp.zeros((1, w0.shape[1]), w0.dtype)], axis=0)
    cols = [w0_ext[jnp.asarray(rows)] for rows in _w0_scatter_rows()]
    return jnp.concatenate(cols, axis=1), jnp.concatenate([b0] * 4, axis=1)


def _conv3_s1(x3, w9, b, cin):
    """Stride-1 3x3 conv on (T, W, cin) via 3 dy-sliced matmuls (K = 3cin)."""
    left = jnp.concatenate([jnp.zeros_like(x3[:, :1]), x3[:, :-1]], axis=1)
    right = jnp.concatenate([x3[:, 1:], jnp.zeros_like(x3[:, :1])], axis=1)
    pw = jnp.concatenate([left, x3, right], axis=-1)  # (T, W, 3cin)
    zero = jnp.zeros_like(pw[:1])
    up = jnp.concatenate([zero, pw[:-1]], axis=0)  # row i -> x[i-1]
    dn = jnp.concatenate([pw[1:], zero], axis=0)  # row i -> x[i+1]
    t_rows, w_img = x3.shape[0], x3.shape[1]
    k3 = 3 * cin
    m = t_rows * w_img
    w9v = w9[:]
    acc = jnp.dot(up.reshape(m, k3), w9v[:k3], preferred_element_type=jnp.float32)
    acc += jnp.dot(pw.reshape(m, k3), w9v[k3: 2 * k3], preferred_element_type=jnp.float32)
    acc += jnp.dot(dn.reshape(m, k3), w9v[2 * k3:], preferred_element_type=jnp.float32)
    cout = w9v.shape[-1]
    return _silu(acc + b[0].astype(jnp.float32)).astype(jnp.bfloat16).reshape(
        t_rows, w_img, cout)


def _colshift(a):
    """Shift the W dim right by one (out[:, w] = a[:, w-1], zero at w=0)."""
    return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)


def _stem_kernel(spec: StemSpec, x_hbm, *refs):
    """One grid program per IMAGE: a double-buffered pipeline over row
    tiles (the guide's double-buffering pattern). Per tile: prefetch the
    next tile's input DMA, compute, stage the output and DMA it out
    asynchronously — hiding the HBM DMA latency that dominated the naive
    one-program-per-tile version (measured 3.8 ms of pure DMA wait at
    s/640/b32 before this restructure).

    ``x_hbm`` is the space-to-depth-by-4 uint8 image, PRE-PADDED in XLA
    with halo+2 zero rows on top, halo below, and channels 48 -> 128
    (s2d rows outside the image are exactly zero, so boundary handling
    needs no in-kernel cases): (B, H/4 + 2*halo + 2, W/4, 128), channel
    c' = (ry*4 + rx)*3 + cin.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nw = 8 + _n_inner_arrays(spec)
    w0s, b0s, w1, b1, wc1, bc1 = refs[:6]
    inner = refs[6: nw - 2]
    wc2, bc2 = refs[nw - 2: nw]
    out_hbm = refs[nw]
    in_scr, out_scr, sem_in, sem_out = refs[nw + 1: nw + 5]

    b = pl.program_id(0)
    n_t = spec.h4 // spec.tile_h  # static

    th, t2, t_l0, t_in = spec.tile_h, spec.t2, spec.t_l0, spec.t_in
    W4, H4 = spec.w4, spec.h4
    c0, c1, c2, ch = spec.c0, spec.c1, spec.c2, spec.ch

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * th, t_in)], in_scr.at[slot], sem_in.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            out_scr.at[slot], out_hbm.at[b, pl.ds(t * th, th)], sem_out.at[slot])

    in_dma(0, 0).start()

    def body(t, carry):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_t)
        def _():
            in_dma(1 - slot, t + 1).start()

        in_dma(slot, t).wait()
        res = _compute_tile(spec, in_scr[slot], t,
                            (w0s, b0s, w1, b1, wc1, bc1, inner, wc2, bc2))

        if spec.stages == -2:  # perf ablation: in-DMA only, single out write
            @pl.when(t == 0)
            def _():
                out_scr[0] = res
                out_dma(0, 0).start()
            return carry

        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        out_scr[slot] = res
        out_dma(slot, t).start()
        return carry

    jax.lax.fori_loop(0, n_t, body, 0)
    if spec.stages == -2:
        out_dma(0, 0).wait()
        return
    out_dma((n_t - 1) % 2, n_t - 1).wait()
    if n_t > 1:
        out_dma((n_t - 2) % 2, n_t - 2).wait()


def _compute_tile(spec: StemSpec, x_u8_tile, t, weights):
    """Compute one (tile_h, W4, c2) output slab from the padded s2d input
    tile (t_in, W4, 128)."""
    w0s, b0s, w1, b1, wc1, bc1, inner, wc2, bc2 = weights
    th, t2, t_l0, t_in = spec.tile_h, spec.t2, spec.t_l0, spec.t_in
    W4, H4 = spec.w4, spec.h4
    c0, c1, c2, ch = spec.c0, spec.c1, spec.c2, spec.ch
    s2_ = t * th - spec.halo  # first 160-res row computed in this tile
    s_l0 = s2_ - 1  # first L0 phase row (block index space)

    # /255 folded into w0. Mosaic has no direct u8->bf16 cast; chain
    # through int32/f32 (free on the VPU datapath).
    x = x_u8_tile.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    if spec.stages in (-1, -2):  # perf ablation: DMA + write only (1-row cast)
        xr1 = x_u8_tile[0:1].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        xr = jnp.concatenate([xr1[:, :, 0:min(128, c2)]] * th, axis=0)
        reps = -(-c2 // xr.shape[-1])
        return jnp.concatenate([xr] * reps, axis=-1)[..., :c2]

    if spec.stages == 0:  # perf ablation: DMA + cast only
        xr = x[0:th, :, 0:min(128, c2)]
        reps = -(-c2 // xr.shape[-1])
        return jnp.concatenate([xr] * reps, axis=-1)[..., :c2]

    # --- L0: 2x2-block-window matmuls -> two phase-PAIR tensors ----------
    # L0 phase row li (global s_l0+li) reads input block rows {li, li+1}.
    # Two matmuls with N = 2*c0 (wide MXU output): pair_py = [p_py0|p_py1]
    # channel-concatenated. Mosaic cannot concat operands whose layout
    # carries a lane offset, so the per-phase tensors are never sliced out;
    # L1 instead selects phases through zero-padded WEIGHT rows.
    a0 = x[0:t_l0]  # block row i-1  (bdy=0)
    a1 = x[1: t_l0 + 1]  # block row i  (bdy=1)
    p = jnp.concatenate([_colshift(a0), a0, _colshift(a1), a1], axis=-1)
    pm = p.reshape(t_l0 * W4, 512)
    w0v, b0v = w0s[:], b0s[0].astype(jnp.float32)
    pairs = []
    for py in range(2):
        g = py * 2 * c0
        acc = jnp.dot(pm, w0v[:, g: g + 2 * c0],
                      preferred_element_type=jnp.float32)
        yg = _silu(acc + b0v[g: g + 2 * c0]).astype(jnp.bfloat16)
        pairs.append(_row_mask(yg.reshape(t_l0, W4, 2 * c0), s_l0, H4))
    pair0, pair1 = pairs  # [p_py_px0 | p_py_px1]

    if spec.stages == 1:  # perf ablation: through L0
        xr = (pair0 + pair1)[0:th]
        reps = -(-c2 // (2 * c0))
        return jnp.concatenate([xr] * reps, axis=-1)[..., :c2]

    # --- L1: 3x3 s2 c0 -> c1 from the pair tensors ------------------------
    # out row j (local lj, global s2_+lj): tap dy=-1 -> (py=1, i=j-1 ->
    # L0 local lj); dy=0 -> (py=0, i=j -> lj+1); dy=+1 -> (py=1, lj+1).
    # taps_full = [colshift(pair) | pair] (4*c0 lanes, offset-0 operands);
    # w1e (built in fused_stem) holds the natural (dx, cin) rows scattered
    # into the used lane blocks: dx=-1 -> colshift(p_px1) = [c0:2c0],
    # dx=0 -> p_px0 = [2c0:3c0], dx=+1 -> p_px1 = [3c0:4c0]; [0:c0] zero.
    taps_p0 = jnp.concatenate([_colshift(pair0), pair0], axis=-1)
    taps_p1 = jnp.concatenate([_colshift(pair1), pair1], axis=-1)
    m = t2 * W4
    k4 = 4 * c0
    w1v = w1[:]  # (3*4c0, c1) stacked by dy
    acc = jnp.dot(taps_p1[0:t2].reshape(m, k4), w1v[:k4],
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(taps_p0[1: t2 + 1].reshape(m, k4), w1v[k4: 2 * k4],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(taps_p1[1: t2 + 1].reshape(m, k4), w1v[2 * k4:],
                   preferred_element_type=jnp.float32)
    y1 = _silu(acc + b1[0].astype(jnp.float32)).astype(jnp.bfloat16).reshape(t2, W4, c1)
    y1 = _row_mask(y1, s2_, H4)

    if spec.stages == 2:  # perf ablation: through L1
        xr = y1[0:th]
        reps = -(-c2 // c1)
        return jnp.concatenate([xr] * reps, axis=-1)[..., :c2]

    # --- C3k2 -------------------------------------------------------------
    # cv1's two output halves as separate matmuls (weight column slices) —
    # offset-0 tensors for the downstream shifted convs (see L0 note)
    y1f = y1.reshape(t2 * W4, c1)
    wc1v, bc1v = wc1[:], bc1[0].astype(jnp.float32)
    ya = _silu(jnp.dot(y1f, wc1v[:, :ch], preferred_element_type=jnp.float32)
               + bc1v[:ch]).astype(jnp.bfloat16).reshape(t2, W4, ch)
    yb = _silu(jnp.dot(y1f, wc1v[:, ch:], preferred_element_type=jnp.float32)
               + bc1v[ch:]).astype(jnp.bfloat16).reshape(t2, W4, ch)
    ys = [_row_mask(ya, s2_, H4), _row_mask(yb, s2_, H4)]
    idx = 0
    for _ in range(spec.n):
        if spec.c3k:
            c_ = ch // 2
            wk1, bk1, wk2, bk2 = inner[idx: idx + 4]
            a3 = _mm(ys[-1].reshape(t2 * W4, ch), wk1, bk1).reshape(t2, W4, c_)
            a3 = _row_mask(a3, s2_, H4)
            b3 = _mm(ys[-1].reshape(t2 * W4, ch), wk2, bk2).reshape(t2, W4, c_)
            b3 = _row_mask(b3, s2_, H4)
            for j in range(2):
                wj1, bj1, wj2, bj2 = inner[idx + 4 + 4 * j: idx + 8 + 4 * j]
                z = _conv3_s1(a3, wj1, bj1, c_)
                z = _row_mask(z, s2_, H4)
                z = _conv3_s1(z, wj2, bj2, c_)
                z = _row_mask(z, s2_, H4)
                a3 = a3 + z
            wk3, bk3 = inner[idx + 12: idx + 14]
            cat3 = jnp.concatenate([a3, b3], axis=-1)
            y = _mm(cat3.reshape(t2 * W4, 2 * c_), wk3, bk3).reshape(t2, W4, ch)
            ys.append(_row_mask(y, s2_, H4))
            idx += 14
        else:
            hh = ch // 2
            wb1, bb1, wb2, bb2 = inner[idx: idx + 4]
            z = _conv3_s1(ys[-1], wb1, bb1, ch)
            z = _row_mask(z, s2_, H4)
            z = _conv3_s1(z, wb2, bb2, hh)
            z = _row_mask(z, s2_, H4)
            ys.append(ys[-1] + z)
            idx += 4
    cat = jnp.concatenate(ys, axis=-1)  # (t2, W4, (2+n)ch)
    win = cat[spec.halo: spec.halo + th]  # output window [r0, r0+th)
    out = _mm(win.reshape(th * W4, (2 + spec.n) * ch), wc2, bc2)
    return out.reshape(th, W4, c2)


def fused_stem(x_u8: jnp.ndarray, folded: list, spec: StemSpec,
               interpret: bool = False) -> jnp.ndarray:
    """Run the fused stem: uint8 NHWC (B, H, W, 3) -> bf16 (B, H/4, W/4, c2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x_u8.shape[0]
    assert x_u8.dtype == jnp.uint8 and x_u8.shape[1:] == (spec.H, spec.W, 3)
    assert spec.h4 % spec.tile_h == 0, (spec.h4, spec.tile_h)
    n_t = spec.h4 // spec.tile_h
    # space-to-depth by 4 (one XLA transpose of the u8 tensor): the kernel
    # then never regroups lanes; c' = (ry*4 + rx)*3 + cin. The pad fuses
    # three needs into one op: 128-lane DMA alignment (48 -> 128 channels)
    # and the kernel's top/bottom zero halos (s2d rows outside the image
    # ARE zero, so boundary handling needs no in-kernel cases).
    h4, w4 = spec.h4, spec.w4
    x_s2d = x_u8.reshape(B, h4, 4, w4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    x_s2d = x_s2d.reshape(B, h4, w4, 48)
    x_s2d = jnp.pad(x_s2d, ((0, 0), (spec.halo + 2, spec.halo), (0, 0), (0, 80)))
    w0s, b0s = _scatter_w0(folded[0], folded[1])
    # L1 weight: natural (9c0, c1) rows (dy, dx, cin) -> (3*4c0, c1) with
    # the dx taps scattered into the taps_full lane blocks (kernel L1 note)
    c0, c1 = spec.c0, spec.c1
    w1n = folded[2]
    zblk = jnp.zeros((c0, c1), w1n.dtype)
    w1e = jnp.concatenate(
        [blk for dy in range(3)
         for blk in (zblk, w1n[(dy * 3) * c0: (dy * 3 + 1) * c0],
                     w1n[(dy * 3 + 1) * c0: (dy * 3 + 2) * c0],
                     w1n[(dy * 3 + 2) * c0: (dy * 3 + 3) * c0])], axis=0)
    folded = [w0s, b0s, w1e, *folded[3:]]

    kernel = functools.partial(_stem_kernel, spec)
    nw = 8 + _n_inner_arrays(spec)
    flops = 2 * B * (
        spec.H // 2 * spec.W // 2 * 27 * spec.c0
        + spec.h4 * spec.w4 * (9 * spec.c0 * spec.c1 + spec.c1 * 2 * spec.ch
                               + (2 + spec.n) * spec.ch * spec.c2 + 4000)
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nw,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, spec.h4, spec.w4, spec.c2), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, spec.t_in, spec.w4, 128), jnp.uint8),
            pltpu.VMEM((2, spec.tile_h, spec.w4, spec.c2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_u8.size + 2 * B * spec.h4 * spec.w4 * spec.c2,
            transcendentals=B * spec.H // 2 * spec.W // 2 * spec.c0,
        ),
        interpret=interpret,
    )(x_s2d, *folded)
    return out


def apply_with_fused_stem(model, variables: dict, images_u8: jnp.ndarray,
                          stem_spec: StemSpec, **apply_kw):
    """Full inference forward with the fused Pallas stem: uint8 images in,
    the model's usual output dict out. Layers 0..2 (+ /255 normalize) run in
    the Pallas kernel; the rest of the graph resumes at start_layer=3.
    Weight folding runs in-graph (cheap, weight-sized)."""
    folded = fold_stem_params(variables, stem_spec)
    y = fused_stem(images_u8, folded, stem_spec)
    return model.apply(variables, y, train=False, start_layer=3, **apply_kw)


def stem_spec_from_model(spec, imgsz: tuple[int, int],
                         include_unprofitable: bool = False) -> StemSpec | None:
    """Return a StemSpec when the model's first three layers match the
    fusable pattern (Conv k3 s2, Conv k3 s2, C3k2 e=0.25) AND the kernel
    is measured profitable there, else None.

    Measured on the real chip (EVIDENCE.md round 4): single-repeat stems
    win e2e (s 1.74x, m 1.16x); the double-repeat C3k stems at l/x lose
    (standalone stem 31.4 ms/b32 at l vs ~13 ms XLA stage share — the 8
    stride-1 window builds dominate). ``include_unprofitable=True`` returns
    the spec anyway (benchmarking/experiments).

    ``spec`` is the parser ModelSpec (args already scale-resolved).
    """
    try:
        l0, l1, l2 = spec.layers[0], spec.layers[1], spec.layers[2]
    except (AttributeError, IndexError):
        return None
    if [l0.name, l1.name, l2.name] != ["Conv", "Conv", "C3k2"]:
        return None
    if list(l0.args[2:4]) != [3, 2] or list(l1.args[2:4]) != [3, 2]:
        return None
    if len(l0.args) > 7 and l0.args[7] is not True:
        return None  # non-SiLU activation
    if any(i in spec.save for i in (0, 1)):
        return None
    a2 = list(l2.args)  # (c1, c2, n, c3k, e, ...)
    n = int(a2[2]) if len(a2) > 2 else 1
    c3k = bool(a2[3]) if len(a2) > 3 else False
    e = float(a2[4]) if len(a2) > 4 else 0.5
    if abs(e - 0.25) > 1e-6:
        return None
    h, w = imgsz
    if h % 4 or w % 4:
        return None
    c0, c1_, c2_ = int(l0.args[1]), int(l1.args[1]), int(a2[1])
    ch = int(c2_ * 0.25)
    if ch % 2 or (c3k and (ch // 2) % 2):
        return None
    if c2_ % 128:  # output HBM blocks must be 128-lane aligned (s and up)
        return None
    if n > 1 and not include_unprofitable:
        return None  # measured loss at l/x (see docstring)
    if w // 4 > 160 and c3k and not include_unprofitable:
        # 1280px A/B (round 5): s (plain Bottleneck, halo 2) wins 1.161x;
        # m (C3k, halo 4 -> tile 4 under the vmem cap) loses 0.914x
        return None
    h4 = h // 4
    w4 = w // 4
    halo = n * (4 if c3k else 2)
    # big halos (c3k x2 at l/x) blow up per-tile VMEM; prefer smaller tiles
    prefs = (20, 16, 10, 8, 5, 4, 2, 1) if halo <= 4 else (10, 8, 16, 5, 4, 2, 1)
    # per-tile VMEM scales with (tile + 2*halo) * w4: at 1280px (w4=320) the
    # 640px tile sizes blow the 16M scoped-vmem limit (measured: tile 20 at
    # s/1280 asks 29.25M). Cap total tile rows by width, anchored at the
    # proven 640px budget (24 rows x 160 lanes-width).
    max_rows = max(1, (24 * 160) // w4 - 2 * halo) if w4 > 160 else 10**9
    tile = next((t for t in prefs if h4 % t == 0 and t <= max_rows), None)
    if tile is None:
        return None
    return StemSpec(H=h, W=w, c0=c0, c1=c1_, c2=c2_, ch=ch, n=n, c3k=c3k,
                    tile_h=tile)

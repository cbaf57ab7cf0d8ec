"""Probe: does int8 conv/dot hit the v5e MXU's int8 mode (2x bf16 peak)?

Times bf16 vs int8 variants of representative YOLO conv shapes and a large
dot, pipelined like bench.py. Decides whether an int8 PTQ serving path is
worth building. Run alone on the real chip: python tools/probe_int8.py
"""

from __future__ import annotations

import time

import numpy as np


def _rt(jax, jnp):
    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    return (time.perf_counter() - t0) / 10


def bench_fn(jax, fn, args, iters=48, rt=0.0):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            acc = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(acc)[0]).ravel()[0]
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    rt = _rt(jax, jnp)
    print(f"roundtrip {rt * 1e3:.1f} ms")
    rng = np.random.RandomState(0)

    # representative conv shapes (NHWC), yolo11 mid/late stages at batch 128
    conv_shapes = [
        ((128, 80, 80, 64), (3, 3, 64, 128), (2, 2)),
        ((128, 40, 40, 128), (3, 3, 128, 128), (1, 1)),
        ((128, 20, 20, 256), (3, 3, 256, 256), (1, 1)),
    ]
    dn = ("NHWC", "HWIO", "NHWC")
    for xs, ws, strides in conv_shapes:
        x = jnp.asarray(rng.randn(*xs), jnp.bfloat16)
        w = jnp.asarray(rng.randn(*ws), jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 127, xs), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 127, ws), jnp.int8)

        f_bf = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, strides, "SAME", dimension_numbers=dn).sum())
        t_bf = bench_fn(jax, f_bf, (x, w), rt=rt)

        try:
            f_i8 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
                x, w, strides, "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32).sum())
            t_i8 = bench_fn(jax, f_i8, (xq, wq), rt=rt)
        except Exception as e:
            t_i8 = float("nan")
            print(f"conv int8 failed: {type(e).__name__}: {str(e)[:200]}")

        flops = 2 * np.prod(xs[:3]) * ws[0] * ws[1] * ws[2] * ws[3] / (strides[0] * strides[1])
        print(f"conv {xs}x{ws}s{strides}: bf16 {t_bf * 1e3:.2f} ms ({flops / t_bf / 1e12:.1f} TF/s), "
              f"int8 {t_i8 * 1e3:.2f} ms ({flops / t_i8 / 1e12:.1f} TOP/s)")

    # big dot
    M = N = K = 8192
    a = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    b = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    aq = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
    bq = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)
    f_bf = jax.jit(lambda a, b: (a @ b).sum())
    t_bf = bench_fn(jax, f_bf, (a, b), iters=24, rt=rt)
    f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).sum())
    t_i8 = bench_fn(jax, f_i8, (aq, bq), iters=24, rt=rt)
    fl = 2 * M * N * K
    print(f"dot 8192^3: bf16 {t_bf * 1e3:.2f} ms ({fl / t_bf / 1e12:.1f} TF/s), "
          f"int8 {t_i8 * 1e3:.2f} ms ({fl / t_i8 / 1e12:.1f} TOP/s)")


if __name__ == "__main__":
    main()

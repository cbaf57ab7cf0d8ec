"""Automatic batch-size selection (reference utils/autobatch.py:16-45).

The reference binary-searches CUDA memory with a polyfit. On TPU we can do
better: XLA reports exact per-executable memory via compiled.memory_analysis(),
so the search compiles the train/infer step at a probe batch, reads the
HBM requirement, and scales linearly (activations dominate and scale ~linearly
in batch) to the target memory fraction — no OOM-and-retry loop.
"""

from __future__ import annotations

__all__ = ["autobatch", "device_memory_bytes"]


def device_memory_bytes() -> int:
    """HBM capacity of device 0 (fallback 16 GiB for v5e-class chips)."""
    import jax

    d = jax.devices()[0]
    try:
        stats = d.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024**3


def autobatch(
    make_fn,
    example_batch_fn,
    probe_batch: int = 8,
    fraction: float = 0.8,
    max_batch: int = 1024,
) -> int:
    """Pick the largest power-of-two batch fitting ``fraction`` of HBM.

    Args:
        make_fn: batch_size -> jittable fn (closed over params).
        example_batch_fn: batch_size -> abstract args tuple (ShapeDtypeStructs ok).
        probe_batch: batch used for the memory-analysis compile.

    Returns the chosen batch size.
    """
    import jax

    fn = make_fn(probe_batch)
    args = example_batch_fn(probe_batch)
    compiled = jax.jit(fn).lower(*args).compile()
    mem = None
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            mem = (
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
                + getattr(ma, "generated_code_size_in_bytes", 0)
            )
    except Exception:
        pass
    if not mem:
        return probe_batch  # analysis unavailable -> keep the probe size

    budget = device_memory_bytes() * fraction
    per_item = mem / probe_batch
    n = int(budget / per_item)
    b = 1
    while b * 2 <= min(n, max_batch):
        b *= 2
    return max(b, 1)

"""Optimizer construction + LR/momentum schedules.

Parity target: reference engine/trainer.py:915-974 (3 param groups:
decayed weights / norm weights no-decay / biases no-decay with higher
warmup LR), warmup interpolation (trainer.py:407-417), cosine & linear
final-LR schedules (trainer.py lf), auto-optimizer pick (SGD if >10k
iterations else AdamW with the lr-fit equation).

Expressed as a single optax chain: parameter-group behavior comes from
masked weight decay + a bias-specific warmup schedule, momentum warmup via
``optax.inject_hyperparams``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class OptimCfg(NamedTuple):
    optimizer: str = "auto"  # SGD | AdamW | Adam | RMSProp | auto
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    cos_lr: bool = False
    nbs: int = 64  # nominal batch size for decay scaling
    batch_size: int = 16
    epochs: int = 100
    steps_per_epoch: int = 100
    nc: int = 80
    grad_clip_norm: float = 10.0
    # reduced-precision optimizer state (VERDICT r4 weak #7 experiment):
    # first-moment / momentum accumulators stored bf16 (second moment stays
    # f32 — rsqrt needs the mantissa). Measured: state traffic is <0.1% of
    # train-step bytes at n-scale, so this is a memory-footprint lever for
    # very large models, not a step-time lever (EVIDENCE.md round 5).
    state_bf16: bool = False


def accumulate_steps(cfg: OptimCfg) -> int:
    """Micro-batches per optimizer step (reference trainer.py:342:
    accumulate = max(round(nbs / batch_size), 1))."""
    return max(round(cfg.nbs / cfg.batch_size), 1)


def boundary_schedule(cfg: OptimCfg):
    """Reference warmup accumulate-RAMP as static per-micro-step arrays.

    The reference interpolates ``accumulate`` from 1 to nbs/batch over the
    warmup span and fires the optimizer when ``ni - last_opt_step >=
    accumulate`` (trainer.py:368,405-437) — so early training updates every
    batch, not every nbs/batch batches. Returns (boundaries, ni_of_step):

    - ``boundaries``: bool[total_ni], True where micro-step ni commits an
      optimizer step;
    - ``ni_of_step``: int[n_opt_steps_padded], the ni at which optimizer
      step s fires — the LR/momentum schedules (defined over ni) index this
      to stay on the reference's curve under the variable-rate ramp.

    Both are trace-time constants (precomputed host-side), so the jitted
    train step just indexes them with ``state.step`` — no dynamic control
    flow. Round-5 motivation: with static accumulate, a 160-batch run takes
    20 optimizer steps where the reference takes ~60, measurably slowing
    convergence on short runs (EVIDENCE round 5, convergence-parity study).
    """
    import numpy as np

    acc_full = accumulate_steps(cfg)
    nb = max(cfg.steps_per_epoch, 1)
    total = max(cfg.epochs * nb, 1)
    nw = max(round(cfg.warmup_epochs * nb), 100) if cfg.warmup_epochs > 0 else -1
    bounds = np.zeros((total,), bool)
    ni_of_step = []
    last = -1
    for ni in range(total):
        acc = acc_full
        if ni <= nw:
            acc = max(1, int(round(np.interp(ni, [0, nw], [1, acc_full]))))
        if ni - last >= acc:
            bounds[ni] = True
            ni_of_step.append(ni)
            last = ni
    # pad the map so any step index (e.g. resumed runs past the horizon)
    # clamps to the final cosine position
    pad = total + acc_full + 1
    while len(ni_of_step) < pad:
        ni_of_step.append(total - 1 if ni_of_step else 0)
    return bounds, np.asarray(ni_of_step, np.int32)


def resolve_auto(cfg: OptimCfg) -> OptimCfg:
    """'auto' optimizer pick (trainer.py:933-941): SGD for long runs, AdamW
    with lr = 0.002*5/(4+nc) for short ones; bias warmup LR zeroed for Adam."""
    if cfg.optimizer != "auto":
        return cfg
    iterations = cfg.epochs * cfg.steps_per_epoch
    if iterations > 10000:
        return cfg._replace(optimizer="SGD", lr0=0.01, momentum=0.9)
    lr_fit = round(0.002 * 5 / (4 + cfg.nc), 6)
    return cfg._replace(optimizer="AdamW", lr0=lr_fit, momentum=0.9, warmup_bias_lr=0.0)


def _final_lr_fraction(cfg: OptimCfg, epoch_frac: jnp.ndarray) -> jnp.ndarray:
    """lf(epoch): linear 1->lrf, or cosine (trainer.py _setup_scheduler)."""
    if cfg.cos_lr:
        return cfg.lrf + (1 - cfg.lrf) * (1 + jnp.cos(math.pi * epoch_frac)) / 2
    return (1 - epoch_frac) * (1 - cfg.lrf) + cfg.lrf


def lr_schedule(cfg: OptimCfg, bias: bool = False) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-step LR: warmup interp from 0 (or warmup_bias_lr for biases) to
    lr0 * lf(epoch), then the epoch-wise decay curve (trainer.py:407-417)."""
    nb = cfg.steps_per_epoch
    nw = max(round(cfg.warmup_epochs * nb), 100) if cfg.warmup_epochs > 0 else -1

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / nb)
        epoch_frac = jnp.clip(epoch / max(cfg.epochs - 1, 1), 0.0, 1.0)
        base = cfg.lr0 * _final_lr_fraction(cfg, epoch_frac)
        if nw <= 0:
            return base
        start = cfg.warmup_bias_lr if bias else 0.0
        w = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, start + w * (base - start), base)

    return sched


def momentum_schedule(cfg: OptimCfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    nb = cfg.steps_per_epoch
    nw = max(round(cfg.warmup_epochs * nb), 100) if cfg.warmup_epochs > 0 else -1

    def sched(step):
        if nw <= 0:
            return jnp.asarray(cfg.momentum)
        w = jnp.clip(jnp.asarray(step, jnp.float32) / nw, 0.0, 1.0)
        return cfg.warmup_momentum + w * (cfg.momentum - cfg.warmup_momentum)

    return sched


def _param_group_masks(params) -> tuple[Any, Any, Any]:
    """(decay_mask, norm_mask, bias_mask) following trainer.py:943-953:
    biases -> no decay, higher warmup lr; BN scales -> no decay; conv/dense
    kernels -> decay."""

    def classify(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "bias":  # conv/BN biases (reference g[2])
            return "bias"
        if name == "scale":  # BatchNorm scale (reference g[1])
            return "norm"
        return "decay"  # kernels + BiFPN fusion weights (reference g[0])

    labels = jax.tree_util.tree_map_with_path(classify, params)
    mk = lambda tag: jax.tree_util.tree_map(lambda l: l == tag, labels)
    return mk("decay"), mk("norm"), mk("bias")


def freeze_mask(params, freeze: int | list | None) -> Any:
    """True for parameters that must NOT update (reference trainer.py:275-295:
    freeze = first-N layer indices or an explicit list; the reference's
    always-frozen `.dfl` has no parameters here). List entries may mix layer
    indices with strings: a path substring freezes matching params, and an
    ``"except:<substring>"`` entry freezes EVERYTHING whose path does not
    match (reference YOLOEVPTrainer: freeze all, unfreeze `.savpe`)."""
    if freeze is None:
        idxs: set[int] = set()
        subs: list[str] = []
    elif isinstance(freeze, int):
        idxs = set(range(freeze))
        subs = []
    else:
        idxs = {int(i) for i in freeze if not isinstance(i, str)}
        subs = [s for s in freeze if isinstance(s, str)]
    excepts = [s[len("except:"):] for s in subs if s.startswith("except:")]
    subs = [s for s in subs if not s.startswith("except:")]
    names = {f"layers_{i}" for i in idxs}

    def tag(path, leaf):
        full = "/".join(str(getattr(p, "key", p)) for p in path)
        if excepts and not any(e in full for e in excepts):
            return True
        top = str(getattr(path[0], "key", path[0]))
        return top in names or any(s in full for s in subs)

    return jax.tree_util.tree_map_with_path(tag, params)


def build_optimizer(
    cfg: OptimCfg, params, freeze: int | list[int] | None = None,
    ni_map=None,
) -> optax.GradientTransformation:
    """One optax chain reproducing the reference's 3-group optimizer.

    Weight decay is scaled by batch_size*accumulate/nbs (trainer.py:343) and
    applied only to non-norm, non-bias weights; biases get the
    warmup_bias_lr ramp. ``freeze`` zeroes updates for the given layer
    indices (reference layer-freeze semantics as masked updates).

    ``ni_map`` (from :func:`boundary_schedule`) maps optimizer-step index ->
    the micro-batch counter ni at which it fires, keeping the ni-defined
    LR/momentum curves exact under the reference's warmup accumulate ramp;
    without it the static mapping ni = s * accumulate is used.
    """
    cfg = resolve_auto(cfg)
    accumulate = accumulate_steps(cfg)
    decay = cfg.weight_decay * cfg.batch_size * accumulate / cfg.nbs
    decay_mask, _, bias_mask = _param_group_masks(params)
    nonbias_mask = jax.tree_util.tree_map(lambda b: not b, bias_mask)

    lr_main = lr_schedule(cfg, bias=False)
    lr_bias = lr_schedule(cfg, bias=True)
    _mom = momentum_schedule(cfg)
    if ni_map is not None:
        _ni_arr = jnp.asarray(ni_map, jnp.int32)
        to_ni = lambda s: jnp.take(
            _ni_arr, jnp.clip(jnp.asarray(s, jnp.int32), 0, _ni_arr.shape[0] - 1))
    else:
        to_ni = lambda s: s * accumulate  # optimizer-step -> micro-batch count
    mom = lambda s: _mom(to_ni(s))
    decay_tx = optax.masked(optax.add_decayed_weights(decay), decay_mask)

    name = cfg.optimizer.lower()
    mu_dtype = jnp.bfloat16 if cfg.state_bf16 else None
    if name in ("adamw", "adam", "nadam", "radam", "adamax"):
        # torch-AdamW style: coupled grad transform then decoupled decay
        pre = [optax.inject_hyperparams(
            lambda b1: optax.scale_by_adam(b1=b1, b2=0.999, mu_dtype=mu_dtype)
        )(b1=mom)]
        post = [decay_tx]
    elif name == "sgd":
        # torch-SGD: decay folds into the gradient before momentum
        pre = [
            decay_tx,
            optax.inject_hyperparams(lambda decay_m: optax.trace(
                decay_m, nesterov=True, accumulator_dtype=mu_dtype
            ))(decay_m=mom),
        ]
        post = []
    elif name == "rmsprop":
        pre = [decay_tx, optax.scale_by_rms(), optax.inject_hyperparams(
            lambda decay_m: optax.trace(decay_m)
        )(decay_m=mom)]
        post = []
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    # updates stay in +gradient space until the final per-group -lr scaling.
    # scale_by_schedule counts OPTIMIZER steps; the warmup/decay curves are
    # defined over integrated micro-batches (reference ni), so the counter is
    # multiplied back by `accumulate` when gradient accumulation is active.
    chain = [
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        *pre,
        *post,
        optax.masked(optax.scale_by_schedule(lambda s: -lr_main(to_ni(s))), nonbias_mask),
        optax.masked(optax.scale_by_schedule(lambda s: -lr_bias(to_ni(s))), bias_mask),
    ]
    if freeze is not None and (freeze if isinstance(freeze, int) else len(freeze)):
        chain.append(optax.masked(optax.set_to_zero(), freeze_mask(params, freeze)))
    return optax.chain(*chain)


class EMA(NamedTuple):
    """Exponential moving average of params with ramped decay
    (reference utils/torch_utils.py:606-650: d = decay*(1-exp(-updates/tau))).

    ``create(dtype=jnp.bfloat16)`` stores the average reduced-precision
    (update math stays f32, storage rounds to the EMA dtype). Caution: at
    decay 0.9999 the per-step increment (1-d)*(p-e) is far below bf16's
    ~2^-8 relative ulp once e ~ p, so a bf16 EMA quantizes the average —
    fine as a memory-footprint lever, measured-neutral for step time
    (state traffic <0.1% of step bytes; EVIDENCE.md round 5) and validated
    for convergence on the tiny-dataset harness (tools/convergence_parity).
    """

    params: Any
    updates: jnp.ndarray

    @staticmethod
    def create(params, dtype=None) -> "EMA":
        cast = (lambda p: jnp.asarray(p, dtype)) if dtype is not None else jnp.array
        return EMA(params=jax.tree_util.tree_map(cast, params), updates=jnp.int32(0))

    def update(self, new_params, decay: float = 0.9999, tau: float = 2000.0) -> "EMA":
        updates = self.updates + 1
        d = decay * (1 - jnp.exp(-updates.astype(jnp.float32) / tau))
        ema = jax.tree_util.tree_map(
            lambda e, p: (e.astype(jnp.float32) * d
                          + p.astype(jnp.float32) * (1 - d)).astype(e.dtype),
            self.params, new_params,
        )
        return EMA(params=ema, updates=updates)

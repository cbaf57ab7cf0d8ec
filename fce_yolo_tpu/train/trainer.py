"""Functional training engine.

The reference's BaseTrainer (engine/trainer.py:115-974) is an imperative
epoch/batch loop with DDP subprocess relaunch, AMP GradScaler, EMA, NaN
recovery and checkpointing. The TPU-native design:

- **One jitted train_step** over a `jax.sharding.Mesh` — data parallelism is
  batch-dim sharding (NamedSharding); XLA inserts the gradient all-reduce
  over ICI. No process relaunch, no NCCL, no GradScaler (bf16 needs no loss
  scaling).
- **All mutable training state is one pytree** (params, batch_stats,
  optimizer state, EMA, WIoU EMA scalar, step) — checkpointable with orbax
  in one call, donate-able for in-place updates.
- NaN recovery (trainer.py:856-886) becomes a pure `jnp.where` rollback:
  if the new loss is non-finite the step returns the previous state.
- Warmup/accumulate scheduling is folded into the optax schedules
  (train/optim.py); mosaic-close and early-stop live in the host loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fce_yolo_tpu.train.loss import DetectionLossCfg, LossState, detection_loss
from fce_yolo_tpu.train.optim import EMA, OptimCfg, build_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMA
    loss_state: LossState
    step: jnp.ndarray  # int32
    grad_accum: Any = None  # params-like grad buffer when accumulating, else None

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def ema_variables(self) -> dict:
        return {"params": self.ema.params, "batch_stats": self.batch_stats}


def create_train_state(
    model, variables: dict, tx: optax.GradientTransformation, accumulate: int = 1,
    ema_dtype=None,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema=EMA.create(params, dtype=ema_dtype),
        loss_state=LossState.init(),
        step=jnp.int32(0),
        grad_accum=(
            jax.tree_util.tree_map(jnp.zeros_like, params) if accumulate > 1 else None
        ),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: DetectionLossCfg,
    ema_decay: float = 0.9999,
    task_loss: Callable | None = None,
    bf16: bool = False,
    accumulate: int = 1,
    remat: bool | str = False,
    frozen_bn: bool = False,
    boundaries=None,
) -> Callable:
    """Build the jittable train step: forward -> loss -> grad -> update ->
    EMA, with NaN-rollback (reference _handle_nan_recovery analog).

    ``task_loss(out, batch, cfg, state) -> (total, parts, new_state)``
    overrides the default detection loss (segment/pose/obb; train/task_losses).

    ``bf16`` runs the network forward/backward in bfloat16 with f32 master
    weights (the AMP analog, reference trainer.py:306-308 — no GradScaler
    needed: bf16 has the f32 exponent range). The loss itself stays f32.

    ``accumulate`` > 1 enables true gradient accumulation to the nominal
    batch size (reference trainer.py:342-344,410,435: grads are SUMMED over
    ``accumulate`` micro-batches — the loss is already batch-sum scaled —
    and the optimizer + EMA step fires only on accumulation boundaries).
    The state must be created with the same ``accumulate``.

    ``frozen_bn`` runs BatchNorm in eval mode inside the loss graph (running
    stats, never updated). This is the deterministic train step: without the
    training-BN backward's chaotic sensitivity to reduction order, sharded
    and single-device multi-step trajectories match to float tolerance —
    the well-posed strong form of the DDP loss-parity contract (reference
    trainer.py:429-430). Used by dryrun_multichip / test_mesh_train.

    ``remat`` trades recompute for HBM on the backward pass via
    ``jax.checkpoint`` around the network forward — the lever for scaling
    batch size past the activation-memory knee (the reference has no analog;
    torch calls this activation checkpointing). ``True`` rematerializes
    everything (~1.3x forward compute, minimal activation residency); a
    string names a ``jax.checkpoint_policies`` entry (e.g.
    ``"dots_saveable"`` keeps matmul outputs resident).
    """

    def _apply(apply_params, batch_stats, img, mkw):
        if frozen_bn:
            out = model.apply(
                {"params": apply_params, "batch_stats": batch_stats},
                img,
                train=False,
                **mkw,
            )
            return out, {"batch_stats": batch_stats}
        return model.apply(
            {"params": apply_params, "batch_stats": batch_stats},
            img,
            train=True,
            mutable=["batch_stats"],
            **mkw,
        )

    if remat:
        policy = getattr(jax.checkpoint_policies, remat) if isinstance(remat, str) else None
        _apply = jax.checkpoint(_apply, policy=policy)

    def loss_fn(params, batch_stats, batch, loss_state):
        img = batch["img"]
        if img.dtype == jnp.uint8:  # normalize on device: 4x smaller host->device copy
            img = img.astype(jnp.float32) / 255.0
        apply_params = params
        if bf16:
            apply_params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
            img = img.astype(jnp.bfloat16)
        mkw = {}
        if "dn_cls" in batch:  # RT-DETR contrastive-denoising queries
            mkw["dn"] = {k: batch[k] for k in ("dn_cls", "dn_bbox", "dn_attn_mask")}
        if "txt_feats" in batch:  # multimodal: per-batch sampled text embeddings
            mkw["txt_feats"] = batch["txt_feats"]
        if "visual_prompts" in batch:  # yoloe: GT-driven SAVPE prompt masks
            mkw["visual_prompts"] = batch["visual_prompts"]
        out, updates = _apply(apply_params, batch_stats, img, mkw)
        if bf16:  # loss math in f32 for stable reductions; BN stats stay f32
            out = jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), out)
            updates = {"batch_stats": jax.tree_util.tree_map(
                lambda t: t.astype(jnp.float32), updates["batch_stats"])}
        if task_loss is not None:
            total, parts, new_loss_state = task_loss(out, batch, loss_cfg, loss_state)
        else:
            total, parts, new_loss_state = detection_loss(
                out["feats"], batch, loss_cfg, loss_state
            )
        return total, (updates["batch_stats"], parts, new_loss_state)

    def train_step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        (total, (new_bs, parts, new_ls)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, state.loss_state)

        if accumulate > 1:
            # summed-gradient accumulation; optimizer fires on boundaries.
            # With `boundaries` (train/optim.boundary_schedule) the fire
            # pattern follows the reference's warmup accumulate RAMP
            # (trainer.py:368,405-437: every batch early, every nbs/batch
            # batches after warmup); the static modulo is the fallback.
            acc = jax.tree_util.tree_map(jnp.add, state.grad_accum, grads)
            if boundaries is not None:
                _b = jnp.asarray(boundaries, bool)
                boundary = jnp.take(
                    _b, jnp.clip(state.step, 0, _b.shape[0] - 1))
            else:
                boundary = (state.step + 1) % accumulate == 0
            updates, opt_cand = tx.update(acc, state.opt_state, state.params)
            params_cand = optax.apply_updates(state.params, updates)
            sel = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(boundary, n, o), new, old
            )
            new_params = sel(params_cand, state.params)
            new_opt = sel(opt_cand, state.opt_state)
            ema_cand = state.ema.update(params_cand, decay=ema_decay)
            new_ema = EMA(sel(ema_cand.params, state.ema.params),
                          jnp.where(boundary, ema_cand.updates, state.ema.updates))
            new_accum = sel(jax.tree_util.tree_map(jnp.zeros_like, acc), acc)
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema.update(new_params, decay=ema_decay)
            new_accum = None

        # NaN/Inf rollback: keep the previous weights if the step exploded
        finite = jnp.isfinite(total)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_state = TrainState(
            params=keep(new_params, state.params),
            batch_stats=keep(new_bs, state.batch_stats),
            opt_state=keep(new_opt, state.opt_state),
            ema=EMA(keep(new_ema.params, state.ema.params), new_ema.updates),
            loss_state=keep(new_ls, state.loss_state),
            step=state.step + 1,
            grad_accum=keep(new_accum, state.grad_accum) if accumulate > 1 else None,
        )
        metrics = {"loss": total, "finite": finite.astype(jnp.float32), **parts}
        return new_state, metrics

    return train_step


@dataclass
class TrainCfg:
    epochs: int = 100
    batch_size: int = 16
    imgsz: int = 640
    optim: OptimCfg = field(default_factory=OptimCfg)
    loss: DetectionLossCfg = field(default_factory=DetectionLossCfg)
    ema_decay: float = 0.9999
    patience: int = 100  # early-stop epochs without fitness improvement
    close_mosaic: int = 10


class EarlyStopping:
    """Fitness-plateau early stop (reference utils/torch_utils.py:857-907)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float | None) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_fitness = fitness
            self.best_epoch = epoch
        return (epoch - self.best_epoch) >= self.patience


def fit(
    model,
    variables: dict,
    data_iter_fn: Callable[[int], Iterable[dict]],
    cfg: TrainCfg,
    mesh=None,
    eval_fn: Callable[[TrainState, int], float] | None = None,
    callbacks: Any = None,
    log_every: int = 50,
) -> tuple[TrainState, list[dict]]:
    """Host-side epoch loop around the jitted train step.

    Args:
        data_iter_fn: epoch -> iterable of batches {"img": (B,H,W,3) float,
            "cls": (B,M), "bboxes": (B,M,4) norm-xywh, "mask": (B,M)}.
            The epoch argument lets datasets implement mosaic-close.
        mesh: optional jax.sharding.Mesh for data parallelism; batches are
            sharded over the 'dp' axis, state is replicated.
        eval_fn: optional (state, epoch) -> fitness for early stopping.

    Returns:
        (final TrainState, per-epoch history dicts).
    """
    from fce_yolo_tpu.utils.callbacks import CallbackList

    cbs = callbacks or CallbackList()
    tx = build_optimizer(cfg.optim, variables["params"])
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx, cfg.loss, cfg.ema_decay)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("dp"))
        state = jax.device_put(state, repl)
        batch_shardings = {"img": data_sh, "cls": data_sh, "bboxes": data_sh, "mask": data_sh}
        step_fn = jax.jit(step_fn, donate_argnums=0, out_shardings=(repl, repl))
    else:
        batch_shardings = None
        step_fn = jax.jit(step_fn, donate_argnums=0)

    stopper = EarlyStopping(cfg.patience)
    history: list[dict] = []
    cbs.fire("on_train_start", trainer=None)
    for epoch in range(cfg.epochs):
        cbs.fire("on_train_epoch_start", trainer=None)
        t0 = time.time()
        agg: dict[str, float] = {}
        n_batches = 0
        for batch in data_iter_fn(epoch):
            if batch_shardings is not None:
                batch = {
                    k: jax.device_put(v, batch_shardings.get(k, batch_shardings["img"]))
                    for k, v in batch.items()
                }
            state, metrics = step_fn(state, batch)
            n_batches += 1
            if n_batches % log_every == 0:
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
        row = {k: v / max(n_batches // log_every, 1) for k, v in agg.items()}
        row.update(epoch=epoch, time=time.time() - t0)
        fitness = eval_fn(state, epoch) if eval_fn else None
        if fitness is not None:
            row["fitness"] = fitness
        history.append(row)
        cbs.fire("on_fit_epoch_end", trainer=None)
        if stopper(epoch, fitness):
            break
    cbs.fire("on_train_end", trainer=None)
    return state, history

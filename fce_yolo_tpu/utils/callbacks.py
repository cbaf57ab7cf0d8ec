"""Callback hook registry.

Parity target: reference utils/callbacks/base.py:10-200 — the same 26 hook
points (13 train / 4 val / 5 predict / 2 export + teardown) so integration
sinks (tensorboard, csv, ...) can be ported against a stable contract.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable

HOOKS = (
    # train
    "on_pretrain_routine_start",
    "on_pretrain_routine_end",
    "on_train_start",
    "on_train_epoch_start",
    "on_train_batch_start",
    "optimizer_step",
    "on_before_zero_grad",
    "on_train_batch_end",
    "on_train_epoch_end",
    "on_fit_epoch_end",
    "on_model_save",
    "on_train_end",
    "on_params_update",
    "teardown",
    # val
    "on_val_start",
    "on_val_batch_start",
    "on_val_batch_end",
    "on_val_end",
    # predict
    "on_predict_start",
    "on_predict_batch_start",
    "on_predict_batch_end",
    "on_predict_postprocess_end",
    "on_predict_end",
    # export
    "on_export_start",
    "on_export_end",
)


class CallbackList:
    """Ordered per-hook callback fan-out."""

    def __init__(self):
        self._cbs: dict[str, list[Callable]] = defaultdict(list)

    def add(self, hook: str, fn: Callable) -> None:
        if hook not in HOOKS:
            raise KeyError(f"unknown hook {hook!r}; valid: {HOOKS}")
        self._cbs[hook].append(fn)

    def fire(self, hook: str, **kwargs: Any) -> None:
        for fn in self._cbs.get(hook, ()):
            fn(**kwargs)

    def merge(self, other: "CallbackList") -> None:
        for hook, fns in other._cbs.items():
            self._cbs[hook].extend(fns)

"""Checkpoint / resume / warm-start (reference §6.4 semantics on orbax).

Three paths, mirroring the reference:
  * periodic full train-state checkpoints + restore-latest on restart
    (tf.train.Saver/Supervisor -> orbax CheckpointManager, async)
  * warm start `from_detection_checkpoint: true` — restore every matching
    detector parameter from a previous detection checkpoint
  * warm start `from_detection_checkpoint: false` — restore only the
    backbone from a classification checkpoint (ImageNet init)

Like the reference's variables_helper.get_variables_available_in_checkpoint,
warm start silently skips variables that are absent or shape-mismatched
and reports counts.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5,
             keep_every_n_hours: float = 0.0) -> ocp.CheckpointManager:
    import datetime

    # train_config.keep_checkpoint_every_n_hours (reference tf.train.Saver
    # option): checkpoints older than max_to_keep survive pruning at this
    # time interval.
    keep_interval = (
        datetime.timedelta(hours=float(keep_every_n_hours))
        if keep_every_n_hours else None
    )
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            keep_time_interval=keep_interval,
            enable_async_checkpointing=True,
        ),
    )


class CheckpointManager:
    """Thin wrapper owning the orbax manager for a train dir."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 keep_every_n_hours: float = 0.0):
        self.directory = os.path.abspath(directory)
        self._mgr = _manager(directory, max_to_keep, keep_every_n_hours)

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None,
                params_only: bool = False):
        """Restore into the structure of `state` (shapes must match).

        params_only: restore just step/params/batch_stats — for eval and
        export, whose TrainState may carry a different optimizer structure
        than the training run (reference eval never restores optimizer
        slots either)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        target = _to_pytree(state)
        if params_only:
            keep = ("step", "params", "batch_stats", "ema_params")
            target = {k: target[k] for k in keep if k in target}
        # partial_restore: an eval-mode model has no MTL aux heads, but
        # train checkpoints do — restore the intersection (reference
        # semantics: aux heads are training-only, eval restores what it
        # needs)
        restored = self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(item=target, partial_restore=True)
        )
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            **(
                {"ema_params": restored["ema_params"]}
                if "ema_params" in restored and restored["ema_params"] is not None
                else {}
            ),
            **({} if params_only else {"opt_state": restored["opt_state"]}),
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _to_pytree(state) -> Dict[str, Any]:
    out = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    # EMA of params travels with the checkpoint when enabled (reference
    # optimizer use_moving_average); key absent otherwise so old
    # checkpoints stay restorable
    if getattr(state, "ema_params", None) is not None:
        out["ema_params"] = state.ema_params
    return out


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten_into(target: Dict, flat: Dict[Tuple[str, ...], Any]):
    for path, value in flat.items():
        node = target
        for key in path[:-1]:
            node = node[key]
        node[path[-1]] = value


def restore_warm_start(
    variables: Dict[str, Any],
    checkpoint_path: str,
    from_detection_checkpoint: bool = True,
) -> Tuple[Dict[str, Any], int, int]:
    """Copy matching leaves from a saved checkpoint into `variables`.

    Returns (new_variables, num_restored, num_skipped). When
    from_detection_checkpoint is False only subtrees whose top-level name
    contains 'backbone' are considered (the reference's classification-
    checkpoint mode restores the feature extractor only).
    """
    ckpt = ocp.StandardCheckpointer().restore(os.path.abspath(checkpoint_path))
    # accept either a raw variables dict or a full train-state pytree
    source = ckpt
    if isinstance(ckpt, dict) and "params" in ckpt:
        source = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})}
    flat_src = _flatten(source)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy tree
    new_vars = jax.device_get(new_vars)
    flat_dst = _flatten(new_vars)
    restored = skipped = 0
    updates = {}
    for path, dst in flat_dst.items():
        if not from_detection_checkpoint and not any("backbone" in p for p in path):
            continue
        src = flat_src.get(path)
        if src is None or tuple(np.shape(src)) != tuple(np.shape(dst)):
            skipped += 1
            continue
        updates[path] = np.asarray(src)
        restored += 1
    _unflatten_into(new_vars, updates)
    return new_vars, restored, skipped


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    """One-shot save of a variables dict (used by export + tests)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(variables), force=True)
    ckptr.wait_until_finished()  # StandardCheckpointer saves async

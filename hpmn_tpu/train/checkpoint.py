"""Checkpoint/resume via orbax.

Reference equivalent: ``tf.train.Saver`` best-val-AUC snapshots
(SURVEY.md §2.1 "Checkpointing", §5.4). TPU-idiomatic extensions:

- saves params + optimizer state + step + the data-iterator position, so a
  preempted run resumes exactly (auto-resume-from-latest on restart =
  preemption tolerance, SURVEY.md §5.3);
- keeps best-k by val AUC via orbax's ``best_fn`` mode;
- the per-user HPMN memory store (serving state, [P §4.5]) uses the same
  manager through :func:`save_user_memory`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep_best_k: int = 3,
                 async_checkpointing: bool = False):
        """``async_checkpointing=True`` (config ``train.async_checkpoint``)
        overlaps the disk write with subsequent train steps: orbax copies
        device buffers to host synchronously inside ``save`` (so later
        parameter updates cannot corrupt the snapshot) and commits the
        write on a background thread. ``restore``/``close`` barrier on any
        in-flight save."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        self._async = async_checkpointing
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_best_k,
                best_fn=lambda m: m.get("val_auc", 0.0),
                best_mode="max",
                enable_async_checkpointing=async_checkpointing,
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any,
             loader_state: Dict,
             metrics: Optional[Dict[str, float]] = None) -> None:
        """``metrics=None`` saves WITHOUT metrics: orbax's best-k GC only
        ranks metric-carrying checkpoints, so a metrics-less snapshot
        survives regardless of its quality and becomes ``latest_step()`` —
        the shape a graceful-preemption save needs (a preemption snapshot
        carrying a worse val_auc than the kept best-k would be deleted
        at save time, verified empirically)."""
        state = {
            "params": params,
            "opt_state": opt_state,
            "loader": dict(loader_state),
            "step": step,
        }
        kwargs = {}
        if metrics is not None:
            kwargs["metrics"] = {k: float(v) for k, v in metrics.items()}
        self._mngr.save(step, args=ocp.args.StandardSave(state), **kwargs)
        if not self._async:
            self._mngr.wait_until_finished()

    def save_preemption(self, step: int, params: Any, opt_state: Any,
                        loader_state: Dict) -> None:
        """Graceful-preemption snapshot: metrics-less (survives best-k GC,
        becomes ``latest_step()``), with ROTATION — exactly one preemption
        snapshot is kept, tracked by a marker file, because metrics-less
        steps are permanently exempt from orbax's GC and a long run on a
        preemptible pool would otherwise accumulate one full params+opt
        snapshot per eviction."""
        marker = os.path.join(self._dir, "preempt_step.txt")
        prev = None
        if os.path.exists(marker):
            try:
                prev = int(open(marker).read().strip())
            except ValueError:
                prev = None
        self.save(step, params, opt_state, loader_state)  # metrics-less
        if (prev is not None and prev != step
                and prev in self._mngr.all_steps()
                and prev != self._mngr.best_step()):
            self._mngr.delete(prev)
        with open(marker + ".tmp", "w") as f:
            f.write(str(step))
        os.replace(marker + ".tmp", marker)

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Restore `step` (default: latest). Returns the state dict or None
        if no checkpoint exists."""
        self._mngr.wait_until_finished()  # barrier on any in-flight save
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None
        if template is not None:
            try:
                return self._mngr.restore(
                    step, args=ocp.args.StandardRestore(template))
            except ValueError:
                # Checkpoints written before the loader state gained
                # 'global_batch' have a 3-key loader dict; orbax rejects the
                # structure mismatch outright. Retry with the legacy shape —
                # DataLoader.load_state_dict defaults the missing field.
                legacy = dict(template)
                if "global_batch" not in legacy.get("loader", {}):
                    raise
                legacy["loader"] = {k: v
                                    for k, v in template["loader"].items()
                                    if k != "global_batch"}
                return self._mngr.restore(
                    step, args=ocp.args.StandardRestore(legacy))
        return self._mngr.restore(step)

    def best_step(self) -> Optional[int]:
        self._mngr.wait_until_finished()
        return self._mngr.best_step()

    def latest_step(self) -> Optional[int]:
        self._mngr.wait_until_finished()
        return self._mngr.latest_step()

    def close(self):
        self._mngr.close()


def save_user_memory(directory: str, uids: np.ndarray, memory: np.ndarray,
                     counters: np.ndarray) -> None:
    """Persist per-user lifelong memory state ([P §4.5], SURVEY.md §3.5):
    the L slot vectors and the event counter that drives periodic firing.
    Array-parallel layout: uids [U], memory [U, L, dm], counters [U]."""
    os.makedirs(directory, exist_ok=True)
    order = np.argsort(uids)
    path = os.path.join(directory, "user_memory.npz")
    # Atomic: a crash mid-save must never leave a torn snapshot (the
    # serving journal protocol truncates only AFTER save returns).
    np.savez(path + ".tmp.npz",
             uids=np.asarray(uids, np.int64)[order],
             memory=np.asarray(memory, np.float32)[order],
             counters=np.asarray(counters, np.int64)[order])
    os.replace(path + ".tmp.npz", path)


def load_user_memory(directory: str):
    """-> (uids [U], memory [U, L, dm], counters [U]); empty arrays if no
    snapshot exists."""
    path = os.path.join(directory, "user_memory.npz")
    if not os.path.exists(path):
        return (np.zeros((0,), np.int64), np.zeros((0, 0, 0), np.float32),
                np.zeros((0,), np.int64))
    z = np.load(path)
    return z["uids"], z["memory"], z["counters"]

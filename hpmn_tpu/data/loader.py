"""Batch iterator over preprocessed arrays.

Reference equivalent: the ``DataLoader``/``get_batch`` batching loader feeding
numpy arrays into feed_dict (SURVEY.md §2.1 "Data loader"). TPU-native
differences:

- **world-size-invariant global order** for multi-host training: every host
  derives the SAME per-epoch example order from (seed, epoch) and takes its
  contiguous slice of each global batch, so the assembled global batch is
  byte-identical for any host count — multi-host training consumes exactly
  the single-host example stream, and a checkpointed run resumes EXACTLY on
  a different number of hosts as long as the global batch size
  (``batch_size x process_count``) is unchanged (elastic resume);
- batches are always full (the tail is dropped in training, padded+masked in
  eval) so jit sees static shapes;
- the iterator position is explicit state (``epoch``, ``step``,
  ``global_batch``) so it can be checkpointed and resumed exactly
  (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from .schema import Batch, batch_from_numpy


class DataLoader:
    """Shuffling, shardable, resumable batch iterator.

    ``batch_size`` is the PER-HOST batch size; the global batch is
    ``batch_size * process_count`` rows, host ``p`` contributing rows
    ``[p*batch_size, (p+1)*batch_size)`` of it (the process-contiguous
    layout ``make_array_from_process_local_data`` / eval's ``_local_rows``
    assume).
    """

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_remainder: bool = True,
                 process_index: int = 0, process_count: int = 1):
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.n = arrays["label"].shape[0]
        self.global_batch = batch_size * process_count
        self._offset = process_index * batch_size
        self._process_count = process_count
        # Per-host static shard of the example axis (eval: one_epoch).
        self._local_idx = np.arange(process_index, self.n, process_count)
        if shuffle and drop_remainder and self.n < self.global_batch:
            # Would otherwise spin forever yielding nothing (0 full batches).
            raise ValueError(
                f"dataset has {self.n} examples < global batch "
                f"{self.global_batch} (batch_size={batch_size} x "
                f"process_count={process_count}); shrink the batch or "
                f"grow the dataset")
        self.epoch = 0
        self.step = 0  # step within epoch

    @property
    def n_local(self) -> int:
        return len(self._local_idx)

    def steps_per_epoch(self) -> int:
        if self.drop_remainder:
            return self.n // self.global_batch
        return -(-self.n // self.global_batch)

    def _epoch_order(self) -> np.ndarray:
        """GLOBAL example order for this epoch — a pure function of
        (seed, epoch), identical on every host."""
        if not self.shuffle:
            return np.arange(self.n)
        rng = np.random.default_rng(self.seed + self.epoch)
        return rng.permutation(self.n)

    def __iter__(self) -> Iterator[Batch]:
        while True:
            order = self._epoch_order()
            spe = self.steps_per_epoch()
            while self.step < spe:
                lo = self.step * self.global_batch + self._offset
                # every slice is full by construction: step < n//global_batch
                # (drop_remainder) keeps lo+batch_size <= n
                idx = order[lo:lo + self.batch_size]
                self.step += 1
                yield batch_from_numpy(self.arrays, idx)
            self.epoch += 1
            self.step = 0

    def epoch_batches(self) -> int:
        """Number of (batch, n_valid) pairs ``one_epoch`` yields — the SAME
        on every host (a pure function of the GLOBAL example count): each
        eval batch is one global SPMD dispatch, so a host running fewer
        batches than its peers would leave them blocked in a collective
        forever. ceil(ceil(n / P) / B) = the largest host shard's count;
        shorter hosts pad whole batches with n_valid = 0 (scored,
        discarded)."""
        if self.n == 0:
            return 0
        max_local = -(-self.n // self._process_count)
        return -(-max_local // self.batch_size)

    def one_epoch(self) -> Iterator[Batch]:
        """Iterate this host's shard of the current epoch once, without
        shuffling state changes.

        Used for eval: yields exactly :meth:`epoch_batches` pairs
        ``(batch, n_valid)``; short/empty trailing batches are padded to
        full ``batch_size`` (n_valid marks the real rows) so every host
        issues the identical global dispatch sequence even when the eval
        set doesn't divide evenly across hosts.
        """
        order = self._local_idx
        n = len(order)
        fill = order[-1:] if n else np.zeros(1, dtype=np.int64)
        for b in range(self.epoch_batches()):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            n_valid = len(idx)
            if n_valid < self.batch_size:
                idx = np.concatenate(
                    [idx, np.repeat(fill, self.batch_size - n_valid)])
            yield batch_from_numpy(self.arrays, idx), n_valid

    # --- checkpointable iterator position (SURVEY.md §5.4) ---
    def state_dict(self) -> Dict[str, int]:
        return {"epoch": self.epoch, "step": self.step, "seed": self.seed,
                "global_batch": self.global_batch}

    def load_state_dict(self, state: Dict[str, int]) -> None:
        gb = int(state.get("global_batch", self.global_batch))
        if gb != self.global_batch:
            raise ValueError(
                f"cannot resume: checkpoint global batch {gb} != this "
                f"run's {self.global_batch} (batch_size x process_count "
                f"must be preserved across restarts; per-host batch may "
                f"change with host count, their product may not)")
        self.epoch = int(state["epoch"])
        self.step = int(state["step"])
        self.seed = int(state["seed"])

"""Batch iterator over preprocessed arrays.

Reference equivalent: the ``DataLoader``/``get_batch`` batching loader feeding
numpy arrays into feed_dict (SURVEY.md §2.1 "Data loader"). TPU-native
differences:

- per-host sharding for multi-host training: each process iterates only its
  ``process_index``-th shard of the example axis (SURVEY.md §5.8);
- batches are always full (the tail is dropped in training, padded+masked in
  eval) so jit sees static shapes;
- the iterator position is explicit state (``epoch``, ``step``) so it can be
  checkpointed and resumed exactly (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from .schema import Batch, batch_from_numpy


class DataLoader:
    """Shuffling, shardable, resumable batch iterator."""

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_remainder: bool = True,
                 process_index: int = 0, process_count: int = 1):
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        n = arrays["label"].shape[0]
        # Per-host static shard of the example axis.
        self._local_idx = np.arange(process_index, n, process_count)
        if shuffle and drop_remainder and len(self._local_idx) < batch_size:
            # Would otherwise spin forever yielding nothing (0 full batches).
            raise ValueError(
                f"local shard has {len(self._local_idx)} examples < "
                f"batch_size={batch_size} (n={n}, "
                f"process_count={process_count}); shrink the batch or "
                f"grow the dataset")
        self.epoch = 0
        self.step = 0  # step within epoch

    @property
    def n_local(self) -> int:
        return len(self._local_idx)

    def steps_per_epoch(self) -> int:
        if self.drop_remainder:
            return self.n_local // self.batch_size
        return -(-self.n_local // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        if not self.shuffle:
            return self._local_idx
        rng = np.random.default_rng(self.seed + self.epoch)
        return rng.permutation(self._local_idx)

    def __iter__(self) -> Iterator[Batch]:
        while True:
            order = self._epoch_order()
            spe = self.steps_per_epoch()
            while self.step < spe:
                lo = self.step * self.batch_size
                idx = order[lo:lo + self.batch_size]
                self.step += 1
                if len(idx) < self.batch_size and self.drop_remainder:
                    break
                yield batch_from_numpy(self.arrays, idx)
            self.epoch += 1
            self.step = 0

    def one_epoch(self) -> Iterator[Batch]:
        """Iterate the current epoch once, without shuffling state changes.

        Used for eval: yields possibly a final short batch padded to full
        ``batch_size`` with ``pad_count`` attached via a (batch, n_valid) tuple.
        """
        order = self._local_idx
        n = len(order)
        for lo in range(0, n, self.batch_size):
            idx = order[lo:lo + self.batch_size]
            n_valid = len(idx)
            if n_valid < self.batch_size:
                pad = np.concatenate([idx, np.repeat(idx[-1:], self.batch_size - n_valid)])
                yield batch_from_numpy(self.arrays, pad), n_valid
            else:
                yield batch_from_numpy(self.arrays, idx), n_valid

    # --- checkpointable iterator position (SURVEY.md §5.4) ---
    def state_dict(self) -> Dict[str, int]:
        return {"epoch": self.epoch, "step": self.step, "seed": self.seed}

    def load_state_dict(self, state: Dict[str, int]) -> None:
        self.epoch = int(state["epoch"])
        self.step = int(state["step"])
        self.seed = int(state["seed"])

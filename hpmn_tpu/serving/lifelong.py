"""Lifelong serving: per-user HPMN memory with O(1) incremental updates.

Reference equivalent: the paper's lifelong-deployment scheme ([P §4.5],
SURVEY.md §3.5) — the user memory is persisted state; each new behavior
triggers amortized-O(1) GRU updates (layer l only fires at its period), so
predictions never replay the history. This is a capability requirement, not
an optimization: the rebuild's HPMN state must be explicitly
checkpointable/resumable per user (SURVEY.md §5.4).

Batched, jit-compiled update/predict:

    store = UserMemoryStore(cfg, params, n_items, n_cats)
    store.update(uids, item_ids, cat_ids)   # one new behavior per user
    scores = store.predict(uids, cand_items, cand_cats)
    store.save(dir); store = UserMemoryStore.load(dir, ...)

Equivalence with training: feeding a user's T behaviors through
``update`` one at a time yields exactly the memory
``models.hpmn.encode_oracle`` computes for that length-T sequence
(tested in tests/test_serving.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.embedding import dense_lookup
from ..models.hpmn import layer_period
from ..models.readout import attention_readout
from ..models.tower import apply_tower
from ..ops.gru import gru_cell, gru_input_proj
from ..train.checkpoint import load_user_memory, save_user_memory


@functools.partial(jax.jit, static_argnames=("period",))
def incremental_update(encoder_params: Dict, memory: jax.Array,
                       counter: jax.Array, x: jax.Array,
                       period: int) -> Tuple[jax.Array, jax.Array]:
    """One behavior per user: memory [B, L, dm], counter [B] (events so
    far), x [B, d_in] behavior embedding -> (new memory, counter+1).

    Layer l fires iff (counter+1) % period**(l-1) == 0 — identical to the
    training oracle's firing grid (models.hpmn.encode_oracle), so serving
    state stays bit-compatible with training-time encodings.
    """
    layers = encoder_params["layers"]
    t1 = counter + 1
    new_slots = []
    lower = x
    for l, lp in enumerate(layers):
        m_l = memory[:, l, :]
        fires = ((t1 % layer_period(period, l)) == 0).astype(x.dtype)[:, None]
        upd = gru_cell(lp, gru_input_proj(lp, lower), m_l)
        m_new = fires * upd + (1.0 - fires) * m_l
        new_slots.append(m_new)
        lower = m_new  # layer l+1 consumes layer l's post-update memory
    return jnp.stack(new_slots, axis=1), t1


class UserMemoryStore:
    """Host-side registry of per-user lifelong memory (uid -> [L, dm] slots
    + event counter), with batched device-side update/predict."""

    def __init__(self, cfg, params: Dict, uid_to_memory: Optional[dict] = None,
                 counters: Optional[dict] = None):
        self.cfg = cfg
        self.params = params
        self.L = cfg.model.hpmn_layers
        self.d_m = cfg.model.mem_dim
        self.period = cfg.model.hpmn_period
        self._memory: Dict[int, np.ndarray] = dict(uid_to_memory or {})
        self._counter: Dict[int, int] = dict(counters or {})

    # ------------------------------------------------------------ state --
    def _gather(self, uids: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        zeros = np.zeros((self.L, self.d_m), np.float32)
        mem = np.stack([self._memory.get(int(u), zeros) for u in uids])
        cnt = np.array([self._counter.get(int(u), 0) for u in uids], np.int32)
        return jnp.asarray(mem), jnp.asarray(cnt)

    def _scatter(self, uids, mem, cnt) -> None:
        mem = np.asarray(mem)
        cnt = np.asarray(cnt)
        for i, u in enumerate(uids):
            self._memory[int(u)] = mem[i]
            self._counter[int(u)] = int(cnt[i])

    # -------------------------------------------------------- operations --
    def ingest_histories(self, uids, item_seqs, cat_seqs, masks=None) -> None:
        """Bootstrap many users' memories from full histories in ONE batched
        encode (the deployment cold-start path): mathematically identical to
        replaying each history through :meth:`update` event by event, but
        O(T) batched device work instead of T host round-trips.

        item_seqs/cat_seqs: [B, T] left-padded int32; masks: [B, T] or None
        (full histories). Overwrites any existing state for these users.
        """
        from ..models.hpmn import encode_oracle

        item_seqs = jnp.asarray(item_seqs)
        cat_seqs = jnp.asarray(cat_seqs)
        B, T = item_seqs.shape
        m = (jnp.ones((B, T), jnp.float32) if masks is None
             else jnp.asarray(masks, jnp.float32))
        x = dense_lookup(self.params["embedding"], item_seqs, cat_seqs)
        mem = encode_oracle(self.params["encoder"], x, m, self.period)
        # Training fires layers on the ARRAY-position grid of the left-padded
        # [T] window, so the counter continues from T (not the event count):
        # future incremental updates stay on the training-aligned grid. For
        # full-length (lifelong) histories the two coincide.
        counts = np.full((len(item_seqs),), T, np.int64)
        self._scatter(np.asarray(uids), mem, counts)

    def update(self, uids, item_ids, cat_ids) -> None:
        """Ingest one new behavior per listed user (O(1) amortized each)."""
        uids = np.asarray(uids)
        mem, cnt = self._gather(uids)
        x = dense_lookup(self.params["embedding"], jnp.asarray(item_ids),
                         jnp.asarray(cat_ids))
        mem, cnt = incremental_update(self.params["encoder"], mem, cnt, x,
                                      self.period)
        self._scatter(uids, mem, cnt)

    def predict(self, uids, cand_items, cand_cats) -> np.ndarray:
        """CTR scores sigma(logit) for (user, candidate item) pairs
        (SURVEY.md §3.5 predict path)."""
        uids = np.asarray(uids)
        mem, _ = self._gather(uids)
        q = dense_lookup(self.params["embedding"], jnp.asarray(cand_items),
                         jnp.asarray(cand_cats))
        read = attention_readout(self.params["readout"], mem, q)
        logits = apply_tower(self.params["tower"],
                             jnp.concatenate([q, read], axis=-1))
        return np.asarray(jax.nn.sigmoid(logits))

    # ------------------------------------------------------- persistence --
    def save(self, directory: str) -> None:
        save_user_memory(directory, self._memory, self._counter)

    @classmethod
    def load(cls, directory: str, cfg, params: Dict) -> "UserMemoryStore":
        mem, cnt = load_user_memory(directory)
        return cls(cfg, params, mem, cnt)

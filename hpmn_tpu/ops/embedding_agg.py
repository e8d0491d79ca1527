"""MXU-friendly embedding-gradient aggregation for small-vocab tables.

The backward of an embedding gather must sum cotangent rows per id. XLA
lowers ``zeros.at[ids].add(rows)`` to a sort-based scatter whose cost is
driven by the number of *occurrences* N (it sorts the [N, d] payload through
O(log^2 N) bitonic stages), not by the table size — measured ~5-6 ms per
512k-row scatter on a v5e chip regardless of the target vocab
(ARCHITECTURE.md §4). For small vocabularies V the same aggregation is a
dense contraction that the MXU does in tens of microseconds:

    grad[v, :] = sum_n [ids_n == v] * cot[n, :]  ==  onehot(ids)^T @ cot

computed in chunks over N so the one-hot tile stays within VMEM. Each output
element receives exactly one nonzero product per occurrence, so the math is
the scatter-add's up to summation order (chunk partials accumulate in fixed
order; tests pin the tolerance).

Reference equivalent: the backward of ``tf.nn.embedding_lookup`` on the
category table (SURVEY.md §2.1 "Embedding module", [B:5] "speed-of-light"
bar). The reference inherits TF's sparse ``IndexedSlices`` gradient; this is
the TPU-native counterpart for vocabularies where dense MXU aggregation
beats sorting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Vocab-size crossover: below this, backward aggregation by one-hot matmul;
# above it, XLA's scatter-add (sort-based) is kept. The one-hot matmul's
# FLOPs are 2*N*V*d — linear in V — while the scatter's sort cost is flat in
# V, so the crossover is a measured constant (see ARCHITECTURE.md §4).
SMALL_VOCAB_MAX = 4096

# Rows of the one-hot tile per matmul: chunk * V * 4B must fit VMEM
# comfortably next to the cotangent tile (2048 * 4096 * 4B = 32 MB worst
# case at the vocab threshold; XLA windows the matmul if it must).
_CHUNK = 2048


@functools.partial(jax.jit, static_argnames=("n_rows", "chunk", "precision"))
def matmul_agg(ids: jax.Array, cot: jax.Array, n_rows: int,
               chunk: int = _CHUNK,
               precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Sum cotangent rows per id: == zeros((n_rows, d)).at[ids].add(cot)
    (up to f32 summation order), as chunked one-hot matmuls.

    ids: [N] int32 — entries outside [0, n_rows) contribute nothing (used
    both for padding the tail chunk and by the sharded path to drop rows
    owned by other shards).
    cot: [N, d] float32.
    """
    N, d = cot.shape
    chunk = min(chunk, max(N, 1))
    pad = (-N) % chunk
    if pad:
        # n_rows is out of range -> all-zero one-hot row -> no contribution.
        ids = jnp.concatenate([ids, jnp.full((pad,), n_rows, ids.dtype)])
        cot = jnp.concatenate([cot, jnp.zeros((pad, d), cot.dtype)])
    nch = ids.shape[0] // chunk
    iota = jnp.arange(n_rows, dtype=ids.dtype)

    def body(acc, xs):
        ids_c, cot_c = xs
        oh = (ids_c[:, None] == iota[None, :]).astype(cot.dtype)
        acc = acc + jax.lax.dot_general(
            oh, cot_c, (((0,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)
        return acc, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_rows, d), jnp.float32),
        (ids.reshape(nch, chunk), cot.reshape(nch, chunk, d)))
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_small(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Row gather whose backward aggregates with ``matmul_agg`` instead of
    XLA's sort-based scatter. Forward is a plain gather (bit-identical to
    ``jnp.take``); only the cotangent summation strategy differs."""
    return jnp.take(table, ids, axis=0)


def _take_small_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _take_small_bwd(res, g):
    ids, n_rows = res
    flat = ids.reshape(-1)
    d = g.shape[-1]
    dt = matmul_agg(flat, g.reshape(-1, d).astype(jnp.float32), n_rows)
    return dt.astype(g.dtype), None


take_small.defvjp(_take_small_fwd, _take_small_bwd)


def take_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows; pick the backward aggregation strategy by vocab size."""
    if table.shape[0] <= SMALL_VOCAB_MAX:
        return take_small(table, ids)
    return jnp.take(table, ids, axis=0)

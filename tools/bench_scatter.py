"""On-chip shootout of embedding-gradient aggregation strategies.

The backward of the behavior-sequence embedding gather must sum N = B*T
cotangent rows into a [V, d] table gradient. XLA lowers ``.at[ids].add`` to
a sort-based scatter whose cost is flat in V and driven by sorting the
[N, d+1] payload (ARCHITECTURE.md §4) — the dominant cost of the XLong
train step. This tool measures every candidate replacement on the real
chip so the design is chosen by data:

  gather      row-gather floor (the forward's cost, for scale)
  scatter     baseline ``zeros.at[ids].add(cot)``
  sorted      same ids pre-sorted by value (no flags) — does XLA notice?
  sorted+flag ``indices_are_sorted=True`` with host-pre-sorted ids
  slots+flag  scatter into contiguous unique-slot indices (sorted, dense)
  segsum      ``jax.ops.segment_sum(..., indices_are_sorted=True)``
  uniq+flags  place aggregated rows at unique ids (both flags)
  tilemm      tile-local one-hot matmul aggregation + windowed combine
              + searchsorted expand to dense [V, d] (no scatter anywhere)
  devsort     ``lax.sort_key_val`` of (ids, iota) on device — the cost of
              NOT precomputing sort metadata on the host
  adam_dense  optax adam update on the dense [V, d] table (is the O(V)
              optimizer pass worth sparsifying at this V?)

Timing per CLAUDE.md: scalar float() pull to sync; ≥3 distinct inputs
cycled to defeat the tunnel's dispatch dedup.

Usage: python tools/bench_scatter.py [N] [V] [d]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, inputs, n_iter=16, warmup=1):
    """ms per op, amortized: chains ``n_iter`` applications of ``fn`` inside
    ONE jitted call (fori_loop over stacked distinct inputs, carry = running
    checksum so iterations serialize and nothing is DCE'd). A single
    dispatch per measurement sidesteps the multi-ms per-call overhead of the
    tunneled TPU; distinct outer calls cycle distinct input stacks to defeat
    the relay's dispatch dedup (CLAUDE.md).
    """
    stacks = [jnp.stack([jnp.asarray(x) for x in xs]) for xs in zip(*inputs)]
    n_in = stacks[0].shape[0]

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(stacks, salt, k):
        def body(i, acc):
            args = [s[(i + salt) % n_in] for s in stacks]
            out = fn(*args)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.ravel()[-1].astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    for salt in range(warmup):
        float(chained(stacks, salt, n_iter))
        float(chained(stacks, salt, 2 * n_iter))  # compile BOTH k variants
    # difference of paired (k, 2k) runs cancels the per-dispatch constant;
    # min over repeats rejects tunnel-latency noise (observed ±4 ms swings
    # on single pairs).
    t_k, t_2k = float("inf"), float("inf")
    for rep in range(5):
        t0 = time.time()
        float(chained(stacks, 100 + 2 * rep, n_iter))
        t1 = time.time()
        float(chained(stacks, 101 + 2 * rep, 2 * n_iter))
        t2 = time.time()
        t_k, t_2k = min(t_k, t1 - t0), min(t_2k, t2 - t1)
    return (t_2k - t_k) / n_iter * 1e3


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf))  # scalar pull — block_until_ready lies (CLAUDE.md)


def tile_matmul_agg(sorted_cot, u_idx, tile=2048):
    """Aggregate duplicate-id rows (sorted order) into compact unique slots
    via tile-local one-hot matmuls; returns [N, d] (first n_unique valid).

    Within a tile of `tile` sorted rows the slot indices span < `tile`
    contiguous values, so a [tile, tile] local one-hot against
    (u_idx - tile_base) runs on the MXU; per-tile partials land in the
    compact buffer by a windowed scatter-add over just N/tile indices.
    """
    N, d = sorted_cot.shape
    nt = N // tile
    bases = u_idx[::tile]  # [nt] slot base of each tile (sorted)
    local = (u_idx.reshape(nt, tile) - bases[:, None]).astype(jnp.int32)
    iota = jnp.arange(tile, dtype=jnp.int32)
    oh = (local[:, :, None] == iota[None, None, :]).astype(sorted_cot.dtype)
    # [nt, tile(rows), tile(slots)]^T @ [nt, tile, d] -> [nt, tile, d]
    partial = jax.lax.dot_general(
        oh, sorted_cot.reshape(nt, tile, d),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # windowed combine: nt window-adds of [tile, d] at dynamic slot bases
    out = jnp.zeros((N + tile, d), jnp.float32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    out = jax.lax.scatter_add(
        out, bases[:, None], partial, dnums,
        indices_are_sorted=True, unique_indices=False)
    return out[:N]


def expand_to_dense(agg, uniq_ids, V):
    """Compact unique-slot rows -> dense [V, d] grad, gathers only."""
    pos = jnp.searchsorted(uniq_ids, jnp.arange(V, dtype=uniq_ids.dtype))
    pos = jnp.minimum(pos, uniq_ids.shape[0] - 1)
    found = uniq_ids[pos] == jnp.arange(V, dtype=uniq_ids.dtype)
    return jnp.where(found[:, None], agg[pos], 0.0)


def main(N=512 * 1000, V=50_000, d=16):
    rng = np.random.default_rng(0)
    n_in = 4
    print(f"# N={N} V={V} d={d}  platform={jax.devices()[0].platform}",
          file=sys.stderr)

    inputs = []
    for s in range(n_in):
        ids = rng.integers(1, V, size=N).astype(np.int32)
        cot = rng.standard_normal((N, d)).astype(np.float32)
        perm = np.argsort(ids, kind="stable").astype(np.int32)
        sids = ids[perm]
        starts = np.concatenate([[True], sids[1:] != sids[:-1]])
        u_idx = (np.cumsum(starts) - 1).astype(np.int32)
        uniq = np.full(N, V, np.int32)  # V = sentinel, sorts last
        nu = int(u_idx[-1]) + 1
        uniq[:nu] = sids[starts]
        agg_np = np.zeros((N, d), np.float32)
        np.add.at(agg_np, u_idx, cot[perm])
        inputs.append(dict(
            ids=jnp.asarray(ids), cot=jnp.asarray(cot),
            perm=jnp.asarray(perm), sids=jnp.asarray(sids),
            u_idx=jnp.asarray(u_idx), uniq=jnp.asarray(uniq),
            agg=jnp.asarray(agg_np), iota=jnp.arange(N, dtype=jnp.int32)))

    res = {}

    table = jnp.asarray(rng.standard_normal((V, d)).astype(np.float32))
    res["gather"] = timeit(
        jax.jit(lambda i: jnp.take(table, i, axis=0)),
        [(b["ids"],) for b in inputs])

    res["scatter"] = timeit(
        jax.jit(lambda i, c: jnp.zeros((V, d), jnp.float32).at[i].add(c)),
        [(b["ids"], b["cot"]) for b in inputs])

    res["sorted"] = timeit(
        jax.jit(lambda i, c: jnp.zeros((V, d), jnp.float32).at[i].add(c)),
        [(b["sids"], b["cot"]) for b in inputs])

    res["sorted+flag"] = timeit(
        jax.jit(lambda i, c: jnp.zeros((V, d), jnp.float32)
                .at[i].add(c, indices_are_sorted=True)),
        [(b["sids"], b["cot"]) for b in inputs])

    res["slots+flag"] = timeit(
        jax.jit(lambda i, c: jnp.zeros((N, d), jnp.float32)
                .at[i].add(c, indices_are_sorted=True)),
        [(b["u_idx"], b["cot"]) for b in inputs])

    res["segsum"] = timeit(
        jax.jit(functools.partial(jax.ops.segment_sum, num_segments=N,
                                  indices_are_sorted=True)),
        [(b["cot"], b["u_idx"]) for b in inputs])

    res["uniq+flags"] = timeit(
        jax.jit(lambda i, c: jnp.zeros((V + 1, d), jnp.float32)
                .at[i].add(c, indices_are_sorted=True, unique_indices=True)),
        [(b["uniq"], b["agg"]) for b in inputs])

    res["permgather"] = timeit(
        jax.jit(lambda c, p: jnp.take(c, p, axis=0)),
        [(b["cot"], b["perm"]) for b in inputs])

    @jax.jit
    def tilemm_full(cot, perm, u_idx, uniq):
        sorted_cot = jnp.take(cot, perm, axis=0)
        agg = tile_matmul_agg(sorted_cot, u_idx)
        return expand_to_dense(agg, uniq, V)

    res["tilemm"] = timeit(
        tilemm_full,
        [(b["cot"], b["perm"], b["u_idx"], b["uniq"]) for b in inputs])

    # correctness spot-check of tilemm against the scatter oracle
    b = inputs[0]
    want = np.zeros((V, d), np.float32)
    np.add.at(want, np.asarray(b["ids"]), np.asarray(b["cot"]))
    got = np.asarray(tilemm_full(b["cot"], b["perm"], b["u_idx"], b["uniq"]))
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
    print(f"# tilemm max rel err vs scatter oracle: {err:.2e}",
          file=sys.stderr)

    res["devsort"] = timeit(
        jax.jit(lambda i, io: jax.lax.sort_key_val(i, io)),
        [(b["ids"], b["iota"]) for b in inputs])

    # full on-device backward pipeline: sort + permgather + flagged scatter
    def pipeline(ids, cot):
        iota = jnp.arange(ids.shape[0], dtype=jnp.int32)
        sids, perm = jax.lax.sort_key_val(ids, iota)
        rows = jnp.take(cot, perm, axis=0)
        return jnp.zeros((V, d), jnp.float32).at[sids].add(
            rows, indices_are_sorted=True)

    res["pipeline"] = timeit(pipeline,
                             [(b["ids"], b["cot"]) for b in inputs])
    b0 = inputs[0]
    want = np.zeros((V, d), np.float32)
    np.add.at(want, np.asarray(b0["ids"]), np.asarray(b0["cot"]))
    got = np.asarray(jax.jit(pipeline)(b0["ids"], b0["cot"]))
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print(f"# pipeline max rel err vs scatter oracle: {err:.2e}",
          file=sys.stderr)

    res["gather_sortedids"] = timeit(
        lambda i: jnp.take(table, i, axis=0),
        [(b["sids"],) for b in inputs])

    # small-vocab (category-table) candidates at V=800
    Vs = 800
    sinputs = []
    for s in range(n_in):
        sids_ = rng.integers(1, Vs, size=N).astype(np.int32)
        sinputs.append((jnp.asarray(sids_),
                        inputs[s]["cot"]))
    stable = jnp.asarray(rng.standard_normal((Vs, d)).astype(np.float32))

    from hpmn_tpu.ops.embedding_agg import matmul_agg

    for prec, tag in ((jax.lax.Precision.HIGHEST, "hi"),
                      (jax.lax.Precision.DEFAULT, "lo")):
        res[f"mm_agg800_{tag}"] = timeit(
            lambda i, c, p=prec: matmul_agg(i, c, Vs, precision=p),
            sinputs)

    res["gather800"] = timeit(lambda i: jnp.take(stable, i, axis=0),
                              [(i,) for i, _ in sinputs])

    def onehot_fwd(ids_):
        oh = (ids_[:, None] == jnp.arange(Vs)[None, :]).astype(jnp.float32)
        return jax.lax.dot_general(oh, stable, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    res["onehot_fwd800"] = timeit(onehot_fwd, [(i,) for i, _ in sinputs])

    res["scatter800"] = timeit(
        lambda i, c: jnp.zeros((Vs, d), jnp.float32).at[i].add(c), sinputs)

    import optax
    tx = optax.adam(1e-3)
    opt = tx.init(table)

    def adam_step(g):
        u, o2 = tx.update(g, opt, table)
        return optax.apply_updates(table, u)

    res["adam_dense"] = timeit(
        adam_step, [(b["agg"][:V],) for b in inputs])

    for k, v in res.items():
        print(f"{k:12s} {v:8.2f} ms")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

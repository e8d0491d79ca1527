"""StreamingGAUC at production shape (VERDICT r3 weak #4 'done' gate).

The accumulator exists for N >> U production eval sweeps (its module
docstring); this bench drives it at that shape — default 1M users x
4096-row batches — and reports update/merge/result throughput for the
vectorized arena implementation alongside the r3 per-user-Python-loop
design (re-implemented inline as the comparison baseline). Results are
recorded in BASELINE.md.

Usage: python tools/bench_gauc.py [--users 1000000] [--batch 4096]
       [--batches 64] [--bins 256]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hpmn_tpu.train.metrics import StreamingGAUC  # noqa: E402


class LoopGAUC(StreamingGAUC):
    """The r3 implementation: per-user Python loop over each batch's uid
    groups (git history: train/metrics.py before r4). Kept here only as
    the bench baseline; shares hashing/state/result with the arena class
    so the comparison isolates the update loop."""

    def update(self, logits, labels, uids):
        x = np.asarray(logits, np.float64).ravel()
        if x.size == 0:
            return
        y = np.asarray(labels).ravel() > 0.5
        u = np.asarray(uids).ravel()
        s = 1.0 / (1.0 + np.exp(-x))
        b = np.minimum((s * self.n_bins).astype(np.int64), self.n_bins - 1)
        order = np.argsort(u, kind="mergesort")
        u_sorted = u[order]
        bounds = np.flatnonzero(np.diff(u_sorted)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(u_sorted)]])
        for st, en in zip(starts, ends):
            grp = order[st:en]
            rows = self._rows_for(
                self._keys_vec(u_sorted[st:st + 1]))  # one user
            h = self._hists[rows[0]]
            yg = y[grp]
            h[0] += np.bincount(b[grp][yg], minlength=self.n_bins
                                ).astype(np.int32)
            h[1] += np.bincount(b[grp][~yg], minlength=self.n_bins
                                ).astype(np.int32)


def drive(acc, batches, rows, n_users, seed=0):
    rng = np.random.default_rng(seed)
    t_upd = 0.0
    n = 0
    for _ in range(batches):
        uids = rng.integers(0, n_users, rows).astype(np.int64)
        labels = rng.integers(0, 2, rows).astype(np.float64)
        logits = rng.normal(size=rows) + 0.5 * labels
        t0 = time.perf_counter()
        acc.update(logits, labels, uids)
        t_upd += time.perf_counter() - t0
        n += rows
    return t_upd, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--bins", type=int, default=256)
    ap.add_argument("--loop_batches", type=int, default=8,
                    help="batches for the (slow) r3 loop baseline")
    args = ap.parse_args()

    # Pre-populate the arena to the full production user count so update()
    # is measured against a realistic index/arena, not a warm tiny dict.
    acc = StreamingGAUC(args.bins)
    t0 = time.perf_counter()
    acc._rows_for(np.arange(args.users, dtype=np.int64))
    t_pop = time.perf_counter() - t0
    arena_gb = acc._hists.nbytes / 1e9

    t_upd, n = drive(acc, args.batches, args.batch, args.users, seed=1)
    ex_s = n / t_upd

    # result() at full population
    t0 = time.perf_counter()
    acc.result()
    t_res = time.perf_counter() - t0

    # merge of a second full-population accumulator (the cross-host fold)
    peer = StreamingGAUC(args.bins)
    drive(peer, 4, args.batch, args.users, seed=2)
    st = peer.state
    t0 = time.perf_counter()
    acc.merge_state(*st)
    t_merge = time.perf_counter() - t0

    # r3 loop baseline at the same shape (few batches: it is ~100x slower)
    loop = StreamingGAUC(args.bins)
    loop._rows_for(np.arange(args.users, dtype=np.int64))
    loop.__class__ = LoopGAUC
    t_loop, n_loop = drive(loop, args.loop_batches, args.batch,
                           args.users, seed=1)
    loop_ex_s = n_loop / t_loop

    # equivalence spot-check at a small shape
    a, b = StreamingGAUC(args.bins), LoopGAUC(args.bins)
    rng = np.random.default_rng(9)
    for acc2 in (a, b):
        r2 = np.random.default_rng(9)
        for _ in range(4):
            u = r2.integers(0, 500, 2048).astype(np.int64)
            y = r2.integers(0, 2, 2048).astype(np.float64)
            x = r2.normal(size=2048) + y
            acc2.update(x, y, u)
    assert a.result() == b.result(), (a.result(), b.result())

    print(f"# users={args.users} batch={args.batch} bins={args.bins} "
          f"arena={arena_gb:.2f} GB populate={t_pop:.2f}s", file=sys.stderr)
    import json
    print(json.dumps({
        "metric": "streaming_gauc_update_rows_per_s",
        "value": round(ex_s),
        "unit": "rows/s",
        "vs_baseline": round(ex_s / loop_ex_s, 2),
        "detail": {
            "r3_loop_rows_per_s": round(loop_ex_s),
            "result_s_at_full_population": round(t_res, 3),
            "merge_s_full_population": round(t_merge, 3),
            "arena_gb": round(arena_gb, 2),
        },
    }))


if __name__ == "__main__":
    main()

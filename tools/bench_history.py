"""HistoryStore (BST lifelong serving) throughput vs the HPMN memory store
at the same request shapes (VERDICT r3 next #5 done-criterion).

The two stores answer the same serving API but with different state and
device work: the HPMN store keeps [L, dm] memory and does O(1) GRU work per
update; the history store keeps a [W]-event id window (host ints) and
re-encodes O(W) per PREDICT. So updates should be cheaper for history
(host memmove, no device call) and predicts costlier (full encoder) —
this tool quantifies both sides on the same population/batch shapes.

One JSON line:
  {"metric": "history_serving", "window": W, ...per-op users/sec...,
   "hpmn_predict_users_per_sec": ... (same harness, memory store)}

Timing per CLAUDE.md: the stores' predict/rank return numpy (synchronizing
pulls); distinct batches cycled so the relay cannot dedup.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def _bench_store(store, n_users, T, batch, rounds, rank_c, rank_b, rng,
                 n_items, n_cats):
    res = {}
    # warmup compiles outside timed sections
    w_uids = np.arange(batch)
    w_items = rng.integers(1, n_items, size=(batch, T)).astype(np.int32)
    store.ingest_histories(w_uids, w_items,
                           (w_items % n_cats).astype(np.int32))
    w_it = w_items[:, 0]
    store.update(w_uids, w_it, (w_it % n_cats).astype(np.int32))
    store.predict(w_uids, w_it, (w_it % n_cats).astype(np.int32))
    w_cand = rng.integers(1, n_items, size=(rank_b, rank_c)).astype(np.int32)
    store.rank(w_uids[:rank_b], w_cand, (w_cand % n_cats).astype(np.int32))

    t0 = time.time()
    for lo in range(0, n_users, batch):
        uids = np.arange(lo, min(lo + batch, n_users))
        items = rng.integers(1, n_items,
                             size=(len(uids), T)).astype(np.int32)
        store.ingest_histories(uids, items, (items % n_cats).astype(np.int32))
    res["ingest_events_per_sec"] = n_users * T / (time.time() - t0)

    t0 = time.time()
    for r in range(rounds):
        uids = rng.integers(0, n_users, size=batch)
        uids = np.unique(uids)  # store contract: distinct users per call
        it = rng.integers(1, n_items, size=len(uids)).astype(np.int32)
        store.update(uids, it, (it % n_cats).astype(np.int32))
        n_up = len(uids)
    res["update_users_per_sec"] = rounds * n_up / (time.time() - t0)

    t0 = time.time()
    for r in range(rounds):
        uids = rng.integers(0, n_users, size=batch)
        it = rng.integers(1, n_items, size=batch).astype(np.int32)
        out = store.predict(uids, it, (it % n_cats).astype(np.int32))
    assert np.isfinite(out).all()
    res["predict_users_per_sec"] = rounds * batch / (time.time() - t0)

    t0 = time.time()
    for r in range(rounds):
        uids = rng.integers(0, n_users, size=rank_b)
        ci = rng.integers(1, n_items, size=(rank_b, rank_c)).astype(np.int32)
        store.rank(uids, ci, (ci % n_cats).astype(np.int32))
    res["rank_scores_per_sec"] = rounds * rank_b * rank_c / (time.time() - t0)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--rank_c", type=int, default=64)
    ap.add_argument("--rank_b", type=int, default=64)
    ap.add_argument("--window", type=int, default=0,
                    help="history window; 0 = the config dataset's T")
    ap.add_argument("--config", default="taobao_bst")
    ap.add_argument("--hpmn_config", default="taobao_hpmn")
    ap.add_argument("--skip_hpmn", action="store_true")
    ap.add_argument("--family_compare", default="",
                    help="bench UserMemoryStore vs HistoryStore for ONE "
                         "O(1)-qualifying family (gru4rec|rum|hpmn) with "
                         "IDENTICAL params — quantifies what the r5 "
                         "protocol fence buys that family (VERDICT r4 "
                         "next #4 done-criterion)")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.synthetic import SPECS
    from hpmn_tpu.models import init_model
    from hpmn_tpu.serving import HistoryStore, UserMemoryStore

    if args.family_compare:
        cfg = get_config(args.config)
        cfg.model.name = args.family_compare
        n_items, n_cats = 50_000, 800
        T = args.window or SPECS[cfg.dataset].seq_len
        params = init_model(jax.random.key(0), cfg, n_items, n_cats)
        out = {"metric": "protocol_serving", "model": cfg.model.name,
               "window": T, "n_users": args.n_users, "batch": args.batch}
        mem = _bench_store(UserMemoryStore(cfg, params), args.n_users, T,
                           args.batch, args.rounds, args.rank_c,
                           args.rank_b, np.random.default_rng(0),
                           n_items, n_cats)
        his = _bench_store(HistoryStore(cfg, params, window=T),
                           args.n_users, T, args.batch, args.rounds,
                           args.rank_c, args.rank_b,
                           np.random.default_rng(1), n_items, n_cats)
        out.update({f"memory_{k}": v for k, v in mem.items()})
        out.update({f"history_{k}": v for k, v in his.items()})
        print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                          for k, v in out.items()}))
        return

    cfg = get_config(args.config)
    n_items, n_cats = 50_000, 800
    T = args.window or SPECS[cfg.dataset].seq_len
    params = init_model(jax.random.key(0), cfg, n_items, n_cats)
    store = HistoryStore(cfg, params, window=T)
    rng = np.random.default_rng(0)
    out = {"metric": "history_serving", "model": cfg.model.name,
           "window": T, "n_users": args.n_users, "batch": args.batch}
    out.update(_bench_store(store, args.n_users, T, args.batch, args.rounds,
                            args.rank_c, args.rank_b, rng, n_items, n_cats))

    if not args.skip_hpmn:
        hcfg = get_config(args.hpmn_config)
        hparams = init_model(jax.random.key(0), hcfg, n_items, n_cats)
        hstore = UserMemoryStore(hcfg, hparams)
        href = _bench_store(hstore, args.n_users, T, args.batch,
                            args.rounds, args.rank_c, args.rank_b,
                            np.random.default_rng(1), n_items, n_cats)
        out.update({f"hpmn_{k}": v for k, v in href.items()})
    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()

"""Serving-path throughput at lifelong population scale (1M users).

VERDICT r1 weak #6 done-criterion: update/predict throughput at 1M
synthetic users without host-loop dominance. Exercises the contiguous-arena
``UserMemoryStore`` end to end:

  bulk ingest   histories -> memories, one batched encode per chunk
  update        one new behavior per user, batched (the O(1)-amortized path)
  predict       (user, candidate) CTR scores, batched
  rank          C candidates per user from one memory read, batched

One JSON line: {"metric": "serving_1m_users", "ingest_events_per_sec": ..,
"update_users_per_sec": .., "predict_users_per_sec": .., "n_users": ..}

Timing per CLAUDE.md: scalar/hos pulls inside the store already synchronize
(update/predict return numpy); distinct batches cycled.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main(n_users=1_000_000, T=100, batch=4096, update_rounds=20,
         predict_rounds=20, rank_c=64, device_resident=0):
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.models import init_model
    from hpmn_tpu.serving import UserMemoryStore

    cfg = get_config("taobao_hpmn")
    n_items, n_cats = 50_000, 800
    params = init_model(jax.random.key(0), cfg, n_items, n_cats)
    store = UserMemoryStore(cfg, params,
                            device_resident=bool(device_resident))
    rng = np.random.default_rng(0)

    # warmup: compile the three device graphs (batch-shaped) OUTSIDE the
    # timed sections — first compiles take ~1-2 min over the tunnel.
    w_uids = np.arange(batch)
    w_items = rng.integers(1, n_items, size=(batch, T)).astype(np.int32)
    store.ingest_histories(w_uids, w_items, (w_items % n_cats).astype(np.int32))
    w_it = w_items[:, 0]
    store.update(w_uids, w_it, (w_it % n_cats).astype(np.int32))
    store.predict(w_uids, w_it, (w_it % n_cats).astype(np.int32))
    w_cand = rng.integers(1, n_items, size=(256, rank_c)).astype(np.int32)
    store.rank(w_uids[:256], w_cand, (w_cand % n_cats).astype(np.int32))

    # ---- bulk ingest: bootstrap all users' memories --------------------
    t0 = time.time()
    for lo in range(0, n_users, batch):
        uids = np.arange(lo, min(lo + batch, n_users))
        items = rng.integers(1, n_items, size=(len(uids), T)).astype(np.int32)
        store.ingest_histories(uids, items, (items % n_cats).astype(np.int32))
    dt_ingest = time.time() - t0
    ev_s = n_users * T / dt_ingest

    # ---- incremental update: one event per user, random user batches ----
    t0 = time.time()
    for _ in range(update_rounds):
        uids = rng.integers(0, n_users, size=batch)
        it = rng.integers(1, n_items, size=batch).astype(np.int32)
        store.update(uids, it, (it % n_cats).astype(np.int32))
    upd_s = update_rounds * batch / (time.time() - t0)

    # ---- predict --------------------------------------------------------
    t0 = time.time()
    for _ in range(predict_rounds):
        uids = rng.integers(0, n_users, size=batch)
        it = rng.integers(1, n_items, size=batch).astype(np.int32)
        store.predict(uids, it, (it % n_cats).astype(np.int32))
    prd_s = predict_rounds * batch / (time.time() - t0)

    # ---- rank: C candidates per user ------------------------------------
    t0 = time.time()
    for _ in range(predict_rounds):
        uids = rng.integers(0, n_users, size=256)
        cand = rng.integers(1, n_items, size=(256, rank_c)).astype(np.int32)
        store.rank(uids, cand, (cand % n_cats).astype(np.int32))
    rnk_s = predict_rounds * 256 * rank_c / (time.time() - t0)

    print(json.dumps({
        "metric": "serving_1m_users",
        "device_resident": bool(device_resident),
        "n_users": store.n_users,
        "ingest_events_per_sec": round(ev_s),
        "update_users_per_sec": round(upd_s),
        "predict_users_per_sec": round(prd_s),
        "rank_scores_per_sec": round(rnk_s),
        "rank_candidates": rank_c,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])

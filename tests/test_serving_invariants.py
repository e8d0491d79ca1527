"""Randomized invariant tests for the serving arena state machine
(serving/lifelong.py): uid->row indexing, amortized growth, bulk LRU
eviction with in-flight-row protection, and cold-start semantics must hold
under arbitrary interleavings of update/predict/ingest traffic — the kind
of state machinery scenario tests under-cover."""

import numpy as np
import pytest

import jax

from hpmn_tpu.configs import get_config
from hpmn_tpu.models import init_model
from hpmn_tpu.serving import UserMemoryStore

N_ITEMS, N_CATS = 120, 12


def _store(max_users=None, device_resident=False, arena_dtype="float32"):
    cfg = get_config("taobao_hpmn")
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    return UserMemoryStore(cfg, params, max_users=max_users,
                           device_resident=device_resident,
                           arena_dtype=arena_dtype)


def _check_index_invariants(store):
    # (a) no two uids share an arena row
    rows = list(store._row.values())
    assert len(rows) == len(set(rows)), "duplicate arena rows"
    # (b) row -> uid back-pointers agree with the forward map
    for uid, row in store._row.items():
        assert int(store._row_uid[row]) == uid
    # (c) every back-pointer has a forward entry (no leaked rows)
    live = np.flatnonzero(store._row_uid >= 0)
    assert len(live) == len(store._row)
    # (d) free rows don't overlap live rows
    assert not (set(store._free_rows) & set(rows))


@pytest.mark.heavy
@pytest.mark.parametrize("mode", ["host", "host_bf16", "device"])
def test_random_traffic_invariants(mode):
    """200 random batches of mixed traffic against a bounded arena: the
    index stays consistent, the bound holds, counters track an oracle of
    per-user event counts (reset on eviction), and predicts mutate
    nothing."""
    store = _store(max_users=24,
                   device_resident=(mode == "device"),
                   arena_dtype="bfloat16" if mode == "host_bf16"
                   else "float32")
    rng = np.random.default_rng(0)
    oracle_counts = {}  # uid -> events since (re)insertion

    for step in range(200):
        op = rng.choice(["update", "predict", "ingest"],
                        p=[0.6, 0.3, 0.1])
        n = int(rng.integers(1, 9))
        uids = rng.choice(60, size=n, replace=False).astype(np.int64)
        items = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
        cats = (items % N_CATS).astype(np.int32)
        if op == "update":
            live_before = set(store._row)
            store.update(uids, items, cats)
            # a uid absent before the call starts from a fresh row (new or
            # evicted-and-returned): its counter restarts at 1
            for u in uids:
                u = int(u)
                oracle_counts[u] = (oracle_counts.get(u, 0) + 1
                                    if u in live_before else 1)
        elif op == "predict":
            before = dict(store._row)
            scores = store.predict(uids, items, cats)
            assert scores.shape == (n,)
            assert ((scores > 0) & (scores < 1)).all()
            assert store._row == before, "predict mutated the index"
        else:
            T = int(rng.integers(2, 7))
            hist = rng.integers(1, N_ITEMS, size=(n, T)).astype(np.int32)
            store.ingest_histories(uids, hist,
                                   (hist % N_CATS).astype(np.int32))
            for u in uids:
                oracle_counts[int(u)] = T

        # prune oracle entries for evicted users
        oracle_counts = {u: c for u, c in oracle_counts.items()
                         if u in store._row}
        _check_index_invariants(store)
        assert store.n_users <= 24
        # counters of LIVE users match the oracle exactly
        live_uids = np.fromiter(store._row, np.int64)
        if len(live_uids):
            _, cnt = store._gather(live_uids)
            for u, c in zip(live_uids, np.asarray(cnt)):
                assert oracle_counts[int(u)] == int(c), (step, u)

    assert store.n_users > 0  # traffic actually populated the arena


def test_update_batch_larger_than_bound_refused():
    """A request touching more distinct users than max_users cannot be
    satisfied without evicting an in-flight row — must raise, not corrupt."""
    store = _store(max_users=4)
    uids = np.arange(10)
    items = np.ones(10, np.int32)
    with pytest.raises(ValueError):
        store.update(uids, items, items)


def test_growth_preserves_state():
    """Arena doubling must carry every live row across reallocation."""
    store = _store()  # unbounded: grows past _MIN_CAP
    rng = np.random.default_rng(1)
    n = store._MIN_CAP + 200
    uids = np.arange(n)
    items = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
    store.update(uids, items, (items % N_CATS).astype(np.int32))
    _check_index_invariants(store)
    assert store.n_users == n
    _, cnt = store._gather(uids[:: max(n // 50, 1)])
    np.testing.assert_array_equal(np.asarray(cnt), 1)

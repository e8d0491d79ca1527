"""Native preprocessing core tests: C++ parse + vectorized assembly vs the
pure-Python pipeline, on a generated UserBehavior-format CSV."""

import numpy as np
import pytest

from hpmn_tpu.data import native
from hpmn_tpu.data.preprocess import (process_csv_native, process_events,
                                      process_log)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _write_log(path, n_users=25, rng=None):
    rng = rng or np.random.default_rng(0)
    rows = []
    for u in range(n_users):
        for t in range(int(rng.integers(6, 20))):
            item = int(rng.integers(1, 60))
            btype = "pv" if rng.random() < 0.8 else "buy"
            rows.append((f"u{u}", f"i{item}", f"c{item % 7}", btype,
                         1500000 + t))
    # shuffle rows: the parser must not rely on input order
    rng.shuffle(rows)
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    return rows


def test_parse_csv_interning(tmp_path):
    log = tmp_path / "ub.csv"
    rows = _write_log(str(log))
    ev = native.parse_csv(str(log), behavior_col=3, behavior_keep="pv")
    kept = [r for r in rows if r[3] == "pv"]
    assert len(ev["uid"]) == len(kept)
    assert ev["n_users"] == len({r[0] for r in kept})
    assert ev["n_items"] == len({r[1] for r in kept}) + 1  # 1-based
    assert ev["n_cats"] == len({r[2] for r in kept}) + 1
    assert ev["item"].min() >= 1 and ev["cat"].min() >= 1
    # timestamps survive verbatim
    assert sorted(ev["ts"].tolist()) == sorted(r[4] for r in kept)
    # same (item -> cat) pairing everywhere
    pair = {}
    for i, c in zip(ev["item"], ev["cat"]):
        assert pair.setdefault(int(i), int(c)) == int(c)


def test_native_pipeline_against_ground_truth(tmp_path):
    """Reconstruct the expected per-user histories directly from the raw
    file (replaying the native first-seen interning) and check the fast
    pipeline's positive examples exactly. (The pure-Python process_log
    re-interns ids frequency-ordered, so arrays are not directly
    comparable; its own semantics are covered by tests/test_data.py.)"""
    log = tmp_path / "ub.csv"
    rows = _write_log(str(log))
    T = 12
    fast = process_csv_native(str(log), seq_len=T, behavior_col=3,
                              behavior_keep="pv", seed=0)
    kept = [r for r in rows if r[3] == "pv"]
    # replay the native interning (first-seen order over the file)
    umap, imap = {}, {}
    for u, i, c, b, ts in kept:
        umap.setdefault(u, len(umap))
        imap.setdefault(i, len(imap) + 1)  # 1-based
    by_user = {}
    for u, i, c, b, ts in kept:
        by_user.setdefault(umap[u], []).append((ts, imap[i]))
    pos = fast["label"] > 0.5
    by_example = {int(u): k for k, u in enumerate(fast["uid"][pos])}
    checked = 0
    for uid, events in by_user.items():
        if len(events) < 5:
            assert uid not in by_example
            continue
        events.sort(key=lambda e: e[0])
        ids = [i for _, i in events]
        hist, target = ids[:-1][-T:], ids[-1]
        k = by_example[uid]
        row = fast["item_seq"][pos][k]
        assert fast["target_item"][pos][k] == target
        np.testing.assert_array_equal(row[T - len(hist):], hist)
        assert (row[:T - len(hist)] == 0).all()
        assert fast["seq_mask"][pos][k].sum() == len(hist)
        checked += 1
    assert checked >= 20
    # python reference on the same events produces the same example count
    ev = native.parse_csv(str(log), behavior_col=3, behavior_keep="pv")
    slow = process_log(list(zip(ev["uid"].tolist(), ev["item"].tolist(),
                                ev["cat"].tolist(), ev["ts"].tolist())),
                       seq_len=T, seed=0)
    assert fast["label"].shape[0] == slow["label"].shape[0]
    assert fast["label"].mean() == 0.5


def test_process_events_truncates_to_seq_len():
    uid = np.zeros(30, np.int32)
    item = np.arange(1, 31, dtype=np.int32)
    cat = np.ones(30, np.int32)
    ts = np.arange(30, dtype=np.int64)
    out = process_events(uid, item, cat, ts, seq_len=8)
    assert out["item_seq"].shape == (2, 8)
    np.testing.assert_array_equal(out["item_seq"][0],
                                  np.arange(22, 30))  # last 8 before target
    assert out["target_item"][0] == 30
    assert out["seq_mask"].sum() == 16


# ---------------------------------------------------------------- batcher --


def test_native_batcher_matches_numpy_gather():
    """The threaded C++ gather == numpy fancy indexing for every Batch
    field dtype/shape, including 2-D sequence fields and repeated ids."""
    from hpmn_tpu.data import native_batcher

    if not native_batcher.available():
        pytest.skip("no g++ on this machine")
    rng = np.random.default_rng(0)
    N, T, B = 999, 37, 128
    arrays = {
        "a2d_i32": rng.integers(0, 1 << 20, (N, T)).astype(np.int32),
        "a2d_f32": rng.normal(size=(N, T)).astype(np.float32),
        "a1d_i32": rng.integers(0, 99, N).astype(np.int32),
        "a1d_f64": rng.normal(size=N),
    }
    idx = rng.integers(0, N, B).astype(np.int64)  # with duplicates
    got = native_batcher.gather(arrays, idx)
    for k, a in arrays.items():
        np.testing.assert_array_equal(got[k], a[idx], err_msg=k)
    assert native_batcher.n_threads() >= 1


def test_native_batcher_noncontiguous_fallback():
    from hpmn_tpu.data import native_batcher

    if not native_batcher.available():
        pytest.skip("no g++ on this machine")
    a = np.arange(40, dtype=np.int32).reshape(10, 4)[:, ::2]  # strided view
    got = native_batcher.gather({"x": a}, np.array([3, 1, 1]))
    np.testing.assert_array_equal(got["x"], a[[3, 1, 1]])


def test_batch_from_numpy_uses_native_and_matches(monkeypatch):
    """batch_from_numpy with indices == the pure-numpy path, and the env
    kill-switch forces the fallback."""
    from hpmn_tpu.data import native_batcher
    from hpmn_tpu.data.schema import batch_from_numpy, dummy_batch

    b = dummy_batch(32, 12, 500, 30, seed=1)
    arrays = {k: np.asarray(getattr(b, k)) for k in
              ("uid", "item_seq", "cat_seq", "seq_mask", "target_item",
               "target_cat", "label", "neg_item_seq", "neg_cat_seq")}
    idx = np.array([5, 3, 3, 31, 0])
    fast = batch_from_numpy(arrays, idx)
    monkeypatch.setenv("HPMN_TPU_NO_NATIVE_BATCHER", "1")
    assert not native_batcher.available()
    slow = batch_from_numpy(arrays, idx)
    for k in arrays:
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, k)), np.asarray(getattr(slow, k)),
            err_msg=k)


def test_native_batcher_oob_indices_keep_numpy_semantics():
    """Out-of-range / negative indices must behave like numpy (loud
    IndexError / wraparound), never raw pointer reads."""
    from hpmn_tpu.data import native_batcher

    if not native_batcher.available():
        pytest.skip("no g++ on this machine")
    a = np.arange(20, dtype=np.int32).reshape(10, 2)
    # negative wraps like numpy
    got = native_batcher.gather({"x": a}, np.array([-1, 2]))
    np.testing.assert_array_equal(got["x"], a[[-1, 2]])
    # out of range raises like numpy
    with pytest.raises(IndexError):
        native_batcher.gather({"x": a}, np.array([3, 10]))

"""Serving daemon tests: protocol round-trip, micro-batch fusion under
concurrent clients, update visibility, and parity with direct store calls
(hpmn_tpu/serving/server.py)."""

import threading

import jax
import numpy as np
import pytest

from hpmn_tpu.configs import get_config
from hpmn_tpu.models import init_model
from hpmn_tpu.serving import UserMemoryStore
from hpmn_tpu.serving.client import ServingClient
from hpmn_tpu.serving.server import MicroBatcher, ServingServer, _bucket

N_ITEMS, N_CATS = 200, 20


def _store(seed=0):
    cfg = get_config("taobao_hpmn")
    params = init_model(jax.random.key(seed), cfg, N_ITEMS, N_CATS)
    return cfg, params, UserMemoryStore(cfg, params)


def _seed_users(store, uids, T=9, seed=3):
    rng = np.random.default_rng(seed)
    items = rng.integers(1, N_ITEMS, size=(len(uids), T)).astype(np.int32)
    cats = (items % N_CATS).astype(np.int32)
    store.ingest_histories(np.asarray(uids, np.int32), items, cats)
    return items, cats


def test_bucket_sizes():
    assert _bucket(1, 256) == 1
    assert _bucket(3, 256) == 4
    assert _bucket(17, 256) == 32
    # Above max_batch STILL rounds up: max_batch caps request count per
    # drain, not fused row count — exact sizes there would compile one
    # XLA program per distinct total.
    assert _bucket(300, 256) == 512


def test_server_predict_rank_update_roundtrip():
    _, params, store = _store()
    uids = np.arange(1, 9, dtype=np.int32)
    _seed_users(store, uids)
    # Direct-store references BEFORE starting the server.
    cand_i = np.arange(1, 9, dtype=np.int32)
    cand_c = cand_i % N_CATS
    ref_pred = store.predict(uids, cand_i, cand_c)
    ci2 = np.stack([cand_i, cand_i + 1], axis=1) % N_ITEMS
    cc2 = ci2 % N_CATS
    ref_rank = store.rank(uids, ci2, cc2)

    with ServingServer(store, max_wait_ms=1.0) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            got = cl.predict(uids, cand_i, cand_c)
            np.testing.assert_allclose(got, ref_pred, atol=1e-6)
            gotr = cl.rank(uids, ci2, cc2)
            np.testing.assert_allclose(gotr, ref_rank, atol=1e-6)
            # update changes the scores and matches a direct-store replay
            cl.update(uids, cand_i, cand_c)
            got2 = cl.predict(uids, cand_i, cand_c)
            assert not np.allclose(got2, ref_pred)
            np.testing.assert_allclose(got2,
                                       store.predict(uids, cand_i, cand_c),
                                       atol=1e-6)
            st = cl.stats()
            assert st["stats"]["requests"] >= 4
            assert st["n_users"] == len(uids)


def test_server_error_reply_keeps_serving():
    _, _, store = _store()
    _seed_users(store, np.arange(1, 5, dtype=np.int32))
    with ServingServer(store) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            with pytest.raises(RuntimeError, match="unknown method"):
                cl._call("bogus")
            # connection still usable afterwards
            s = cl.predict([1], [2], [2 % N_CATS])
            assert s.shape == (1,)


def test_microbatcher_fuses_concurrent_requests():
    """N threads x 1-row predicts with a generous fuse window -> fewer
    dispatched batches than requests, identical scores to direct calls."""
    _, _, store = _store()
    uids = np.arange(1, 17, dtype=np.int32)
    _seed_users(store, uids)
    cand_i = (uids * 3 % N_ITEMS).astype(np.int32)
    cand_c = cand_i % N_CATS
    ref = store.predict(uids, cand_i, cand_c)

    with ServingServer(store, max_wait_ms=50.0) as srv:
        results = {}
        errs = []
        barrier = threading.Barrier(len(uids))

        def one(i):
            try:
                with ServingClient(srv.host, srv.port) as cl:
                    barrier.wait(timeout=10)
                    results[i] = cl.predict([uids[i]], [cand_i[i]],
                                            [cand_c[i]])[0]
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(len(uids))]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        assert not errs
        got = np.array([results[i] for i in range(len(uids))])
        np.testing.assert_allclose(got, ref, atol=1e-6)
        stats = srv.batcher.stats
        assert stats["requests"] == len(uids)
        assert stats["batches"] < len(uids)  # fusion actually happened


@pytest.mark.slow
def test_serve_daemon_cli(tmp_path):
    """tools/serve.py end to end as a real OS process: bundle -> daemon ->
    client predict/update -> SIGTERM with --save_on_exit persists the
    advanced memories."""
    import os
    import signal as _signal
    import subprocess
    import sys as _sys

    _, _, store = _store()
    uids = np.arange(1, 6, dtype=np.int32)
    _seed_users(store, uids, T=9)
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    store.save_bundle(str(bundle))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [_sys.executable, "tools/serve.py", "--bundle", str(bundle),
         "--port", "0", "--save_on_exit", "--force_cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=repo)
    try:
        line = proc.stdout.readline()  # "serving bundle ... on host:port ..."
        assert "serving bundle" in line, (line, proc.stderr.read())
        hostport = line.split(" on ")[1].split()[0]
        host, port = hostport.rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            s = cl.predict(uids, uids % N_ITEMS, uids % N_CATS)
            assert s.shape == (len(uids),)
            cl.update(uids, uids % N_ITEMS, uids % N_CATS)
        proc.send_signal(_signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    back = UserMemoryStore.load_bundle(str(bundle))
    _, cnt = back._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), 10)  # 9 history + 1


@pytest.mark.slow
def test_save_on_exit_duplicate_bundle_paths_do_not_clobber(tmp_path):
    """Two model names serving the SAME bundle path (a canary reloaded from
    the bundle already serving default) must not clobber each other on
    --save_on_exit: the first claimant keeps the shared path, the other is
    diverted to a per-model subpath, and BOTH models' post-snapshot
    memories are recoverable (ADVICE r2 medium)."""
    import os
    import signal as _signal
    import subprocess
    import sys as _sys

    _, _, store = _store()
    uids = np.arange(1, 6, dtype=np.int32)
    _seed_users(store, uids, T=9)
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    store.save_bundle(str(bundle))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [_sys.executable, "tools/serve.py", "--bundle", str(bundle),
         "--port", "0", "--save_on_exit", "--force_cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=repo)
    try:
        line = proc.stdout.readline()
        assert "serving bundle" in line, (line, proc.stderr.read())
        hostport = line.split(" on ")[1].split()[0]
        host, port = hostport.rsplit(":", 1)
        items = (uids * 3 % N_ITEMS).astype(np.int32)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            cl.reload(str(bundle), model="canary")  # same path as default
            # divergent updates: default gets 1 event, canary gets 2
            cl.update(uids, items, items % N_CATS)
            cl.update(uids, items, items % N_CATS, model="canary")
            cl.update(uids, (items + 1) % N_ITEMS,
                      (items + 1) % N_CATS, model="canary")
        proc.send_signal(_signal.SIGTERM)
        proc.wait(timeout=60)
        out = proc.stdout.read()
    finally:
        if proc.poll() is None:
            proc.kill()
    # default kept the shared path; canary was diverted, loudly
    assert "shares a bundle path" in out, out
    back_default = UserMemoryStore.load_bundle(str(bundle))
    _, cnt = back_default._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), 10)  # 9 history + 1
    canary_path = f"{bundle}.canary"
    assert os.path.isdir(canary_path), out
    back_canary = UserMemoryStore.load_bundle(canary_path)
    _, cnt = back_canary._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), 11)  # 9 history + 2


def test_update_padding_is_exact_and_creates_no_users():
    """Fused update batches pad by replicating the first (uid, event) row;
    the duplicate collapses to ONE event application (gather-before-write),
    other users are untouched, and no sentinel/extra user is created —
    the padded fused update equals a direct store.update."""
    _, params, store = _store()
    uids = np.arange(1, 6, dtype=np.int32)  # 5 -> bucket 8: 3 pad rows
    _seed_users(store, uids)
    ref = _store()[2]
    _seed_users(ref, uids)
    batcher = MicroBatcher(store, max_batch=64, max_wait_ms=1.0)
    try:
        items = (uids * 3 % N_ITEMS).astype(np.int32)
        fut = batcher.submit("update", {
            "uids": uids.tolist(), "item_ids": items.tolist(),
            "cat_ids": (items % N_CATS).tolist()})
        fut.result(timeout=10)
        ref.update(uids, items, (items % N_CATS).astype(np.int32))
        m1, c1 = store._gather(uids)
        m2, c2 = ref._gather(uids)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert store.n_users == len(uids)  # padding created no user
    finally:
        batcher.close()


def test_fused_updates_same_user_apply_sequentially():
    """Two queued updates for the SAME uid must both land (the dispatcher
    splits conflicting requests into sequential sub-batches — a single
    fused gather-before-write batch would drop one)."""
    _, _, store = _store()
    _seed_users(store, np.array([5], np.int32), T=3)
    ref = _store()[2]
    _seed_users(ref, np.array([5], np.int32), T=3)
    batcher = MicroBatcher(store, max_batch=64, max_wait_ms=200.0)
    try:
        f1 = batcher.submit("update", {"uids": [5], "item_ids": [10],
                                       "cat_ids": [10 % N_CATS]})
        f2 = batcher.submit("update", {"uids": [5], "item_ids": [11],
                                       "cat_ids": [11 % N_CATS]})
        f1.result(timeout=10), f2.result(timeout=10)
        ref.update([5], [10], [10 % N_CATS])
        ref.update([5], [11], [11 % N_CATS])
        m1, c1 = store._gather(np.array([5]))
        m2, c2 = ref._gather(np.array([5]))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   atol=1e-6)
    finally:
        batcher.close()


def test_malformed_rank_fails_request_not_dispatcher():
    """A malformed payload must error THAT request; the dispatcher keeps
    serving afterwards."""
    _, _, store = _store()
    _seed_users(store, np.arange(1, 4, dtype=np.int32))
    with ServingServer(store) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            with pytest.raises(RuntimeError, match="malformed|scores"):
                cl._call("rank", uids=[1], cand_items=[2], cand_cats=[2])
            s = cl.predict([1], [2], [2 % N_CATS])  # still alive
            assert s.shape == (1,)


def test_close_flushes_queued_updates():
    """close() drains accepted requests before returning (the
    --save_on_exit contract)."""
    _, _, store = _store()
    _seed_users(store, np.arange(1, 9, dtype=np.int32))
    batcher = MicroBatcher(store, max_batch=2, max_wait_ms=0.0)
    futs = [batcher.submit("update", {"uids": [int(u)], "item_ids": [3],
                                      "cat_ids": [3]})
            for u in range(1, 9)]
    batcher.close()
    assert all(f.done() for f in futs)
    _, cnt = store._gather(np.arange(1, 9))
    np.testing.assert_array_equal(np.asarray(cnt), 10)  # 9 hist + 1 each


def test_sharded_serving_matches_single_store():
    """Two independent daemons + uid-hash fan-out == one store with the
    same params: update routing is sticky, scores identical, both shards
    actually carry traffic."""
    from hpmn_tpu.serving.sharded import ShardedServingClient

    cfg, params, ref_store = _store()
    uids = np.arange(1, 17, dtype=np.int64)
    T = 9
    items, cats = _seed_users(ref_store, uids, T=T)

    stores = [_store()[2] for _ in range(2)]  # fresh stores, same key=0
    with ServingServer(stores[0]) as s0, ServingServer(stores[1]) as s1:
        with ShardedServingClient([(s0.host, s0.port),
                                   (s1.host, s1.port)]) as cl:
            # replay the same histories through the sharded surface
            for t in range(T):
                cl.update(uids, items[:, t], cats[:, t])
            cand_i = (uids * 7 % N_ITEMS).astype(np.int32)
            cand_c = cand_i % N_CATS
            got = cl.predict(uids, cand_i, cand_c)
            ref = ref_store.predict(uids, cand_i, cand_c)
            np.testing.assert_allclose(got, ref, atol=1e-5)
            # rank parity too
            ci2 = np.stack([cand_i, cand_i + 1], 1) % N_ITEMS
            got_r = cl.rank(uids, ci2, ci2 % N_CATS)
            ref_r = ref_store.rank(uids, ci2, ci2 % N_CATS)
            np.testing.assert_allclose(got_r, ref_r, atol=1e-5)
            st = cl.stats()
            assert len(st) == 2
            assert all(s["n_users"] == 8 for s in st)  # even uid split


def test_sharded_client_empty_request_returns_arrays():
    from hpmn_tpu.serving.sharded import ShardedServingClient

    _, _, store = _store()
    _seed_users(store, np.arange(1, 4, dtype=np.int32))
    with ServingServer(store) as srv:
        with ShardedServingClient([(srv.host, srv.port)]) as cl:
            p = cl.predict([], [], [])
            assert p.shape == (0,)
            r = cl.rank(np.zeros((0,), np.int64),
                        np.zeros((0, 4), np.int32), np.zeros((0, 4), np.int32))
            assert r.shape == (0, 4)


def test_journal_roundtrip_and_torn_tail(tmp_path):
    """Write-ahead journal: full batches replay exactly; a torn last
    record (crash mid-write) is skipped, everything before it survives."""
    from hpmn_tpu.serving.journal import MAGIC, UpdateJournal

    p = str(tmp_path / "updates.jrnl")
    j = UpdateJournal(p)
    j.append([1, 2], [10, 11], [3, 4])
    j.append([5], [12], [6])
    j.close()
    got = list(UpdateJournal.replay(p))
    assert len(got) == 2
    np.testing.assert_array_equal(got[0][0], [1, 2])
    np.testing.assert_array_equal(got[1][1], [12])
    # tear the tail: drop the last 3 bytes (crash mid-write)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-3])
    got = list(UpdateJournal.replay(p))
    assert len(got) == 1  # torn record dropped, first intact
    # truncate resets
    j2 = UpdateJournal(p)
    j2.truncate()
    j2.close()
    assert list(UpdateJournal.replay(p)) == []


@pytest.mark.slow
def test_daemon_crash_replays_journal(tmp_path):
    """SIGKILL the daemon (no save) after accepted updates; a restart with
    the same bundle + journal replays them — no lifelong events lost."""
    import os
    import signal as _signal
    import subprocess
    import sys as _sys

    _, _, store = _store()
    uids = np.arange(1, 6, dtype=np.int32)
    _seed_users(store, uids, T=9)
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    store.save_bundle(str(bundle))
    jrnl = str(tmp_path / "updates.jrnl")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def launch():
        return subprocess.Popen(
            [_sys.executable, "tools/serve.py", "--bundle", str(bundle),
             "--port", "0", "--journal", jrnl, "--force_cpu"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo)

    proc = launch()
    try:
        while True:
            line = proc.stdout.readline()
            assert line, proc.stderr.read()
            if "serving bundle" in line:
                break
        host, port = line.split(" on ")[1].split()[0].rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            cl.update(uids, uids % N_ITEMS, uids % N_CATS)
            cl.update(uids[:2], uids[:2] % N_ITEMS, uids[:2] % N_CATS)
        proc.send_signal(_signal.SIGKILL)  # crash: nothing saved
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    proc = launch()
    try:
        saw_replay = False
        while True:
            line = proc.stdout.readline()
            assert line, proc.stderr.read()
            if "replayed" in line:
                saw_replay = True
            if "serving bundle" in line:
                break
        assert saw_replay
        host, port = line.split(" on ")[1].split()[0].rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            st = cl.stats()
            assert st["n_users"] == 5
        proc.send_signal(_signal.SIGTERM)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # Offline proof the events landed: bundle + journal replay == the
    # direct-store result (9 history events, +2 for uids 1-2, +1 for 3-5).
    from hpmn_tpu.serving.journal import MAGIC, UpdateJournal

    back = UserMemoryStore.load_bundle(str(bundle))
    for u, i, c in UpdateJournal.replay(jrnl):
        back.update(u, i, c)
    _, cnt = back._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), [11, 11, 10, 10, 10])


def test_stats_latency_percentiles():
    _, _, store = _store()
    _seed_users(store, np.arange(1, 4, dtype=np.int32))
    with ServingServer(store) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            for _ in range(5):
                cl.predict([1], [2], [2 % N_CATS])
            st = cl.stats()
            lat = st["latency_ms"]
            assert lat["n"] >= 5
            assert 0 <= lat["p50"] <= lat["p95"] <= lat["p99"]


@pytest.mark.slow
def test_serve_fleet_cli(tmp_path):
    """tools/serve_fleet.py end to end: one command spawns N shard daemons
    on ephemeral ports, prints the ShardedServingClient address list,
    serves with sticky uid placement, and SIGTERM stops the whole fleet
    cleanly."""
    import os
    import signal as _signal
    import subprocess
    import sys as _sys

    from hpmn_tpu.serving.sharded import ShardedServingClient

    _, _, store = _store()
    uids = np.arange(1, 9, dtype=np.int32)
    _seed_users(store, uids, T=9)
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    store.save_bundle(str(bundle))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [_sys.executable, "tools/serve_fleet.py", "--bundle", str(bundle),
         "--shards", "2", "--base_port", "0", "--force_cpu",
         "--journal_dir", str(tmp_path / "journals")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=repo)
    try:
        addrs = None
        for _ in range(50):
            line = proc.stdout.readline()
            assert line, proc.stderr.read()
            if line.startswith("FLEET ready:"):
                addrs = [(h, int(p)) for h, p in
                         (a.rsplit(":", 1)
                          for a in line.split(":", 1)[1].split())]
                break
        assert addrs and len(addrs) == 2, addrs
        cand = (uids * 7 % N_ITEMS).astype(np.int32)
        ccat = (cand % N_CATS).astype(np.int32)
        want = store.predict(uids, cand, ccat)
        with ShardedServingClient(addrs, timeout_s=120) as cl:
            got = cl.predict(uids, cand, ccat)
            np.testing.assert_allclose(got, want, atol=1e-6)
            # update -> predict coherence through the shards
            cl.update(uids, cand, ccat)
            store.update(uids, cand, ccat)
            np.testing.assert_allclose(cl.predict(uids, cand, ccat),
                                       store.predict(uids, cand, ccat),
                                       atol=1e-6)
        # journals captured the fan-out updates per shard
        jdir = tmp_path / "journals"
        assert sorted(os.listdir(jdir)) == ["shard_0.journal",
                                            "shard_1.journal"]
        assert all((jdir / f).stat().st_size > 0 for f in os.listdir(jdir))
        proc.send_signal(_signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_multi_model_daemon():
    """One daemon, several named stores (A/B / canary): requests route by
    the 'model' field, updates hit only the addressed store, stats report
    per-model user counts, unknown models fail their request only."""
    _, _, a = _store(seed=0)
    _, _, b = _store(seed=1)
    uids = np.arange(1, 6, dtype=np.int32)
    _seed_users(a, uids, T=9, seed=3)
    _seed_users(b, uids, T=9, seed=4)
    cand = (uids * 3 % N_ITEMS).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    want_a = a.predict(uids, cand, ccat)
    want_b = b.predict(uids, cand, ccat)
    assert not np.allclose(want_a, want_b)  # genuinely different models

    with ServingServer({"default": a, "candidate": b}, port=0) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            np.testing.assert_allclose(cl.predict(uids, cand, ccat),
                                       want_a, atol=1e-6)
            np.testing.assert_allclose(
                cl.predict(uids, cand, ccat, model="candidate"),
                want_b, atol=1e-6)
            # update routes to the addressed store only
            cl.update(uids, cand, ccat, model="candidate")
            _, cnt_a = a._gather(uids)
            _, cnt_b = b._gather(uids)
            np.testing.assert_array_equal(np.asarray(cnt_a), 9)
            np.testing.assert_array_equal(np.asarray(cnt_b), 10)
            st = cl.stats()
            assert st["models"] == {"default": 5, "candidate": 5}
            try:
                cl.predict(uids, cand, ccat, model="nope")
                assert False, "expected unknown-model error"
            except RuntimeError as e:
                assert "unknown model" in str(e)
            # the daemon keeps serving after the failed request
            np.testing.assert_allclose(cl.predict(uids, cand, ccat),
                                       a.predict(uids, cand, ccat),
                                       atol=1e-6)


def test_daemon_bundle_reload(tmp_path):
    """Zero-downtime refresh: a reload request swaps the store on the
    dispatcher thread; later requests observe the new model, the journal
    truncates (the new bundle is ground truth), and serving never stops."""
    from hpmn_tpu.serving import UserMemoryStore
    from hpmn_tpu.serving.journal import MAGIC, UpdateJournal

    _, _, a = _store(seed=0)
    _, _, b = _store(seed=1)
    uids = np.arange(1, 6, dtype=np.int32)
    _seed_users(a, uids, T=9, seed=3)
    _seed_users(b, uids, T=9, seed=4)
    bdir = tmp_path / "b"
    bdir.mkdir()
    b.save_bundle(str(bdir))
    cand = (uids * 3 % N_ITEMS).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)

    jpath = str(tmp_path / "wal")
    journal = UpdateJournal(jpath)
    loader = lambda path: UserMemoryStore.load_bundle(path)  # noqa: E731
    with ServingServer(a, port=0, journal=journal, loader=loader) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            cl.update(uids, cand, ccat)  # journaled against the old store
            import os
            assert os.path.getsize(jpath) > len(MAGIC)
            want_old = cl.predict(uids, cand, ccat)
            n = cl.reload(str(bdir))
            assert n == 5
            got = cl.predict(uids, cand, ccat)
            np.testing.assert_allclose(got, b.predict(uids, cand, ccat),
                                       atol=1e-6)
            assert not np.allclose(got, want_old)
            # truncated on reload (only the magic header remains)
            assert os.path.getsize(jpath) == len(MAGIC)
            # still serving: updates hit the NEW store
            cl.update(uids, cand, ccat)
            _, cnt = srv.batcher.stores["default"]._gather(uids)
            np.testing.assert_array_equal(np.asarray(cnt), 10)


def test_reload_retargets_persistence_and_registers_new_models(tmp_path):
    """Persistence must follow reloads: after a default-model reload the
    live bundle map points at the NEW bundle (so --save_on_exit never
    writes post-reload memories into a superseded bundle), ``srv.store``
    observes the swap, and a reload that INTRODUCES a model name registers
    a write-ahead journal for it and shows up in stats."""
    import os

    from hpmn_tpu.serving.journal import MAGIC, UpdateJournal

    _, _, a = _store(seed=0)
    _, _, b = _store(seed=1)
    uids = np.arange(1, 6, dtype=np.int32)
    _seed_users(a, uids, T=9, seed=3)
    _seed_users(b, uids, T=9, seed=4)
    adir, bdir = tmp_path / "a", tmp_path / "b"
    adir.mkdir(), bdir.mkdir()
    b.save_bundle(str(bdir))
    cand = (uids * 3 % N_ITEMS).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)

    jpath = lambda name: str(  # noqa: E731 — main()'s naming scheme
        tmp_path / ("wal" if name == "default" else f"wal.{name}"))
    loader = lambda p: UserMemoryStore.load_bundle(p)  # noqa: E731
    with ServingServer(a, port=0, loader=loader,
                       journal={"default": UpdateJournal(jpath("default"))},
                       bundles={"default": str(adir)},
                       journal_factory=lambda n: UpdateJournal(jpath(n))
                       ) as srv:
        with ServingClient(srv.host, srv.port) as cl:
            cl.reload(str(bdir))
            # the live bundle map and the store alias both track the swap
            assert srv.batcher.bundles["default"] == str(bdir)
            assert srv.store is srv.batcher.stores["default"]
            # reload introducing a NEW model name: routed, journaled,
            # visible in stats, and given a persistence target
            cl.reload(str(bdir), model="canary")
            assert srv.batcher.bundles["canary"] == str(bdir)
            assert "canary" in cl.stats()["models"]
            cl.update(uids, cand, ccat, model="canary")
            assert os.path.getsize(jpath("canary")) > len(MAGIC)
            # default journal untouched by the canary's updates
            assert os.path.getsize(jpath("default")) == len(MAGIC)
            # the save_on_exit walk covers the dynamic model
            live = srv.batcher
            assert set(live.stores) == set(live.bundles) == {"default",
                                                             "canary"}


def test_warmup_creates_no_users(tmp_path):
    """--warmup pre-compiles predict buckets with unknown-uid cold-start
    reads; it must not allocate arena rows or change any state."""
    _, _, store = _store()
    uids = np.arange(1, 4, dtype=np.int32)
    _seed_users(store, uids, T=9)
    before = store.n_users
    for b in (1, 2, 4, 8):
        u = np.full((b,), -1, np.int64)
        ones = np.ones((b,), np.int32)
        s = store.predict(u, ones, ones)
        assert s.shape == (b,)
    assert store.n_users == before


def test_protocol_garbage_does_not_kill_daemon():
    """Malformed wire input (random bytes, oversized length prefix, valid
    frame with broken JSON, valid JSON with missing fields) must fail only
    the offending connection/request — the daemon keeps serving."""
    import socket
    import struct

    _, _, store = _store()
    uids = np.arange(1, 4, dtype=np.int32)
    _seed_users(store, uids, T=9)
    cand = (uids % N_ITEMS).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    with ServingServer(store, port=0) as srv:
        def attack(payload: bytes):
            s = socket.create_connection((srv.host, srv.port), timeout=10)
            try:
                s.sendall(payload)
                s.settimeout(5)
                try:
                    s.recv(4096)
                except (socket.timeout, ConnectionError, OSError):
                    pass
            finally:
                s.close()

        rng = np.random.default_rng(0)
        attack(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))  # noise
        attack(struct.pack(">I", 1 << 30))  # absurd length prefix
        body = b"this is not json"
        attack(struct.pack(">I", len(body)) + body)  # framed non-JSON
        body = b'{"id": 1, "method": "predict"}'  # missing fields
        attack(struct.pack(">I", len(body)) + body)
        body = b'{"id": 1, "method": "update", "uids": [1], ' \
               b'"item_ids": "nope", "cat_ids": [2]}'  # wrong types
        attack(struct.pack(">I", len(body)) + body)

        # the daemon still answers a well-formed client correctly
        with ServingClient(srv.host, srv.port) as cl:
            got = cl.predict(uids, cand, ccat)
        np.testing.assert_allclose(got, store.predict(uids, cand, ccat),
                                   atol=1e-6)

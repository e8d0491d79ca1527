"""Lifelong serving tests: incremental per-user memory == training oracle
([P §4.5], SURVEY.md §3.5) and round-trip persistence."""

import chex
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hpmn_tpu.configs import get_config
from hpmn_tpu.models import init_model
from hpmn_tpu.models.embedding import dense_lookup
from hpmn_tpu.models.hpmn import encode_oracle
from hpmn_tpu.serving import UserMemoryStore

N_ITEMS, N_CATS = 200, 20


def _setup():
    cfg = get_config("taobao_hpmn")  # 3-layer, period 3
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    return cfg, params


def test_incremental_equals_oracle():
    cfg, params = _setup()
    rng = np.random.default_rng(0)
    B, T = 4, 17  # deliberately not a multiple of period**l
    items = rng.integers(1, N_ITEMS, size=(B, T)).astype(np.int32)
    cats = (items % N_CATS).astype(np.int32)

    store = UserMemoryStore(cfg, params)
    uids = np.arange(B)
    for t in range(T):
        store.update(uids, items[:, t], cats[:, t])

    x = dense_lookup(params["embedding"], jnp.asarray(items),
                     jnp.asarray(cats))
    mem_oracle = encode_oracle(params["encoder"], x, jnp.ones((B, T)),
                               cfg.model.hpmn_period)
    mem_store, _ = store._gather(uids)
    chex.assert_trees_all_close(mem_store, mem_oracle, atol=1e-5)


def test_bulk_ingest_equals_incremental_replay():
    """ingest_histories (one batched encode) == replaying the same events
    through update() one at a time, including the continued firing grid."""
    cfg, params = _setup()
    rng = np.random.default_rng(7)
    B, T = 3, 18
    items = rng.integers(1, N_ITEMS, size=(B, T)).astype(np.int32)
    cats = (items % N_CATS).astype(np.int32)

    inc = UserMemoryStore(cfg, params)
    uids = np.arange(B)
    for t in range(T):
        inc.update(uids, items[:, t], cats[:, t])

    bulk = UserMemoryStore(cfg, params)
    bulk.ingest_histories(uids, items, cats)

    m1, c1 = inc._gather(uids)
    m2, c2 = bulk._gather(uids)
    chex.assert_trees_all_close(m1, m2, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # ...and one more incremental event continues identically on both.
    nxt_i = rng.integers(1, N_ITEMS, size=B).astype(np.int32)
    inc.update(uids, nxt_i, (nxt_i % N_CATS).astype(np.int32))
    bulk.update(uids, nxt_i, (nxt_i % N_CATS).astype(np.int32))
    chex.assert_trees_all_close(inc._gather(uids)[0], bulk._gather(uids)[0],
                                atol=1e-5)


def test_predict_matches_training_forward():
    cfg, params = _setup()
    rng = np.random.default_rng(1)
    B, T = 3, 9
    items = rng.integers(1, N_ITEMS, size=(B, T)).astype(np.int32)
    cats = (items % N_CATS).astype(np.int32)
    store = UserMemoryStore(cfg, params)
    uids = np.arange(B)
    for t in range(T):
        store.update(uids, items[:, t], cats[:, t])
    cand_i = rng.integers(1, N_ITEMS, size=B).astype(np.int32)
    cand_c = (cand_i % N_CATS).astype(np.int32)
    scores = store.predict(uids, cand_i, cand_c)
    assert scores.shape == (B,)
    assert ((scores > 0) & (scores < 1)).all()


def test_save_load_roundtrip(tmp_path):
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params)
    store.update([7, 9], [3, 4], [1, 2])
    store.update([7], [5], [2])
    store.save(str(tmp_path))
    store2 = UserMemoryStore.load(str(tmp_path), cfg, params)
    assert store2.n_users == 2
    _, cnt = store2._gather(np.array([7, 9]))
    np.testing.assert_array_equal(np.asarray(cnt), [2, 1])
    m1, c1 = store._gather(np.array([7, 9]))
    m2, c2 = store2._gather(np.array([7, 9]))
    chex.assert_trees_all_close(m1, m2)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_new_user_starts_cold():
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params)
    mem, cnt = store._gather(np.array([42]))
    assert float(jnp.abs(mem).max()) == 0.0 and int(cnt[0]) == 0
    # predicting for an unseen user works (cold-start read of zero memory)
    s = store.predict([42], [5], [1])
    assert 0 < float(s[0]) < 1


def test_arena_growth_and_identity():
    """Store scales past its initial capacity with state preserved
    (contiguous-arena store, VERDICT r1 weak #6)."""
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params)
    n = UserMemoryStore._MIN_CAP + 50  # force at least one growth
    rng = np.random.default_rng(3)
    uids = rng.permutation(n) + 1000
    items = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
    store.update(uids, items, (items % N_CATS).astype(np.int32))
    assert store.n_users == n
    _, cnt = store._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), np.ones(n, np.int32))
    # second event for a subset bumps only that subset
    store.update(uids[:10], items[:10], (items[:10] % N_CATS).astype(np.int32))
    _, cnt = store._gather(uids[:12])
    np.testing.assert_array_equal(np.asarray(cnt),
                                  [2] * 10 + [1] * 2)


def test_lru_eviction_bound_and_cold_restart():
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params, max_users=8)
    one = np.array([1], np.int32)
    # strict touch order: uid u last touched at clock u+1
    for u in range(8):
        store.update(np.array([u]), one, one)
    assert store.n_users == 8
    # a new user forces a bulk eviction of the least-recently-touched
    store.update(np.array([999]), one, one)
    assert store.n_users <= 8
    _, cnt999 = store._gather(np.array([999]))
    assert int(cnt999[0]) == 1
    # k = max(8 // 4, 1) = 2 victims: exactly uids 0 and 1
    _, cnt = store._gather(np.arange(8))
    np.testing.assert_array_equal(np.asarray(cnt), [0, 0, 1, 1, 1, 1, 1, 1])
    # an evicted user restarts cold (documented cache semantics)
    store.update(np.array([0]), one, one)
    _, cnt0 = store._gather(np.array([0]))
    assert int(cnt0[0]) == 1


def test_rank_matches_predict_columns():
    """rank(uids, [B,C] candidates) column c == predict of column c."""
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params)
    rng = np.random.default_rng(0)
    uids = np.arange(6)
    hist = rng.integers(1, N_ITEMS, size=(6, 12)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))

    C = 5
    cand = rng.integers(1, N_ITEMS, size=(6, C)).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    ranked = store.rank(uids, cand, ccat)
    assert ranked.shape == (6, C)
    for c in range(C):
        col = store.predict(uids, cand[:, c], ccat[:, c])
        np.testing.assert_allclose(ranked[:, c], col, rtol=1e-5)


def test_serving_with_user_emb_tower():
    """Configs with use_user_emb must serve too (tower input includes the
    user embedding — predict/rank gather it by uid)."""
    import jax

    from hpmn_tpu.models import init_model

    cfg = _setup()[0]
    cfg.model.use_user_emb = True
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS, n_users=64)
    store = UserMemoryStore(cfg, params)
    one = np.array([3], np.int32)
    store.update(np.array([7]), one, one)
    s = store.predict(np.array([7]), one, one)
    assert 0 < float(s[0]) < 1
    r = store.rank(np.array([7]), np.array([[3, 4]], np.int32),
                   np.array([[3, 4]], np.int32))
    assert r.shape == (1, 2)


@pytest.mark.parametrize("resident", [False, True])
def test_device_resident_matches_host_store(resident):
    """The device-resident arena is behavior-identical to the host arena:
    same memories, counters, predictions, growth, and save/load."""
    cfg, params = _setup()
    ref = UserMemoryStore(cfg, params)
    store = UserMemoryStore(cfg, params, device_resident=resident)
    rng = np.random.default_rng(5)
    n = 40
    uids = rng.permutation(n) + 100
    hist = rng.integers(1, N_ITEMS, size=(n, 12)).astype(np.int32)
    it = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
    for s in (ref, store):
        s.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))
        s.update(uids, it, (it % N_CATS).astype(np.int32))
    m1, c1 = ref._gather(uids)
    m2, c2 = store._gather(uids)
    chex.assert_trees_all_close(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # unknown uid -> cold-start zeros in both modes
    m3, c3 = store._gather(np.array([999999]))
    assert float(np.abs(np.asarray(m3)).sum()) == 0.0
    assert int(np.asarray(c3)[0]) == 0


def test_device_resident_growth_and_roundtrip(tmp_path):
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params, device_resident=True)
    n = UserMemoryStore._MIN_CAP + 10  # force device arena growth
    rng = np.random.default_rng(7)
    uids = np.arange(n)
    items = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
    store.update(uids, items, (items % N_CATS).astype(np.int32))
    assert store.n_users == n
    store.save(str(tmp_path))
    back = UserMemoryStore.load(str(tmp_path), cfg, params,
                                device_resident=True)
    m1, c1 = store._gather(uids[:17])
    m2, c2 = back._gather(uids[:17])
    chex.assert_trees_all_close(np.asarray(m1), np.asarray(m2), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@pytest.mark.parametrize("resident", [False, True])
def test_eviction_never_recycles_in_flight_rows(resident):
    """A full store receiving a batch that contains both its LRU user and a
    new user must NOT evict the in-flight LRU user (its row would be
    recycled to the new uid inside the same call, corrupting memory)."""
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params, max_users=4,
                            device_resident=resident)
    one = np.array([1], np.int32)
    for u in range(4):  # fill; uid 0 is least-recently-touched
        store.update(np.array([u]), one, one)
    # One batch: [LRU user, brand-new user] -> eviction must pick uid 1.
    store.update(np.array([0, 99]), np.array([1, 1], np.int32),
                 np.array([1, 1], np.int32))
    _, cnt = store._gather(np.array([0, 99, 1, 2, 3]))
    got = np.asarray(cnt)
    assert got[0] == 2, got   # LRU user's state survived and updated
    assert got[1] == 1, got   # new user created
    assert got[2] == 0, got   # uid 1 (next-LRU) was the victim
    np.testing.assert_array_equal(got[3:], [1, 1])


def test_eviction_refuses_when_batch_exceeds_capacity():
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params, max_users=2)
    ids = np.array([1, 1, 1], np.int32)
    with pytest.raises(ValueError):
        store.update(np.array([10, 11, 12]), ids, ids)


def test_save_load_bundle_roundtrip(tmp_path):
    """save_bundle/load_bundle: a serving host restores params + config +
    memory from one artifact and produces identical predictions."""
    cfg, params = _setup()
    store = UserMemoryStore(cfg, params)
    rng = np.random.default_rng(11)
    uids = np.arange(9)
    hist = rng.integers(1, N_ITEMS, size=(9, 13)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))
    store.save_bundle(str(tmp_path))

    back = UserMemoryStore.load_bundle(str(tmp_path))
    assert back.period == store.period and back.L == store.L
    cand = rng.integers(1, N_ITEMS, size=9).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    np.testing.assert_allclose(back.predict(uids, cand, ccat),
                               store.predict(uids, cand, ccat), rtol=1e-6)
    # params round-tripped exactly (incl. GRUParams reassembly)
    chex.assert_trees_all_close(back.params, store.params)


def test_train_to_serve_pipeline(tmp_path):
    """The full production story on one machine: train a config, hand the
    trained params to the serving store, ingest histories, bundle, restore
    on a 'serving host', and score candidates."""
    from hpmn_tpu.train.train import train

    cfg = get_config("amazon_hpmn")
    cfg.n_examples = 2000
    cfg.train.batch_size = 64
    cfg.train.steps_per_dispatch = 1  # 30-step mini run (config ships k=64)
    cfg.eval_steps_per_dispatch = 1  # pin (config ships auto)
    cfg.train.max_steps = 30
    cfg.train.eval_every = 30
    cfg.train.log_every = 10 ** 9
    cfg.mesh.enable = False
    res = train(cfg, log=lambda s: None)

    store = UserMemoryStore(cfg, res["params"])
    rng = np.random.default_rng(0)
    uids = np.arange(16)
    spec_T = 100
    hist = rng.integers(1, 1000, size=(16, spec_T)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % 50).astype(np.int32))
    store.save_bundle(str(tmp_path))

    server = UserMemoryStore.load_bundle(str(tmp_path))
    cand = rng.integers(1, 1000, size=(16, 8)).astype(np.int32)
    scores = server.rank(uids, cand, (cand % 50).astype(np.int32))
    assert scores.shape == (16, 8)
    assert ((scores > 0) & (scores < 1)).all()
    # one more live event continues the firing grid
    server.update(uids, cand[:, 0], (cand[:, 0] % 50).astype(np.int32))
    _, cnt = server._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), spec_T + 1)


def test_serve_batch_cli(tmp_path):
    """tools/serve_batch.py scores a request file against a bundle and,
    with --update, persists the advanced memories."""
    import subprocess
    import sys as _sys

    cfg, params = _setup()
    store = UserMemoryStore(cfg, params)
    uids = np.arange(5)
    hist = np.random.default_rng(0).integers(
        1, N_ITEMS, size=(5, 9)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    store.save_bundle(str(bundle))

    cand = np.random.default_rng(1).integers(
        1, N_ITEMS, size=(5, 3)).astype(np.int32)
    np.savez(tmp_path / "req.npz", uids=uids.astype(np.int32),
             cand_items=cand, cand_cats=(cand % N_CATS).astype(np.int32),
             item_ids=cand[:, 0], cat_ids=(cand[:, 0] % N_CATS).astype(np.int32))
    import os as _os
    out = subprocess.run(
        [_sys.executable, "tools/serve_batch.py", "--bundle", str(bundle),
         "--requests", str(tmp_path / "req.npz"),
         "--out", str(tmp_path / "scores.npz"), "--update", "--force_cpu"],
        capture_output=True, text=True, timeout=600,
        cwd=_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-1500:]
    scores = np.load(tmp_path / "scores.npz")["scores"]
    assert scores.shape == (5, 3)
    assert ((scores > 0) & (scores < 1)).all()
    # --update persisted: reloaded store has counter 10
    back = UserMemoryStore.load_bundle(str(bundle))
    _, cnt = back._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), 10)


def test_quantized_bundle_roundtrip(tmp_path):
    """save_bundle(quantize_embeddings=True): ~4x smaller params artifact,
    scores within int8 rounding of the f32 bundle, memories intact."""
    import os

    from hpmn_tpu.models import init_model as _init

    n_items = 50_000  # realistic: tables must dominate the artifact bytes
    cfg = get_config("taobao_hpmn")
    params = _init(jax.random.key(0), cfg, n_items, N_CATS)
    store = UserMemoryStore(cfg, params)
    rng = np.random.default_rng(5)
    uids = np.arange(8)
    hist = rng.integers(1, n_items, size=(8, 12)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))

    d_f32, d_q8 = tmp_path / "f32", tmp_path / "q8"
    d_f32.mkdir(), d_q8.mkdir()
    store.save_bundle(str(d_f32))
    store.save_bundle(str(d_q8), quantize_embeddings=True)

    sz_f32 = os.path.getsize(d_f32 / "params.npz")
    sz_q8 = os.path.getsize(d_q8 / "params.npz")
    assert sz_q8 < 0.45 * sz_f32, (sz_q8, sz_f32)  # tables dominate

    cand = rng.integers(1, n_items, size=8).astype(np.int32)
    ref = UserMemoryStore.load_bundle(str(d_f32)).predict(
        uids, cand, cand % N_CATS)
    got_store = UserMemoryStore.load_bundle(str(d_q8))
    got = got_store.predict(uids, cand, cand % N_CATS)
    np.testing.assert_allclose(got, ref, atol=0.03)
    assert not np.allclose(got, ref)  # actually quantized, not a no-op
    _, cnt = got_store._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), 12)


@pytest.mark.slow
def test_export_bundle_cli(tmp_path):
    """Checkpoint -> bundle as commands: train with ckpt_dir, export via
    tools/export_bundle.py (with history bootstrap + quantization), serve
    from the bundle."""
    import os
    import subprocess
    import sys as _sys

    from hpmn_tpu.train.train import train

    cfg = get_config("amazon_hpmn")
    cfg.n_examples = 1500
    cfg.train.batch_size = 64
    cfg.train.steps_per_dispatch = 1  # 30-step mini run (config ships k=64)
    cfg.eval_steps_per_dispatch = 1  # pin (config ships auto)
    cfg.train.max_steps = 30
    cfg.train.eval_every = 15
    cfg.train.log_every = 10 ** 9
    cfg.mesh.enable = False
    cfg.train.ema_decay = 0.9  # so --ema export has a shadow to read
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    train(cfg, log=lambda s: None)

    rng = np.random.default_rng(0)
    uids = np.arange(12, dtype=np.int64)
    hist = rng.integers(1, 1000, size=(12, 40)).astype(np.int32)
    np.savez(tmp_path / "hist.npz", uids=uids, item_seqs=hist,
             cat_seqs=(hist % 50).astype(np.int32))

    out = subprocess.run(
        [_sys.executable, "tools/export_bundle.py",
         "--ckpt_dir", str(tmp_path / "ckpt"), "--config", "amazon_hpmn",
         "--out", str(tmp_path / "bundle"),
         "--histories", str(tmp_path / "hist.npz"),
         "--quantize", "--force_cpu"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "n_users=12" in out.stdout

    server = UserMemoryStore.load_bundle(str(tmp_path / "bundle"))
    scores = server.predict(uids, hist[:, 0], (hist[:, 0] % 50))
    assert scores.shape == (12,)
    assert ((scores > 0) & (scores < 1)).all()
    _, cnt = server._gather(uids)
    np.testing.assert_array_equal(np.asarray(cnt), 40)

    # --ema: export the Polyak-averaged weights from the same checkpoint.
    out = subprocess.run(
        [_sys.executable, "tools/export_bundle.py",
         "--ckpt_dir", str(tmp_path / "ckpt"), "--config", "amazon_hpmn",
         "--set", "train.ema_decay=0.9",
         "--out", str(tmp_path / "bundle_ema"), "--ema", "--force_cpu"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ema=True" in out.stdout
    ema_server = UserMemoryStore.load_bundle(str(tmp_path / "bundle_ema"))
    from hpmn_tpu.train.checkpoint import CheckpointManager
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    raw = mngr.restore(mngr.best_step() or mngr.latest_step())
    mngr.close()
    item_raw = np.asarray(raw["params"]["embedding"]["item"])
    item_ema = np.asarray(ema_server.params["embedding"]["item"])
    assert item_raw.shape == item_ema.shape
    assert np.abs(item_raw - item_ema).max() > 0  # a distinct average


@pytest.mark.parametrize("device_resident", [False, True])
def test_bf16_arena_tracks_f32(device_resident):
    """arena_dtype='bfloat16' halves storage; state rounds to bf16 at each
    write-back while compute stays f32, so memories/scores must track the
    f32 arena within bf16 resolution across a multi-event stream."""
    cfg, params = _setup()
    rng = np.random.default_rng(5)
    B, T = 6, 20
    items = rng.integers(1, N_ITEMS, size=(B, T)).astype(np.int32)
    cats = (items % N_CATS).astype(np.int32)
    uids = np.arange(B)

    f32 = UserMemoryStore(cfg, params, device_resident=device_resident)
    bf16 = UserMemoryStore(cfg, params, device_resident=device_resident,
                           arena_dtype="bfloat16")
    assert np.dtype(np.asarray(bf16._mem).dtype).itemsize == 2
    for t in range(T):
        f32.update(uids, items[:, t], cats[:, t])
        bf16.update(uids, items[:, t], cats[:, t])
    m32, c32 = f32._gather(uids)
    m16, c16 = bf16._gather(uids)
    np.testing.assert_array_equal(np.asarray(c16), np.asarray(c32))
    np.testing.assert_allclose(np.asarray(m16), np.asarray(m32), atol=3e-2)

    cand = rng.integers(1, N_ITEMS, size=B).astype(np.int32)
    np.testing.assert_allclose(
        bf16.predict(uids, cand, (cand % N_CATS).astype(np.int32)),
        f32.predict(uids, cand, (cand % N_CATS).astype(np.int32)),
        atol=1e-2)


def test_bf16_arena_persistence_roundtrip(tmp_path):
    """Snapshots persist f32 regardless of arena dtype; a bf16 store
    restores them (rounding once) and keeps serving."""
    cfg, params = _setup()
    rng = np.random.default_rng(6)
    uids = np.arange(5)
    hist = rng.integers(1, N_ITEMS, size=(5, 9)).astype(np.int32)
    store = UserMemoryStore(cfg, params, arena_dtype="bfloat16")
    store.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))
    store.save(str(tmp_path))

    back = UserMemoryStore.load(str(tmp_path), cfg, params,
                                arena_dtype="bfloat16")
    m0, _ = store._gather(uids)
    m1, _ = back._gather(uids)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-6)

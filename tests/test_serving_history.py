"""HistoryStore: lifelong serving for families without an O(1) memory
recurrence (BST & co) — window semantics vs training, sliding drop-oldest,
ingest == sequential updates, rank == per-column predict, bundle round-trip
with store dispatch, and the UserMemoryStore family guard (VERDICT r3
missing #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import Batch
from hpmn_tpu.models import apply_model, init_model
from hpmn_tpu.serving import HistoryStore, UserMemoryStore
from hpmn_tpu.serving.history import load_bundle

N_ITEMS, N_CATS = 200, 40
W = 12


def _cfg(name="bst"):
    cfg = get_config("amazon_hpmn")
    cfg.model.name = name
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    return cfg, params


def _ref_scores(cfg, params, items, cats, mask, cand_i, cand_c, uids=None):
    B, T = items.shape
    z = np.zeros((B, T), np.int32)
    batch = Batch(uid=jnp.asarray(uids if uids is not None
                                  else np.zeros(B), jnp.int32),
                  item_seq=jnp.asarray(items, jnp.int32),
                  cat_seq=jnp.asarray(cats, jnp.int32),
                  seq_mask=jnp.asarray(mask, jnp.float32),
                  target_item=jnp.asarray(cand_i, jnp.int32),
                  target_cat=jnp.asarray(cand_c, jnp.int32),
                  label=jnp.zeros((B,), jnp.float32),
                  neg_item_seq=jnp.asarray(z), neg_cat_seq=jnp.asarray(z))
    logits, _ = apply_model(params, cfg, batch)
    return np.asarray(jax.nn.sigmoid(logits))


def test_predict_matches_training_encode(setup):
    """Feeding n <= W events one at a time == apply_model on the
    left-padded [W] training window, exactly."""
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    rng = np.random.default_rng(0)
    uids = np.arange(4)
    n_events = [W, 5, 1, W - 1]
    items = np.zeros((4, W), np.int32)
    cats = np.zeros((4, W), np.int32)
    mask = np.zeros((4, W), np.float32)
    for i, n in enumerate(n_events):
        ev_i = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
        ev_c = rng.integers(1, N_CATS, size=n).astype(np.int32)
        items[i, W - n:] = ev_i
        cats[i, W - n:] = ev_c
        mask[i, W - n:] = 1.0
        for t in range(n):
            store.update([uids[i]], [ev_i[t]], [ev_c[t]])
    cand_i = rng.integers(1, N_ITEMS, size=4).astype(np.int32)
    cand_c = rng.integers(1, N_CATS, size=4).astype(np.int32)
    got = store.predict(uids, cand_i, cand_c)
    want = _ref_scores(cfg, params, items, cats, mask, cand_i, cand_c,
                       uids=uids)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_window_slides_dropping_oldest(setup):
    """W + k events: the window holds exactly the LAST W, full mask."""
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    rng = np.random.default_rng(1)
    n = W + 7
    ev_i = rng.integers(1, N_ITEMS, size=n).astype(np.int32)
    ev_c = rng.integers(1, N_CATS, size=n).astype(np.int32)
    for t in range(n):
        store.update([42], [ev_i[t]], [ev_c[t]])
    got = store.predict([42], [3], [4])
    want = _ref_scores(cfg, params, ev_i[None, -W:], ev_c[None, -W:],
                       np.ones((1, W), np.float32), [3], [4], uids=[42])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ingest_equals_sequential_updates(setup):
    """ingest_histories (one batched write) == replaying update per event,
    including histories longer than the window and masked pads."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    T = W + 4
    items = rng.integers(1, N_ITEMS, size=(3, T)).astype(np.int32)
    cats = rng.integers(1, N_CATS, size=(3, T)).astype(np.int32)
    masks = np.ones((3, T), np.float32)
    masks[1, : T - 3] = 0.0  # only 3 valid events
    s1 = HistoryStore(cfg, params, window=W)
    s1.ingest_histories([1, 2, 3], items, cats, masks=masks)
    s2 = HistoryStore(cfg, params, window=W)
    for i, u in enumerate([1, 2, 3]):
        for t in range(T):
            if masks[i, t]:
                s2.update([u], [items[i, t]], [cats[i, t]])
    np.testing.assert_array_equal(
        s1._items[s1._rows_for(np.array([1, 2, 3]), False)],
        s2._items[s2._rows_for(np.array([1, 2, 3]), False)])
    c = rng.integers(1, N_ITEMS, size=3).astype(np.int32)
    np.testing.assert_allclose(s1.predict([1, 2, 3], c, c % N_CATS),
                               s2.predict([1, 2, 3], c, c % N_CATS),
                               atol=1e-6)


def test_rank_matches_predict_columns(setup):
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    rng = np.random.default_rng(3)
    for t in range(5):
        store.update([7, 8], rng.integers(1, N_ITEMS, 2),
                     rng.integers(1, N_CATS, 2))
    ci = rng.integers(1, N_ITEMS, size=(2, 4)).astype(np.int32)
    cc = rng.integers(1, N_CATS, size=(2, 4)).astype(np.int32)
    ranked = store.rank([7, 8], ci, cc)
    assert ranked.shape == (2, 4)
    for c in range(4):
        np.testing.assert_allclose(
            ranked[:, c], store.predict([7, 8], ci[:, c], cc[:, c]),
            atol=1e-6)


def test_rank_chunks_server_side(setup):
    """A rank request whose flattened B*C rows exceed max_score_rows is
    split into fixed-size scoring dispatches INSIDE the store (VERDICT r4
    weak #5: the store, not the client, owns the peak-memory bound) —
    scores identical to the unchunked store, including the ragged tail
    chunk and a chunked large-B predict."""
    cfg, params = setup
    rng = np.random.default_rng(9)
    big = HistoryStore(cfg, params, window=W)          # one dispatch
    small = HistoryStore(cfg, params, window=W, max_score_rows=16)
    uids = np.arange(6)
    for t in range(4):
        ev_i = rng.integers(1, N_ITEMS, 6)
        ev_c = rng.integers(1, N_CATS, 6)
        big.update(uids, ev_i, ev_c)
        small.update(uids, ev_i, ev_c)
    # 6 users x 7 candidates = 42 rows -> chunks of 16, ragged tail of 10.
    ci = rng.integers(1, N_ITEMS, size=(6, 7)).astype(np.int32)
    cc = rng.integers(1, N_CATS, size=(6, 7)).astype(np.int32)
    np.testing.assert_allclose(small.rank(uids, ci, cc),
                               big.rank(uids, ci, cc), atol=1e-6)
    # predict above the bound chunks too
    pu = np.repeat(uids, 4)
    pi = rng.integers(1, N_ITEMS, len(pu)).astype(np.int32)
    pc = rng.integers(1, N_CATS, len(pu)).astype(np.int32)
    np.testing.assert_allclose(small.predict(pu, pi, pc),
                               big.predict(pu, pi, pc), atol=1e-6)
    # the knob round-trips through bundles
    assert HistoryStore(cfg, params, window=W,
                        max_score_rows=0).max_score_rows == 0


def test_unknown_uid_cold_start(setup):
    """Unknown users score with the empty window (all-masked history; the
    appended target keeps BST attention well-defined) — finite, and no
    state is created by predict."""
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    out = store.predict([999], [5], [6])
    assert np.isfinite(out).all() and 0.0 <= out[0] <= 1.0
    assert store.n_users == 0


def test_bundle_round_trip(setup, tmp_path):
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    rng = np.random.default_rng(4)
    for t in range(W + 2):  # cross the slide boundary before saving
        store.update([11, 12], rng.integers(1, N_ITEMS, 2),
                     rng.integers(1, N_CATS, 2))
    d = str(tmp_path / "bundle")
    import os

    os.makedirs(d)
    store.save_bundle(d)
    cand = np.asarray([9, 10], np.int32)
    want = store.predict([11, 12], cand, cand % N_CATS)

    loaded = load_bundle(d)  # dispatches on store kind
    assert isinstance(loaded, HistoryStore)
    assert loaded.window == W and loaded.n_users == 2
    np.testing.assert_allclose(loaded.predict([11, 12], cand,
                                              cand % N_CATS), want,
                               atol=1e-6)


def test_quantized_bundle_close(setup, tmp_path):
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    store.update([5], [17], [3])
    d = str(tmp_path / "qbundle")
    import os

    os.makedirs(d)
    store.save_bundle(d, quantize_embeddings=True)
    loaded = load_bundle(d)
    np.testing.assert_allclose(loaded.predict([5], [17], [3]),
                               store.predict([5], [17], [3]), atol=5e-3)


def test_max_users_eviction(setup):
    cfg, params = setup
    store = HistoryStore(cfg, params, window=W, max_users=8)
    for u in range(20):
        store.update([u], [1 + u % (N_ITEMS - 1)], [1])
    assert store.n_users <= 8
    # Most recent user survived; predict still works.
    assert 19 in store._row
    assert np.isfinite(store.predict([19], [2], [2])).all()


def test_memory_store_guards_family(setup):
    """UserMemoryStore refuses non-HPMN families with a clear error that
    names the alternative (the r3 failure mode was a late KeyError)."""
    cfg, params = setup
    with pytest.raises(ValueError, match="HistoryStore"):
        UserMemoryStore(cfg, params)


def test_daemon_serves_history_bundle(setup, tmp_path):
    """The TCP daemon duck-types over the store: a BST history bundle
    serves update -> predict -> rank through the micro-batching
    dispatcher."""
    from hpmn_tpu.serving import ServingClient, ServingServer

    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    store.update([1], [10], [2])
    with ServingServer(store, port=0) as srv:
        cli = ServingClient("127.0.0.1", srv.port)
        cli.update([1, 2], [11, 12], [3, 4])
        out = cli.predict([1, 2, 999], [5, 6, 7], [1, 2, 3])
        assert len(out) == 3 and np.isfinite(out).all()
        ranked = cli.rank([1], [[5, 6]], [[1, 2]])
        np.testing.assert_allclose(
            np.asarray(ranked)[0, 0],
            np.asarray(cli.predict([1], [5], [1]))[0], atol=1e-5)
        cli.close()


@pytest.mark.parametrize("chunked", [False, True])
def test_aot_history_bundle(setup, tmp_path, chunked):
    """save_bundle(export_compiled=True) on a history store -> the scoring
    graph as StableHLO; aot.load_aot_store dispatches to AotHistoryStore
    (zero model code) and scores identically to the jit store — dense and
    key-chunked attention. Updates/ingest stay host-side and work."""
    import os

    from hpmn_tpu.serving import load_aot_store
    from hpmn_tpu.serving.history import AotHistoryStore

    cfg, params = setup
    if chunked:
        cfg = _cfg()
        cfg.model.bst_blocks = 2
        cfg.model.bst_attn_chunk = 4
        params = init_model(jax.random.key(2), cfg, N_ITEMS, N_CATS)
    store = HistoryStore(cfg, params, window=W)
    rng = np.random.default_rng(7)
    for t in range(W + 3):
        store.update([1, 2], rng.integers(1, N_ITEMS, 2),
                     rng.integers(1, N_CATS, 2))
    d = str(tmp_path / "aot_bundle")
    os.makedirs(d)
    store.save_bundle(d, export_compiled=True, export_platforms=("cpu",))

    aot = load_aot_store(d)
    assert isinstance(aot, AotHistoryStore)
    cand = np.asarray([9, 10], np.int32)
    np.testing.assert_allclose(
        aot.predict([1, 2], cand, cand % N_CATS),
        store.predict([1, 2], cand, cand % N_CATS), atol=1e-6)
    ci = rng.integers(1, N_ITEMS, size=(2, 3)).astype(np.int32)
    np.testing.assert_allclose(
        aot.rank([1, 2], ci, ci % N_CATS),
        store.rank([1, 2], ci, ci % N_CATS), atol=1e-6)
    # host-side updates flow through the exported scorer
    aot.update([1], [5], [2])
    store.update([1], [5], [2])
    np.testing.assert_allclose(aot.predict([1], [3], [1]),
                               store.predict([1], [3], [1]), atol=1e-6)
    with pytest.raises(ValueError, match="re-export"):
        aot.save_bundle(d)


def test_mixed_family_ab_daemon(setup):
    """One daemon serving BOTH store kinds (A/B across model families):
    the default model is an HPMN memory store, the canary a BST history
    store — requests route by the client's model= field, each family's
    semantics intact."""
    from hpmn_tpu.serving import ServingClient, ServingServer

    cfg_b, params_b = setup
    hist = HistoryStore(cfg_b, params_b, window=W)
    cfg_h = _cfg("hpmn")
    params_h = init_model(jax.random.key(3), cfg_h, N_ITEMS, N_CATS)
    mem = UserMemoryStore(cfg_h, params_h)
    with ServingServer({"default": mem, "bst": hist}, port=0) as srv:
        cli = ServingClient("127.0.0.1", srv.port)
        cli.update([1, 2], [10, 11], [2, 3])               # -> memory store
        cli.update([1, 2], [10, 11], [2, 3], model="bst")  # -> history
        s_mem = cli.predict([1, 2], [5, 6], [1, 2])
        s_bst = cli.predict([1, 2], [5, 6], [1, 2], model="bst")
        assert np.isfinite(s_mem).all() and np.isfinite(s_bst).all()
        assert not np.allclose(np.asarray(s_mem), np.asarray(s_bst))
        # each daemon-side store saw exactly its own updates
        assert mem.n_users == 2 and hist.n_users == 2
        np.testing.assert_allclose(
            np.asarray(cli.predict([1], [5], [1], model="bst"))[0],
            hist.predict([1], [5], [1])[0], atol=1e-5)
        cli.close()


@pytest.mark.slow
def test_daemon_aot_history_bundle(setup, tmp_path):
    """hpmn-serve --aot on a history bundle: the daemon's loader
    dispatches to AotHistoryStore and serves predict/update with zero
    model-code tracing, as a real OS process."""
    import os
    import signal
    import subprocess
    import sys

    from hpmn_tpu.serving.client import ServingClient

    cfg, params = setup
    store = HistoryStore(cfg, params, window=W)
    store.update([1, 2], [10, 11], [2, 3])
    d = str(tmp_path / "aotb")
    os.makedirs(d)
    store.save_bundle(d, export_compiled=True, export_platforms=("cpu",))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--bundle", d, "--port", "0",
         "--aot", "--force_cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=repo, env=env)
    try:
        line = proc.stdout.readline()
        assert "serving bundle" in line, (line, proc.stderr.read())
        host, port = line.split(" on ")[1].split()[0].rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            s1 = cl.predict([1, 2], [5, 6], [1, 2])
            np.testing.assert_allclose(np.asarray(s1),
                                       store.predict([1, 2], [5, 6], [1, 2]),
                                       atol=1e-6)
            cl.update([1], [7], [2])
            store.update([1], [7], [2])
            np.testing.assert_allclose(
                np.asarray(cl.predict([1], [5], [1])),
                store.predict([1], [5], [1]), atol=1e-6)
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

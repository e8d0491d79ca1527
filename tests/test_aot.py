"""AOT serving (serving/aot.py): jax.export'ed StableHLO request graphs
must match the jit-traced store exactly, stay shape-polymorphic over batch
and candidate count, compose with int8 table quantization and the user
embedding, and serve through the daemon with zero model code."""

import numpy as np
import pytest

import jax

from hpmn_tpu.configs import get_config
from hpmn_tpu.models import init_model
from hpmn_tpu.serving import UserMemoryStore
from hpmn_tpu.serving.aot import AotStore, export_serving, load_aot_store

N_ITEMS, N_CATS, N_USERS = 200, 20, 64


def _bundle(tmp_path, use_user=False, quantize=False, n_hist=9, T=13):
    cfg = get_config("taobao_hpmn")  # 3-layer HPMN, period 3
    if use_user:
        cfg.model.use_user_emb = True
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                        n_users=N_USERS if use_user else 0)
    store = UserMemoryStore(cfg, params)
    rng = np.random.default_rng(11)
    uids = np.arange(n_hist)
    hist = rng.integers(1, N_ITEMS, size=(n_hist, T)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % N_CATS).astype(np.int32))
    store.save_bundle(str(tmp_path), quantize_embeddings=quantize,
                      export_compiled=True, export_platforms=("cpu",))
    return cfg, store, uids, rng


@pytest.mark.parametrize("use_user", [False, True])
def test_aot_matches_jit_store(tmp_path, use_user):
    _, store, uids, rng = _bundle(tmp_path, use_user=use_user)
    aot = load_aot_store(str(tmp_path))
    assert isinstance(aot, AotStore)

    cand = rng.integers(1, N_ITEMS, size=len(uids)).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    np.testing.assert_allclose(aot.predict(uids, cand, ccat),
                               store.predict(uids, cand, ccat), atol=1e-6)

    ranks = rng.integers(1, N_ITEMS, size=(len(uids), 5)).astype(np.int32)
    np.testing.assert_allclose(aot.rank(uids, ranks,
                                        (ranks % N_CATS).astype(np.int32)),
                               store.rank(uids, ranks,
                                          (ranks % N_CATS).astype(np.int32)),
                               atol=1e-6)

    # updates advance the firing grid identically (incl. new users = cold
    # start) and subsequent predictions agree
    new_uids = np.concatenate([uids[:4], [1000, 1001]])
    ev = rng.integers(1, N_ITEMS, size=len(new_uids)).astype(np.int32)
    aot.update(new_uids, ev, (ev % N_CATS).astype(np.int32))
    store.update(new_uids, ev, (ev % N_CATS).astype(np.int32))
    m_a, c_a = aot._gather(new_uids)
    m_s, c_s = store._gather(new_uids)
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_s))
    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_s), atol=1e-6)


def test_aot_shape_polymorphism(tmp_path):
    """One exported artifact serves any batch size / candidate count —
    no retrace, no per-shape blobs."""
    _, store, uids, rng = _bundle(tmp_path, n_hist=16)
    aot = load_aot_store(str(tmp_path))
    for b, c in [(1, 1), (3, 7), (16, 4)]:
        sub = uids[:b]
        cand = rng.integers(1, N_ITEMS, size=(b, c)).astype(np.int32)
        got = aot.rank(sub, cand, (cand % N_CATS).astype(np.int32))
        want = store.rank(sub, cand, (cand % N_CATS).astype(np.int32))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_aot_with_quantized_tables(tmp_path):
    """int8 table quantization composes: the exported graph consumes the
    dequantized leaves, so AOT == jit on the SAME quantized bundle."""
    _, _, uids, rng = _bundle(tmp_path, quantize=True)
    jit_store = UserMemoryStore.load_bundle(str(tmp_path))
    aot = load_aot_store(str(tmp_path))
    cand = rng.integers(1, N_ITEMS, size=len(uids)).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    np.testing.assert_allclose(aot.predict(uids, cand, ccat),
                               jit_store.predict(uids, cand, ccat),
                               atol=1e-6)


def test_aot_store_guards(tmp_path):
    _, _, uids, _ = _bundle(tmp_path)
    aot = load_aot_store(str(tmp_path))
    with pytest.raises(ValueError):
        aot.ingest_histories(uids, np.ones((9, 4), np.int32),
                             np.ones((9, 4), np.int32))
    with pytest.raises(ValueError):
        aot.save_bundle(str(tmp_path))
    # plain bundles refuse the AOT loader with a pointed message
    plain = tmp_path / "plain"
    plain.mkdir()
    cfg = get_config("taobao_hpmn")
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    UserMemoryStore(cfg, params).save_bundle(str(plain))
    with pytest.raises(ValueError, match="no exported"):
        load_aot_store(str(plain))


def test_aot_through_daemon(tmp_path):
    """The TCP daemon serves an AotStore exactly like a jit store."""
    from hpmn_tpu.serving import ServingClient, ServingServer

    _, store, uids, rng = _bundle(tmp_path)
    aot = load_aot_store(str(tmp_path))
    cand = rng.integers(1, N_ITEMS, size=len(uids)).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    with ServingServer(aot, port=0) as srv:
        client = ServingClient(srv.host, srv.port)
        got = client.predict(uids.tolist(), cand.tolist(), ccat.tolist())
        client.close()
    np.testing.assert_allclose(got, store.predict(uids, cand, ccat),
                               atol=1e-6)


def test_export_serving_bytes_roundtrip():
    """export_serving returns serialized blobs deserializable standalone."""
    from jax import export as jax_export

    cfg = get_config("taobao_hpmn")
    params = init_model(jax.random.key(1), cfg, N_ITEMS, N_CATS)
    blobs = export_serving(cfg, params, platforms=("cpu",))
    assert set(blobs) == {"update", "predict", "rank"}
    exp = jax_export.deserialize(blobs["predict"])
    assert "cpu" in [p.lower() for p in exp.platforms]


def test_aot_bf16_arena(tmp_path):
    """--aot composes with the bf16 arena: exported graphs consume the
    f32-upcast gather, state rounds at write-back."""
    _, store, uids, rng = _bundle(tmp_path)
    aot = load_aot_store(str(tmp_path), arena_dtype="bfloat16")
    assert np.dtype(np.asarray(aot._mem).dtype).itemsize == 2
    cand = rng.integers(1, N_ITEMS, size=len(uids)).astype(np.int32)
    ccat = (cand % N_CATS).astype(np.int32)
    np.testing.assert_allclose(aot.predict(uids, cand, ccat),
                               store.predict(uids, cand, ccat), atol=1e-2)
    aot.update(uids, cand, ccat)  # write-back rounds, must not error

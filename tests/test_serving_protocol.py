"""The O(1) encoder-state serving protocol (serving/protocol.py): the
fence sits at the structural boundary — any family with a target-
independent recurrence (hpmn, gru4rec, rum) serves from UserMemoryStore
with per-event state updates; feeding events one at a time must equal the
training path's full-history encode exactly (VERDICT r4 next #4,
[P §4.5], SURVEY.md §3.5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import Batch
from hpmn_tpu.models import apply_model, init_model
from hpmn_tpu.serving import O1_FAMILIES, UserMemoryStore
from hpmn_tpu.serving.protocol import n_state_slots

N_ITEMS, N_CATS, T = 150, 30, 12
FAMILIES = list(O1_FAMILIES)


def _cfg(family):
    cfg = get_config("amazon_hpmn")
    cfg.model.name = family
    cfg.model.hpmn_layers = 3
    cfg.model.hpmn_period = 2
    cfg.model.rum_slots = 5
    return cfg


def _events(B, seed=0):
    rng = np.random.default_rng(seed)
    items = rng.integers(1, N_ITEMS, size=(B, T)).astype(np.int32)
    cats = (items % N_CATS).astype(np.int32)
    ci = rng.integers(1, N_ITEMS, size=B).astype(np.int32)
    cc = (ci % N_CATS).astype(np.int32)
    return items, cats, ci, cc


def _training_scores(cfg, params, items, cats, ci, cc):
    B, t = items.shape
    z = np.zeros((B, t), np.int32)
    batch = Batch(uid=jnp.zeros((B,), jnp.int32),
                  item_seq=jnp.asarray(items), cat_seq=jnp.asarray(cats),
                  seq_mask=jnp.ones((B, t), jnp.float32),
                  target_item=jnp.asarray(ci), target_cat=jnp.asarray(cc),
                  label=jnp.zeros((B,), jnp.float32),
                  neg_item_seq=jnp.asarray(z), neg_cat_seq=jnp.asarray(z))
    logits, _ = apply_model(params, cfg, batch)
    return np.asarray(jax.nn.sigmoid(logits))


@pytest.mark.parametrize("family", FAMILIES)
def test_feed_one_by_one_matches_training(family):
    """T events through store.update == the training encoder on the full
    length-T history — the protocol's defining equivalence, per family."""
    cfg = _cfg(family)
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    store = UserMemoryStore(cfg, params)
    items, cats, ci, cc = _events(B := 4)
    uids = np.arange(B)
    for t in range(T):
        store.update(uids, items[:, t], cats[:, t])
    got = store.predict(uids, ci, cc)
    want = _training_scores(cfg, params, items, cats, ci, cc)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert store._mem.shape[1] == n_state_slots(cfg)


@pytest.mark.parametrize("family", FAMILIES)
def test_ingest_equals_sequential_updates(family):
    """Batched cold-start encode == event-by-event replay, per family."""
    cfg = _cfg(family)
    params = init_model(jax.random.key(1), cfg, N_ITEMS, N_CATS)
    items, cats, ci, cc = _events(B := 3, seed=1)
    uids = np.arange(B)
    seq_store = UserMemoryStore(cfg, params)
    for t in range(T):
        seq_store.update(uids, items[:, t], cats[:, t])
    ing_store = UserMemoryStore(cfg, params)
    ing_store.ingest_histories(uids, items, cats)
    np.testing.assert_allclose(
        np.asarray(ing_store._mem[:B], np.float32),
        np.asarray(seq_store._mem[:B], np.float32), atol=1e-5)
    np.testing.assert_allclose(ing_store.predict(uids, ci, cc),
                               seq_store.predict(uids, ci, cc), atol=1e-6)


@pytest.mark.parametrize("family", FAMILIES)
def test_rank_matches_predict_columns(family):
    cfg = _cfg(family)
    params = init_model(jax.random.key(2), cfg, N_ITEMS, N_CATS)
    store = UserMemoryStore(cfg, params)
    items, cats, _, _ = _events(B := 3, seed=2)
    uids = np.arange(B)
    for t in range(T):
        store.update(uids, items[:, t], cats[:, t])
    rng = np.random.default_rng(7)
    ci = rng.integers(1, N_ITEMS, size=(B, 5)).astype(np.int32)
    cc = (ci % N_CATS).astype(np.int32)
    ranked = store.rank(uids, ci, cc)
    for c in range(5):
        np.testing.assert_allclose(
            ranked[:, c], store.predict(uids, ci[:, c], cc[:, c]),
            atol=1e-6)


@pytest.mark.parametrize("family", ["gru4rec", "rum"])
def test_device_resident_parity(family):
    """The fused-dispatch HBM arena serves the new families too."""
    cfg = _cfg(family)
    params = init_model(jax.random.key(3), cfg, N_ITEMS, N_CATS)
    host = UserMemoryStore(cfg, params)
    dev = UserMemoryStore(cfg, params, device_resident=True)
    items, cats, ci, cc = _events(B := 3, seed=3)
    uids = np.arange(B)
    for t in range(T):
        host.update(uids, items[:, t], cats[:, t])
        dev.update(uids, items[:, t], cats[:, t])
    np.testing.assert_allclose(dev.predict(uids, ci, cc),
                               host.predict(uids, ci, cc), atol=1e-6)
    cm = np.stack([ci, (ci + 1) % N_ITEMS], axis=1)
    np.testing.assert_allclose(dev.rank(uids, cm, cm % N_CATS),
                               host.rank(uids, cm, cm % N_CATS), atol=1e-6)


@pytest.mark.parametrize("family", ["bst", "dien"])
def test_target_dependent_families_still_refused(family):
    cfg = _cfg(family)
    params = init_model(jax.random.key(4), _cfg("gru4rec"), N_ITEMS, N_CATS)
    with pytest.raises(ValueError, match="HistoryStore"):
        UserMemoryStore(cfg, params)


def test_bundle_round_trip_gru4rec(tmp_path):
    """save_bundle/load_bundle dispatch works for the newly-qualified
    families (store kind 'memory' + family from the bundled config)."""
    from hpmn_tpu.serving import load_bundle

    cfg = _cfg("gru4rec")
    params = init_model(jax.random.key(5), cfg, N_ITEMS, N_CATS)
    store = UserMemoryStore(cfg, params)
    items, cats, ci, cc = _events(B := 3, seed=5)
    uids = np.arange(B)
    for t in range(T):
        store.update(uids, items[:, t], cats[:, t])
    d = str(tmp_path / "bundle")
    os.makedirs(d)
    store.save_bundle(d)
    loaded = load_bundle(d)
    assert isinstance(loaded, UserMemoryStore)
    assert loaded.family == "gru4rec"
    np.testing.assert_allclose(loaded.predict(uids, ci, cc),
                               store.predict(uids, ci, cc), atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["gru4rec", "rum"])
def test_aot_export_serves_new_families(family, tmp_path):
    """export_compiled bundles (StableHLO update/predict/rank) work for
    the newly-qualified families — the AOT host needs no model code."""
    from hpmn_tpu.serving import load_aot_store

    cfg = _cfg(family)
    params = init_model(jax.random.key(6), cfg, N_ITEMS, N_CATS)
    store = UserMemoryStore(cfg, params)
    items, cats, ci, cc = _events(B := 3, seed=6)
    uids = np.arange(B)
    for t in range(T // 2):
        store.update(uids, items[:, t], cats[:, t])
    d = str(tmp_path / "aot")
    os.makedirs(d)
    store.save_bundle(d, export_compiled=True, export_platforms=("cpu",))
    aot = load_aot_store(d)
    for t in range(T // 2, T):
        store.update(uids, items[:, t], cats[:, t])
        aot.update(uids, items[:, t], cats[:, t])
    np.testing.assert_allclose(aot.predict(uids, ci, cc),
                               store.predict(uids, ci, cc), atol=1e-6)
    cm = np.stack([ci, (ci + 2) % N_ITEMS], axis=1)
    np.testing.assert_allclose(aot.rank(uids, cm, cm % N_CATS),
                               store.rank(uids, cm, cm % N_CATS), atol=1e-6)

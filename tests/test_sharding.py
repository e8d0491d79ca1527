"""Distributed tests without a cluster (SURVEY.md §4 item 4): 8 fake CPU
devices; assert row-sharded lookup == unsharded lookup and psum-DP grads ==
single-device grads."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
from hpmn_tpu.models import init_model, loss_fn
from hpmn_tpu.models.embedding import dense_lookup, init_embedding
from hpmn_tpu.parallel import (init_sharded_model, make_mesh,
                               make_sharded_lookup, make_sharded_steps,
                               pad_vocab, param_shardings, shard_batch)

N_ITEMS, N_CATS = pad_vocab(96, 4), pad_vocab(24, 4)


@pytest.fixture(scope="module")
def mesh22():
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake devices"
    return make_mesh(model_parallel=4, devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def emb():
    return init_embedding(jax.random.key(0), N_ITEMS, N_CATS, emb_dim=8)


@pytest.mark.parametrize("mode", ["psum", "a2a"])
def test_sharded_lookup_equals_dense(mesh22, emb, mode):
    rng = np.random.default_rng(0)
    item = rng.integers(0, N_ITEMS, size=(8, 13)).astype(np.int32)
    cat = rng.integers(0, N_CATS, size=(8, 13)).astype(np.int32)
    emb_sharded = jax.device_put(emb, param_shardings(
        mesh22, {"embedding": emb})["embedding"])
    lookup = make_sharded_lookup(mesh22, mode)
    got = jax.jit(lookup)(emb_sharded, item, cat)
    want = dense_lookup(emb, item, cat)
    chex.assert_trees_all_close(got, want, atol=1e-6)


@pytest.mark.parametrize("mode", ["psum", "a2a"])
def test_sharded_lookup_grads_equal_dense(mesh22, emb, mode):
    rng = np.random.default_rng(1)
    item = rng.integers(0, N_ITEMS, size=(8, 5)).astype(np.int32)
    cat = rng.integers(0, N_CATS, size=(8, 5)).astype(np.int32)
    lookup = make_sharded_lookup(mesh22, mode)
    emb_sharded = jax.device_put(emb, param_shardings(
        mesh22, {"embedding": emb})["embedding"])

    def loss_sharded(e):
        return jnp.sum(jnp.sin(lookup(e, item, cat)))

    def loss_dense(e):
        return jnp.sum(jnp.sin(dense_lookup(e, item, cat)))

    gs = jax.jit(jax.grad(loss_sharded))(emb_sharded)
    gd = jax.grad(loss_dense)(emb)
    chex.assert_trees_all_close(jax.device_get(gs), jax.device_get(gd),
                                atol=1e-5)


@pytest.mark.heavy
@pytest.mark.parametrize("mode", ["psum", "a2a"])
def test_sharded_train_step_matches_single_device(mode):
    """Full HPMN train step on a (2 data x 4 model) mesh == single device."""
    mesh = make_mesh(model_parallel=4, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    cfg.train.batch_size = 8
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.mesh.embedding_mode = mode
    batch = to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=5))
    tx = optax.adam(1e-3)

    # Single-device reference (same padded vocab => identical init).
    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    opt0 = tx.init(params0)
    (_, m0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        params0, cfg, batch)
    u0, _ = tx.update(g0, opt0, params0)
    p_ref = optax.apply_updates(params0, u0)

    # Sharded step.
    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS, mesh)
    opt_state = jax.device_put(tx.init(params),
                               param_shardings(mesh, tx.init(params)))
    jit_train, jit_eval = make_sharded_steps(cfg, tx, mesh)
    train_step = jit_train(params, opt_state)
    sbatch = shard_batch(mesh, batch)
    params2, opt2, metrics = train_step(params, opt_state, sbatch)
    chex.assert_trees_all_close(jax.device_get(params2),
                                jax.device_get(p_ref), atol=2e-5)
    assert np.isfinite(float(metrics["loss"]))
    # Eval path agrees too.
    logits_sharded = jit_eval(params2)(params2, sbatch)
    logits_ref, _ = __import__("hpmn_tpu.models", fromlist=["apply_model"]) \
        .apply_model(p_ref, cfg, batch)
    chex.assert_trees_all_close(np.asarray(logits_sharded),
                                np.asarray(logits_ref), atol=1e-4)


@pytest.mark.heavy
@pytest.mark.parametrize("model_name,mode",
                         [("bst", "psum"), ("bst", "a2a"), ("dien", "psum")])
def test_sharded_train_step_other_families(model_name, mode):
    """The non-HPMN families ride the same model-agnostic sharding rules
    (embedding rows over MODEL_AXIS, everything else replicated — BST's
    pos/block params included): full train step on a (2 data x 4 model)
    mesh == single device, for BST (both lookup collectives) and DIEN."""
    mesh = make_mesh(model_parallel=4, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.model.name = model_name
    cfg.train.batch_size = 8
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.mesh.embedding_mode = mode
    batch = to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=7))
    tx = optax.adam(1e-3)

    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        params0, cfg, batch)
    u0, _ = tx.update(g0, tx.init(params0), params0)
    p_ref = optax.apply_updates(params0, u0)

    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS, mesh)
    opt_state = jax.device_put(tx.init(params),
                               param_shardings(mesh, tx.init(params)))
    jit_train, _ = make_sharded_steps(cfg, tx, mesh)
    step = jit_train(params, opt_state)
    params2, _, metrics = step(params, opt_state, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    chex.assert_trees_all_close(jax.device_get(params2),
                                jax.device_get(p_ref), atol=2e-5)


@pytest.mark.heavy
def test_data_parallel_only_mesh():
    """model_parallel=1: pure DP with replicated tables."""
    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.mesh.embedding_mode = "replicated"
    batch = to_device_arrays(dummy_batch(16, 12, N_ITEMS, N_CATS, seed=6))
    tx = optax.adam(1e-3)
    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS, mesh)
    opt_state = jax.device_put(tx.init(params),
                               param_shardings(mesh, tx.init(params)))
    jit_train, _ = make_sharded_steps(cfg, tx, mesh)
    step = jit_train(params, opt_state)
    params2, _, metrics = step(params, opt_state, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))

    # Matches the plain single-device step.
    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    opt0 = tx.init(params0)
    (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params0, cfg, batch)
    u0, _ = tx.update(g0, opt0, params0)
    p_ref = optax.apply_updates(params0, u0)
    chex.assert_trees_all_close(jax.device_get(params2),
                                jax.device_get(p_ref), atol=2e-5)

"""The sort-by-owner bucketed a2a embedding exchange (SURVEY.md §7 hard
part 2): local-queries contract, static per-owner capacity with the psum'd
overflow fallback, duplicate ids, explicit VJP, and the batch_over_model
shard_map step == single-device step (values AND the l2/table-grad-scale
gradient accounting)."""

import functools

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
from hpmn_tpu.models import apply_model, init_model, loss_fn
from hpmn_tpu.parallel import (init_sharded_model, make_mesh,
                               make_shardmap_steps, pad_vocab,
                               param_shardings, shard_batch)
from hpmn_tpu.parallel.embedding_sharding import (_bucket_slots, _capacity,
                                                  bucketed_gather)
from hpmn_tpu.parallel.mesh import MODEL_AXIS

S = 4
N_ITEMS, N_CATS = pad_vocab(96, S), pad_vocab(24, S)


@pytest.fixture(scope="module")
def mesh24():
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake devices"
    return make_mesh(model_parallel=S, devices=jax.devices()[:8])


def _run_gather(mesh, table, ids_global, cap, scale=1.0):
    """bucketed_gather under a (data, model) shard_map with the example
    axis sharded over BOTH mesh axes (the batch_over_model layout)."""

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(MODEL_AXIS, None), P(("data", "model"))),
                       out_specs=P(("data", "model")), check_vma=False)
    def f(tab, ids):
        return bucketed_gather(tab, ids, axis=MODEL_AXIS, n_shards=S,
                               capacity=cap, table_grad_scale=scale)

    return jax.jit(f), f


def _ids_cases(V):
    rng = np.random.default_rng(3)
    rand = rng.integers(0, V, size=64).astype(np.int32)
    rand[:3] = rand[3]  # duplicates across shard-local slices
    skew = rng.integers(0, V // S, size=64).astype(np.int32)  # all owner 0
    return {"random_dups": rand, "skewed_overflow": skew}


@pytest.mark.parametrize("case", ["random_dups", "skewed_overflow"])
def test_bucketed_gather_matches_dense(mesh24, case):
    V, d = N_ITEMS, 8
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    tab_sh = jax.device_put(table, jax.NamedSharding(mesh24,
                                                     P(MODEL_AXIS, None)))
    ids = jnp.asarray(_ids_cases(V)[case])
    cap = _capacity(ids.shape[0] // 8, S, 2.0)
    jf, _ = _run_gather(mesh24, table, ids, cap)
    out = jf(tab_sh, ids)
    chex.assert_trees_all_close(np.asarray(out),
                                np.asarray(jnp.take(table, ids, axis=0)),
                                atol=1e-6)


@pytest.mark.parametrize("case,scale", [("random_dups", 1.0),
                                        ("skewed_overflow", 1.0),
                                        ("random_dups", 0.25)])
def test_bucketed_gather_grads_match_dense(mesh24, case, scale):
    """VJP == dense-gather grad x table_grad_scale, on BOTH branches
    (the skewed case forces the all_gather+psum overflow fallback)."""
    V, d = N_ITEMS, 8
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    tab_sh = jax.device_put(table, jax.NamedSharding(mesh24,
                                                     P(MODEL_AXIS, None)))
    ids = jnp.asarray(_ids_cases(V)[case])
    cap = _capacity(ids.shape[0] // 8, S, 2.0)
    jf, _ = _run_gather(mesh24, table, ids, cap, scale=scale)

    gs = jax.jit(jax.grad(lambda t: jnp.sum(jnp.sin(jf(t, ids)))))(tab_sh)
    gd = jax.grad(lambda t: jnp.sum(jnp.sin(jnp.take(t, ids, axis=0))))(table)
    chex.assert_trees_all_close(np.asarray(jax.device_get(gs)),
                                np.asarray(gd) * scale, atol=1e-5)


def test_bucket_slots_layout_and_overflow():
    """Pure helper: slot = owner*cap + rank for in-capacity queries,
    sentinel S*cap beyond; overflow flag iff any bucket exceeds cap."""
    rows_per = 10
    ids = jnp.asarray([31, 5, 12, 7, 0, 25, 11, 39], jnp.int32)  # owners
    # owners: 3,0,1,0,0,2,1,3 -> counts {0:3, 1:2, 2:1, 3:2}
    perm, slot, over = _bucket_slots(ids, 4, rows_per, cap=3)
    assert not bool(over)
    ids_sorted = np.asarray(jnp.take(ids, perm))
    send = np.full(4 * 3, -1)
    send[np.asarray(slot)] = ids_sorted
    for o in range(4):
        bucket = [i for i in send[o * 3:(o + 1) * 3] if i >= 0]
        assert sorted(bucket) == sorted(
            int(i) for i in np.asarray(ids) if i // rows_per == o)
    _, slot2, over2 = _bucket_slots(ids, 4, rows_per, cap=2)
    assert bool(over2)  # owner 0 has 3 queries > cap 2
    assert int(np.sum(np.asarray(slot2) == 4 * 2)) == 1  # one dropped


@pytest.mark.heavy
def test_bucketed_gather_property_sweep(mesh24):
    """Randomized sweep over id distributions (uniform, skewed-to-one-
    owner, heavy duplicates, single repeated id), query counts not
    divisible by the shard count, and capacity factors down to 0.5 (the
    fallback-forcing regime): values AND grads == the dense gather."""
    from hypothesis import given, settings, strategies as st

    V, d = N_ITEMS, 4
    rng0 = np.random.default_rng(42)
    table = jnp.asarray(rng0.normal(size=(V, d)).astype(np.float32))
    tab_sh = jax.device_put(table, jax.NamedSharding(mesh24,
                                                     P(MODEL_AXIS, None)))

    @settings(max_examples=25, deadline=None)
    @given(n_per=st.integers(1, 9), factor=st.sampled_from([0.5, 1.0, 2.0]),
           dist=st.sampled_from(["uniform", "skew", "dups", "const"]),
           seed=st.integers(0, 7))
    def run(n_per, factor, dist, seed):
        rng = np.random.default_rng(seed)
        n = n_per * 8  # global count over the 8 (data x model) shards
        if dist == "uniform":
            ids = rng.integers(0, V, size=n)
        elif dist == "skew":
            ids = rng.integers(0, V // S, size=n)  # all owner 0
        elif dist == "dups":
            ids = rng.integers(0, V, size=max(1, n // 4))[
                rng.integers(0, max(1, n // 4), size=n)]
        else:
            ids = np.full(n, int(rng.integers(0, V)))
        ids = jnp.asarray(ids, jnp.int32)
        cap = _capacity(n_per, S, factor)
        jf, _ = _run_gather(mesh24, table, ids, cap)
        out = jf(tab_sh, ids)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(jnp.take(table, ids, axis=0)),
                                   atol=1e-6)
        gs = jax.jit(jax.grad(lambda t: jnp.sum(jnp.cos(jf(t, ids)))))(
            tab_sh)
        gd = jax.grad(lambda t: jnp.sum(jnp.cos(jnp.take(t, ids,
                                                         axis=0))))(table)
        # atol covers N-way accumulation-order drift (duplicate-heavy and
        # const distributions sum many cotangents into one row)
        np.testing.assert_allclose(np.asarray(jax.device_get(gs)),
                                   np.asarray(gd), atol=5e-5, rtol=1e-5)

    run()


def _single_device_reference(cfg, batch, tx):
    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params0, cfg,
                                                           batch)
    u0, _ = tx.update(g0, tx.init(params0), params0)
    return optax.apply_updates(params0, u0)


@pytest.mark.heavy
@pytest.mark.parametrize("model_name", ["hpmn", "bst"])
def test_batch_over_model_step_matches_single_device(model_name):
    """Full shard_map train step with the batch sharded over ("data",
    "model") and the bucketed a2a lookup == single-device step. Exercises
    the 1/n_model table-grad scaling composed with the UNSCALED direct l2
    gradient (amazon config ships l2_weight=1e-4 > 0) and the cov reg."""
    mesh = make_mesh(model_parallel=S, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.model.name = model_name
    cfg.model.hpmn_layers = 2
    cfg.train.steps_per_dispatch = 1
    cfg.mesh.embedding_mode = "a2a"
    cfg.mesh.batch_over_model = True
    assert cfg.loss.l2_weight > 0  # the grad-accounting hazard under test
    batch = to_device_arrays(dummy_batch(16, 12, N_ITEMS, N_CATS, seed=5))
    tx = optax.sgd(1e-2)
    p_ref = _single_device_reference(cfg, batch, tx)

    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                                mesh)
    opt_state = jax.device_put(tx.init(params),
                               param_shardings(mesh, tx.init(params)))
    jit_train, jit_eval = make_shardmap_steps(cfg, tx, mesh)
    step = jit_train(params, opt_state)
    sbatch = shard_batch(mesh, batch, over=("data", "model"))
    p2, _, metrics = step(params, opt_state, sbatch)
    chex.assert_trees_all_close(jax.device_get(p2), jax.device_get(p_ref),
                                atol=2e-5)
    assert np.isfinite(float(metrics["loss"]))
    # reported loss is the global mean (pmean over distinct sub-batches)
    loss_ref, _ = loss_fn(init_model(jax.random.key(0), cfg, N_ITEMS,
                                     N_CATS), cfg, batch)
    assert abs(float(metrics["loss"]) - float(loss_ref)) < 1e-4
    # eval path: logits land sharded over (data, model), content == dense
    logits_ref, _ = apply_model(p_ref, cfg, batch)
    logits = jit_eval(p2)(p2, sbatch)
    chex.assert_trees_all_close(np.asarray(jax.device_get(logits)),
                                np.asarray(logits_ref), atol=1e-4)


def test_explicit_psum_overrides_batch_over_model():
    """batch_over_model ships True (r5) but the embedding mode is the
    authoritative layout selector: psum needs model-replicated ids, so an
    explicit embedding_mode="psum" runs the replicated-batch layout — the
    step accepts a batch sharded over ("data",) only, and matches the
    single-device step."""
    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    cfg.train.steps_per_dispatch = 1
    cfg.mesh.embedding_mode = "psum"
    assert cfg.mesh.batch_over_model  # the shipped default
    tx = optax.sgd(1e-2)
    batch = to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=3))
    p_ref = _single_device_reference(cfg, batch, tx)
    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                                mesh)
    opt0 = jax.device_put(tx.init(params),
                          param_shardings(mesh, tx.init(params)))
    step = make_shardmap_steps(cfg, tx, mesh)[0](params, opt0)
    p2, _, m = step(params, opt0, shard_batch(mesh, batch))  # data-only
    chex.assert_trees_all_close(jax.device_get(p2), jax.device_get(p_ref),
                                atol=2e-5)


@pytest.mark.heavy
def test_batch_over_model_multistep_matches_sequential():
    """k=2 fused dispatch under batch_over_model == two k=1 dispatches."""
    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    cfg.mesh.embedding_mode = "a2a"
    cfg.mesh.batch_over_model = True
    tx = optax.sgd(1e-2)
    batches = [to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=s))
               for s in (1, 2)]
    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                                mesh)
    opt0 = jax.device_put(tx.init(params),
                          param_shardings(mesh, tx.init(params)))

    cfg.train.steps_per_dispatch = 1
    step1 = make_shardmap_steps(cfg, tx, mesh)[0](params, opt0)
    p_seq, o_seq = params, opt0
    for b in batches:
        p_seq, o_seq, m_seq = step1(p_seq, o_seq,
                                    shard_batch(mesh, b,
                                                over=("data", "model")))

    cfg.train.steps_per_dispatch = 2
    stepk = make_shardmap_steps(cfg, tx, mesh)[0](params, opt0)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    p_k, _, m_k = stepk(params, opt0,
                        shard_batch(mesh, stack, stacked=True,
                                    over=("data", "model")))
    chex.assert_trees_all_close(jax.device_get(p_seq), jax.device_get(p_k),
                                atol=1e-6)
    chex.assert_trees_all_close(m_seq["loss"], m_k["loss"], atol=1e-6)


@pytest.mark.heavy
@pytest.mark.parametrize("factory_name,bom", [("gspmd", False),
                                              ("shardmap", False),
                                              ("shardmap", True)])
def test_fused_eval_with_a2a_lookup(factory_name, bom):
    """jit_eval.fused (lax.map-chained eval) composed with the bucketed
    a2a lookup inside the mapped body — on the GSPMD and shard_map
    factories, with and without batch_over_model — scores == dense."""
    import optax

    from hpmn_tpu.parallel import make_sharded_steps

    mesh = make_mesh(model_parallel=S, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.train.steps_per_dispatch = 1
    cfg.model.hpmn_layers = 2
    cfg.mesh.embedding_mode = "a2a"
    cfg.mesh.batch_over_model = bom
    over = ("data", "model") if bom else ("data",)
    factory = make_sharded_steps if factory_name == "gspmd" \
        else make_shardmap_steps
    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                                mesh)
    _, jit_eval = factory(cfg, optax.sgd(1e-2), mesh)
    fe = jit_eval.fused(params)
    batches = [to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=s))
               for s in (1, 2, 3)]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    out = np.asarray(jax.device_get(
        fe(params, shard_batch(mesh, stack, stacked=True, over=over))))
    p_ref = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    for i, b in enumerate(batches):
        want, _ = apply_model(p_ref, cfg, b)
        np.testing.assert_allclose(out[i], np.asarray(want), atol=1e-4)


def _regime_batch(B, T, skew: bool, seed=0):
    """Full-mask batch with every id field redrawn: uniform over the whole
    vocab, or (skew) DISTINCT ids confined to shard 0's rows — the
    frequency-skew regime the capacity fallback exists for. Distinctness
    matters since the r5 dedup: duplicate owner-0 ids (e.g. padding
    zeros) collapse to ONE slot and no longer overflow a bucket, so
    forcing the fallback needs per-owner UNIQUE load past capacity — a
    tiled permutation of shard 0's row range makes every contiguous
    query slice all-distinct."""
    import dataclasses

    from hpmn_tpu.data.schema import _ID_FIELDS

    b = dummy_batch(B, T, N_ITEMS, N_CATS, seed=seed)
    rng = np.random.default_rng(seed + 100)
    kw = {"seq_mask": np.ones((B, T), np.float32)}
    for f in _ID_FIELDS:
        v = (N_ITEMS if "item" in f else N_CATS)
        shape = np.asarray(getattr(b, f)).shape
        if skew:
            hi = v // S
            size = int(np.prod(shape))
            flat = np.tile(rng.permutation(hi), -(-size // hi))[:size]
            kw[f] = flat.reshape(shape).astype(np.int32)
        else:
            kw[f] = rng.integers(0, v, shape).astype(np.int32)
    return to_device_arrays(dataclasses.replace(b, **kw))


@pytest.mark.parametrize("factory_name", ["shardmap_bom", "gspmd"])
def test_overflow_counter_in_metrics(factory_name):
    """The psum'd bucket-overflow flag surfaces as metrics['a2a_overflow']
    (VERDICT r4 weak #2): 1.0 on a batch whose skewed ids force the
    all_gather+psum fallback, 0.0 on a uniform batch, and SUMMED across a
    k=2 fused dispatch (one of each -> 1.0) — on both the shard_map
    batch_over_model step and the GSPMD replicated-ids a2a step."""
    import optax

    from hpmn_tpu.parallel import make_sharded_steps

    mesh = make_mesh(model_parallel=S, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    cfg.train.steps_per_dispatch = 1
    cfg.mesh.embedding_mode = "a2a"
    cfg.mesh.a2a_capacity_factor = 3.0  # headroom for the uniform batch
    bom = factory_name == "shardmap_bom"
    cfg.mesh.batch_over_model = bom
    factory = make_shardmap_steps if bom else make_sharded_steps
    over = ("data", "model") if bom else ("data",)
    tx = optax.sgd(1e-2)
    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                                mesh)
    opt0 = jax.device_put(tx.init(params),
                          param_shardings(mesh, tx.init(params)))
    step = factory(cfg, tx, mesh)[0](params, opt0)

    def metrics_of(step_fn, batch):
        # fresh copies per call: the GSPMD step donates params/opt_state
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt0)
        return step_fn(p, o, batch)[2]

    uniform = _regime_batch(16, 12, skew=False, seed=1)
    skewed = _regime_batch(16, 12, skew=True, seed=1)
    m_u = metrics_of(step, shard_batch(mesh, uniform, over=over))
    assert float(m_u["a2a_overflow"]) == 0.0
    m_s = metrics_of(step, shard_batch(mesh, skewed, over=over))
    assert float(m_s["a2a_overflow"]) == 1.0

    cfg.train.steps_per_dispatch = 2
    stepk = factory(cfg, tx, mesh)[0](params, opt0)
    stack = jax.tree.map(lambda *xs: jnp.stack([np.asarray(x) for x in xs]),
                         *[skewed, uniform])
    m_k = metrics_of(stepk, shard_batch(mesh, stack, stacked=True,
                                        over=over))
    assert float(m_k["a2a_overflow"]) == 1.0  # counter: 1 of 2 steps


def test_overflow_counter_through_driver():
    """train() surfaces the counter in the log line (uniform synthetic ids
    -> stays 0) — the driver-side accumulation path."""
    from hpmn_tpu.train.train import train

    cfg = get_config("amazon_hpmn")
    cfg.n_examples = 400
    cfg.model.hpmn_layers = 1
    cfg.train.batch_size = 16
    cfg.train.max_steps = 4
    cfg.train.eval_every = 4
    cfg.train.log_every = 2
    cfg.train.steps_per_dispatch = 1
    cfg.eval_steps_per_dispatch = 1  # pin: config ships measured knees
    cfg.eval_batch_size = 16
    cfg.mesh.model_parallel = S  # 8 fake devices -> (data 2, model 4)
    logs = []
    train(cfg, log=logs.append)
    assert any("a2a_overflow_steps 0" in s for s in logs), logs


def test_derive_capacity_factor():
    """Auto f (mesh.a2a_capacity_factor=0): uniform ids derive a modest
    factor; DISTINCT ids confined to one owner derive ~margin*S (every
    unique lands on one owner); duplicate-heavy skew (all id 0 — the
    padding regime) derives the FLOOR, because the dedup'd exchange
    collapses duplicates and capacity bounds UNIQUE counts. The derived
    capacity admits the sampled slices' unique loads without overflow
    (the shipped criterion: contiguous windows, unique ids per owner)."""
    from hpmn_tpu.parallel.embedding_sharding import derive_capacity_factor

    rng = np.random.default_rng(0)
    rows_per = N_ITEMS // S
    uniform = rng.integers(0, N_ITEMS, size=20000)
    distinct0 = np.tile(rng.permutation(rows_per),
                        20000 // rows_per + 1)[:20000]
    dupes0 = np.zeros(20000, np.int64)  # padding zeros: ONE unique
    f_u = derive_capacity_factor([(uniform, rows_per)], S, [8, 96])
    f_d = derive_capacity_factor([(distinct0, rows_per)], S, [8, 96])
    f_z = derive_capacity_factor([(dupes0, rows_per)], S, [8, 96])
    assert f_u < f_d
    assert f_d >= S  # one owner absorbs every unique -> factor ~ margin*S
    assert f_z == 1.1  # duplicates collapse to one slot -> the f_min floor
    assert 1.1 <= f_u <= 3.5  # modest for uniform ids at these sizes
    # the derived capacity admits the worst sampled slice's UNIQUE load
    for f, ids in ((f_u, uniform), (f_d, distinct0)):
        for n in (8, 96):
            cap = _capacity(n, S, f)
            for _ in range(16):
                start = int(rng.integers(0, len(ids) - n + 1))
                u = np.unique(ids[start:start + n])
                assert np.bincount(u // rows_per, minlength=S).max() <= cap


def test_driver_resolves_capacity_factor():
    """cfg.mesh.a2a_capacity_factor=0 (shipped) resolves at train startup
    from the dataset arrays and is logged; the resolved value feeds the
    built steps."""
    from hpmn_tpu.train.train import train

    cfg = get_config("amazon_hpmn")
    cfg.n_examples = 400
    cfg.model.hpmn_layers = 1
    cfg.train.batch_size = 16
    cfg.train.max_steps = 2
    cfg.train.eval_every = 2
    cfg.train.log_every = 10 ** 9
    cfg.train.steps_per_dispatch = 1
    cfg.eval_steps_per_dispatch = 1  # pin: config ships measured knees
    cfg.eval_batch_size = 16
    cfg.mesh.model_parallel = S
    assert float(cfg.mesh.a2a_capacity_factor) == 0.0  # shipped auto
    logs = []
    train(cfg, log=logs.append)
    assert any("derived a2a_capacity_factor=" in s for s in logs), logs
    assert float(cfg.mesh.a2a_capacity_factor) >= 1.1


def test_resolve_capacity_factor_covers_eval_slices():
    """The derivation must admit the EVAL step's per-shard query sizes too
    (review r5): eval_batch_size is typically smaller than the train
    batch, relative per-owner imbalance grows as the slice shrinks, and
    eval's overflow flag is not surfaced at runtime — so a factor derived
    from train sizes alone could leave every eval exchange on the chronic
    all_gather+psum fallback invisibly."""
    from hpmn_tpu.data.synthetic import SPECS, make_ctr_dataset
    from hpmn_tpu.train.train import resolve_capacity_factor

    cfg = get_config("amazon_hpmn")
    cfg.train.batch_size = 64
    cfg.eval_batch_size = 16
    cfg.mesh.model_parallel = S
    cfg.mesh.embedding_mode = "a2a"
    cfg.mesh.a2a_capacity_factor = 0.0
    spec = SPECS[cfg.dataset]
    arrays = make_ctr_dataset(spec, 256, seed=0)
    logs = []
    resolve_capacity_factor(cfg, arrays, spec, n_model=S, bom=True,
                            log=logs.append)
    line = next(s for s in logs if "slice sizes" in s)
    n_dev = len(jax.devices())
    n_data = max(1, n_dev // S)
    for B in (64, 16):  # train AND eval per-shard sizes in the derivation
        ex = max(1, B // (n_data * S))
        assert f"{max(1, ex)}" in line.split("slice sizes")[1], line
    assert float(cfg.mesh.a2a_capacity_factor) >= 1.1

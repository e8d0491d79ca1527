"""Decompose a config's train-step time into embedding fwd / embedding bwd /
everything-else by surgical variant toggling (the r1 ARCHITECTURE.md §4
protocol, re-runnable).

--config xlong_hpmn (default) variants (hierarchical+Pallas bf16 flagship):
  full       the real train step
  no_emb_bwd embedding tables stop_gradient'ed: gathers stay, cotangent
             aggregation (scatter / matmul_agg) eliminated
  const_x    lookup replaced by a constant: embedding fwd AND bwd eliminated
  f32        full step with f32 scan dtype (bf16 win check)
  l2_on      full step with the driver config's real l2_weight (the
             honest-objective delta, VERDICT r1 weak #2)

--config xlong_bst / taobao_bst variants (VERDICT r2 weak #1 — the BST
lifelong path gets the same treatment as HPMN):
  full       the real train step (at the shipped bst_blocks=1 the one
             block IS the final block and always takes the O(S)
             target-query path; the chunked online-softmax op only runs
             in the inner blocks of bst_blocks > 1 configs)
  no_emb_bwd / const_x   as above
  no_attn    attention output replaced by vh (every projection/LN/FFN
             matmul and the embedding path stay): the attention op's
             marginal cost, fwd+bwd
  chunk=N    online-softmax key-chunk size sweep (0 = dense O(S^2))

Prints ms/step and ex/s for each. Timing per CLAUDE.md (scalar pull, >=3
distinct batches).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def bench(step, params, opt, batches, steps=12):
    for i in range(3):
        p, o, m = step(params, opt, batches[i % len(batches)])
    float(m["loss"])
    t0 = time.time()
    for i in range(steps):
        p, o, m = step(params, opt, batches[i % len(batches)])
    float(m["loss"])
    return (time.time() - t0) / steps


def make_step_factory(tx):
    def make_step_wrapped(cfg, wrap):
        def train_step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                wrap, has_aux=True)(params, cfg, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax as _o
            return _o.apply_updates(params, updates), opt_state, metrics
        # no donation: the same params/opt arrays seed every variant
        return jax.jit(train_step)
    return make_step_wrapped


def main_bst(config_name: str):
    """BST decomposition (VERDICT r2 weak #1): embedding fwd/bwd via the
    same surgical toggles as HPMN, plus a no-attention variant isolating
    the (chunked or dense) attention op's end-to-end marginal cost and a
    key-chunk-size sweep."""
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.schema import batch_from_numpy, to_device_arrays
    from hpmn_tpu.data.synthetic import SPECS, make_ctr_dataset
    from hpmn_tpu.models import extra_baselines, init_model, loss_fn
    from hpmn_tpu.train.train import make_train_step

    cfg = get_config(config_name)
    cfg.train.steps_per_dispatch = 1  # variant toggling times single steps
    B = cfg.train.batch_size
    spec = SPECS[cfg.dataset]
    arrays = make_ctr_dataset(spec, 4 * B, seed=0, min_len_frac=1.0)
    arrays["seq_mask"][:] = 1.0
    batches = [to_device_arrays(batch_from_numpy(
        arrays, np.arange(i * B, (i + 1) * B))) for i in range(4)]
    params = init_model(jax.random.key(0), cfg, spec.n_items, spec.n_cats)
    tx = optax.adam(cfg.train.lr)
    opt = tx.init(params)
    make_step_wrapped = make_step_factory(tx)

    res = {}
    res["full"] = bench(make_train_step(cfg, tx), params, opt, batches)

    def loss_no_emb_grad(p, cfg, batch):
        p = dict(p)
        p["embedding"] = jax.lax.stop_gradient(p["embedding"])
        return loss_fn(p, cfg, batch)

    res["no_emb_bwd"] = bench(make_step_wrapped(cfg, loss_no_emb_grad),
                              params, opt, batches)

    def const_lookup(emb, item_ids, cat_ids):
        d = emb["item"].shape[-1] + emb["cat"].shape[-1]
        return jnp.zeros(item_ids.shape + (d,), emb["item"].dtype) + 0.01

    res["const_x"] = bench(make_step_wrapped(
        cfg, lambda p, c, b: loss_fn(p, c, b, const_lookup)),
        params, opt, batches)

    # no_attn: ctx := vh (sliced to the query rows) — identical shapes and
    # dtypes downstream, so the delta is exactly the attention op (scores +
    # softmax + weighted sum), fwd+bwd.
    null_attn = lambda qh, kh, vh, kbias, *a: (  # noqa: E731
        vh[:, :, -qh.shape[2]:, :].astype(jnp.float32))
    saved = (extra_baselines._chunked_attention,
             extra_baselines._dense_attention)
    try:
        extra_baselines._chunked_attention = null_attn
        extra_baselines._dense_attention = null_attn
        res["no_attn"] = bench(make_train_step(cfg, tx), params, opt,
                               batches)
    finally:
        (extra_baselines._chunked_attention,
         extra_baselines._dense_attention) = saved

    # chunk-size sweep (0 = dense; guarded by score-matrix memory). Only
    # meaningful for bst_blocks > 1: the final block always runs the O(S)
    # target-query path, so a 1-block config never executes the chunked op
    # (re-timing identical programs just samples tunnel noise).
    S = spec.seq_len + 1
    default_chunk = cfg.model.bst_attn_chunk  # the loop mutates cfg below
    chunks = (0, 64, 128, 256, 512) if cfg.model.bst_blocks > 1 else ()
    for chunk in chunks:
        if chunk == default_chunk:
            continue  # already measured as "full"
        scores_gb = 4 * B * cfg.model.bst_heads * S * S / 2 ** 30
        if chunk == 0 and scores_gb > 4.0:
            print(f"chunk=0 skipped: dense scores would be "
                  f"{scores_gb:.1f} GB")
            continue
        cfg.model.bst_attn_chunk = chunk
        res[f"chunk={chunk}"] = bench(make_train_step(cfg, tx), params,
                                      opt, batches)

    for k, v in res.items():
        print(f"{k:12s} {v * 1e3:7.2f} ms/step   {B / v:10,.0f} ex/s")
    print(f"# emb bwd: {(res['full'] - res['no_emb_bwd']) * 1e3:.2f} ms; "
          f"emb fwd: {(res['no_emb_bwd'] - res['const_x']) * 1e3:.2f} ms; "
          f"attention (fwd+bwd): "
          f"{(res['full'] - res['no_attn']) * 1e3:.2f} ms; "
          f"rest: {res['const_x'] * 1e3:.2f} ms")


def main():
    from bench_scatter import timeit  # noqa: F401  (path side effect only)
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.schema import batch_from_numpy, to_device_arrays
    from hpmn_tpu.data.synthetic import XLONG, make_ctr_dataset
    from hpmn_tpu.models import init_model, loss_fn
    from hpmn_tpu.train.train import make_train_step

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xlong_hpmn",
                    choices=["xlong_hpmn", "xlong_bst", "taobao_bst"])
    args = ap.parse_args()
    if args.config != "xlong_hpmn":
        return main_bst(args.config)

    B = 512
    cfg = get_config("xlong_hpmn")
    cfg.train.steps_per_dispatch = 1  # variant toggling times single steps
    cfg.train.batch_size = B
    cfg.model.use_hierarchical_scan = True
    cfg.model.use_pallas = True
    cfg.model.assume_full_mask = True
    cfg.model.scan_dtype = "bfloat16"
    l2_real = cfg.loss.l2_weight
    cfg.loss.l2_weight = 0.0

    arrays = make_ctr_dataset(XLONG, 4 * B, seed=0, min_len_frac=1.0)
    arrays["seq_mask"][:] = 1.0
    batches = [to_device_arrays(batch_from_numpy(
        arrays, np.arange(i * B, (i + 1) * B))) for i in range(4)]
    params = init_model(jax.random.key(0), cfg, XLONG.n_items, XLONG.n_cats)
    tx = optax.adam(cfg.train.lr)
    opt = tx.init(params)

    res = {}
    res["full"] = bench(make_train_step(cfg, tx), params, opt, batches)

    # --- no_emb_bwd: stop_gradient through the tables --------------------
    def make_step_wrapped(cfg, wrap):
        def train_step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                wrap, has_aux=True)(params, cfg, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax as _o
            return _o.apply_updates(params, updates), opt_state, metrics
        # no donation: the same params/opt arrays seed every variant
        return jax.jit(train_step)

    def loss_no_emb_grad(p, cfg, batch):
        p = dict(p)
        p["embedding"] = jax.lax.stop_gradient(p["embedding"])
        return loss_fn(p, cfg, batch)

    res["no_emb_bwd"] = bench(make_step_wrapped(cfg, loss_no_emb_grad),
                              params, opt, batches)

    # --- const_x: no gathers either --------------------------------------
    def const_lookup(emb, item_ids, cat_ids):
        d = emb["item"].shape[-1] + emb["cat"].shape[-1]
        return jnp.zeros(item_ids.shape + (d,), emb["item"].dtype) + 0.01

    def loss_const_x(p, cfg, batch):
        return loss_fn(p, cfg, batch, const_lookup)

    res["const_x"] = bench(make_step_wrapped(cfg, loss_const_x),
                           params, opt, batches)

    # --- f32 scan ---------------------------------------------------------
    cfg.model.scan_dtype = "float32"
    res["f32_scan"] = bench(make_train_step(cfg, tx), params, opt, batches)
    cfg.model.scan_dtype = "bfloat16"

    # --- l2 on (the driver config's real objective) ----------------------
    cfg.loss.l2_weight = l2_real
    res["l2_on"] = bench(make_train_step(cfg, tx), params, opt, batches)

    for k, v in res.items():
        print(f"{k:12s} {v * 1e3:7.2f} ms/step   {B / v:10,.0f} ex/s")
    print(f"# emb bwd cost: {(res['full'] - res['no_emb_bwd']) * 1e3:.2f} ms; "
          f"emb fwd cost: {(res['no_emb_bwd'] - res['const_x']) * 1e3:.2f} ms; "
          f"rest: {res['const_x'] * 1e3:.2f} ms; "
          f"l2 delta: {(res['l2_on'] - res['full']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()

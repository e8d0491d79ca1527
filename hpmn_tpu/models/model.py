"""Unified model API: one init/apply pair covering every encoder family.

Reference equivalent: the per-model graph-building classes sharing the
embedding + tower + loss plumbing (SURVEY.md §1 L2-L4). All models expose:

    params = init_model(key, cfg, n_items, n_cats)
    logits, aux = apply_model(params, cfg, batch, lookup_fn=..., gru_seq_fn=...)
    loss, metrics = total_loss(params, cfg, logits, aux, labels)

``lookup_fn`` swaps the dense embedding gather for the row-sharded collective
lookup; ``gru_seq_fn`` swaps the jnp GRU scan for the fused Pallas kernel.
Both default to the single-device jnp paths.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.schema import Batch
from . import dien as dien_mod
from . import gru4rec as gru4rec_mod
from . import hpmn as hpmn_mod
from . import rum as rum_mod
from .embedding import dense_lookup, init_embedding
from .losses import bce_with_logits, covariance_regularizer, l2_regularizer
from .readout import attention_readout, init_readout
from .tower import apply_tower, init_tower

ENCODERS = ("hpmn", "gru4rec", "dien", "rum", "dnn", "lstm", "caser", "shan",
            "svdpp", "bst")


def _dtype(cfg):
    return jnp.dtype(cfg.model.dtype)


def init_model(key: jax.Array, cfg, n_items: int, n_cats: int,
               n_users: int = 0) -> Dict:
    dtype = _dtype(cfg)
    name = cfg.model.name
    d_beh = 2 * cfg.model.emb_dim  # concat(item, cat) behavior embedding
    d_m = cfg.model.mem_dim
    ke, kenc, kr, kt = jax.random.split(key, 4)
    use_user = bool(getattr(cfg.model, "use_user_emb", False))
    if (use_user or name == "svdpp") and n_users <= 0:
        raise ValueError(
            f"{'use_user_emb' if use_user else 'svdpp'} needs n_users > 0 "
            "passed to init_model (the dataset spec's user-vocab size)")
    params: Dict = {
        "embedding": init_embedding(ke, n_items, n_cats, cfg.model.emb_dim,
                                    dtype,
                                    n_users=n_users if use_user else 0),
    }
    if name == "hpmn":
        params["encoder"] = hpmn_mod.init_hpmn(kenc, d_beh, d_m,
                                               cfg.model.hpmn_layers, dtype)
        params["readout"] = init_readout(kr, d_m, d_beh,
                                         cfg.model.readout_dim, dtype)
        d_state = d_m
    elif name == "gru4rec":
        params["encoder"] = gru4rec_mod.init_gru4rec(kenc, d_beh, d_m, dtype)
        d_state = d_m
    elif name == "dien":
        params["encoder"] = dien_mod.init_dien(kenc, d_beh, d_m,
                                               cfg.model.readout_dim, dtype)
        d_state = d_m
    elif name == "rum":
        params["encoder"] = rum_mod.init_rum(kenc, d_beh, d_m,
                                             cfg.model.rum_slots, dtype)
        d_state = d_m
    else:
        from . import extra_baselines
        params["encoder"], d_state = extra_baselines.init_encoder(
            kenc, name, cfg, d_beh, dtype, n_users=n_users)
    d_tower_in = d_beh + d_state
    if use_user:
        # Optional user-embedding tower input (SURVEY.md §2.1 tower row:
        # [read/state; target-emb (; user-emb)]), row-shardable like the
        # id tables.
        d_tower_in += cfg.model.emb_dim
    params["tower"] = init_tower(kt, d_tower_in, cfg.model.tower_hidden,
                                 dtype)
    return params


def _user_lookup(lookup_fn, emb: Dict, uid: jax.Array) -> jax.Array:
    """User-table gather [B] -> [B, emb_dim]. Sharded lookup factories attach
    a ``.user`` collective (row-sharded table over "model"); the dense path
    gathers directly."""
    f = getattr(lookup_fn, "user", None)
    if f is not None:
        return f(emb, uid)
    from ..ops.embedding_agg import take_rows

    return take_rows(emb["user"], uid)


def _resolve_gru_seq_fn(cfg, gru_seq_fn):
    """Default scan implementation: jnp lax.scan, or the fused Pallas kernel
    when cfg.model.use_pallas (batch-major wrapper for the generic models)."""
    if gru_seq_fn is not None or not cfg.model.use_pallas:
        return gru_seq_fn
    from ..ops.pallas_gru import pallas_gru_sequence

    return lambda p, xs, m, a=None: pallas_gru_sequence(
        p, xs, mask=m, gate_scale=a)


def apply_model(params: Dict, cfg, batch: Batch,
                lookup_fn: Optional[Callable] = None,
                gru_seq_fn: Optional[Callable] = None,
                ) -> Tuple[jax.Array, Dict]:
    """-> (logits [B], aux dict: may contain "memory" (HPMN slots for the
    covariance regularizer) and "aux_loss" (DIEN))."""
    from ..data.schema import expand_batch
    from ..utils import validate_batch

    # Wire-compact batches (uint16 ids / uint8 mask — train.compact_transfer,
    # schema.compact_batch) expand to the schema dtypes here, on device, so
    # every consumer below sees the standard contract. No-op otherwise.
    batch = expand_batch(batch)
    validate_batch(batch)  # trace-time shape/dtype contract (SURVEY.md §5.2)
    if lookup_fn is None:
        lookup_fn = dense_lookup
    # Bucketed-a2a lookups report their mesh-wide overflow flag through a
    # per-trace sink list (parallel.embedding_sharding.exchange_overflow);
    # drained into aux["a2a_overflow"] below so the train step can surface
    # the fallback rate in metrics. Cleared up front in case an abandoned
    # trace left stale tracers behind.
    _of_sink = getattr(lookup_fn, "overflow_sink", None)
    if _of_sink is not None:
        _of_sink.clear()
    gru_seq_fn = _resolve_gru_seq_fn(cfg, gru_seq_fn)
    name = cfg.model.name
    # Time-major fused-kernel hot path: embeddings are gathered straight
    # into [T, B, 2d] by transposing the int32 id arrays (cheap), so no
    # activation transposes are ever materialized.
    use_tm = cfg.model.use_pallas and (
        (name == "hpmn" and cfg.model.use_hierarchical_scan)
        or name in ("dien", "gru4rec"))
    emb = params["embedding"]
    q = lookup_fn(emb, batch.target_item, batch.target_cat)  # [B, 2d]
    if not use_tm:
        x = lookup_fn(emb, batch.item_seq, batch.cat_seq)  # [B, T, 2d]
        mask = batch.seq_mask.astype(x.dtype)
    else:
        import functools

        from ..ops.pallas_gru import pallas_gru_sequence_tm
        scan_tm = functools.partial(pallas_gru_sequence_tm,
                                    dtype=jnp.dtype(cfg.model.scan_dtype))
        x_tm = lookup_fn(emb, batch.item_seq.T, batch.cat_seq.T)
        mask_tm = (None if cfg.model.assume_full_mask
                   else batch.seq_mask.T.astype(x_tm.dtype))
    aux: Dict = {}

    if use_tm and name == "hpmn":
        from ..ops.pallas_readout import pallas_attention_readout
        if mask_tm is None and cfg.model.pallas_stride_outputs \
                and cfg.model.hpmn_period > 1:
            from ..ops.pallas_gru import pallas_gru_stride_tm
            stride_fn = functools.partial(
                pallas_gru_stride_tm, dtype=jnp.dtype(cfg.model.scan_dtype))
            memory = hpmn_mod.encode_hierarchical_stride_tm(
                params["encoder"], x_tm, cfg.model.hpmn_period,
                stride_fn=lambda p, xs, per: stride_fn(p, xs, per))
        else:
            memory = hpmn_mod.encode_hierarchical_tm(
                params["encoder"], x_tm, mask_tm, cfg.model.hpmn_period,
                gru_seq_tm_fn=scan_tm)
        memory = memory.astype(jnp.float32)
        aux["memory"] = memory
        state = pallas_attention_readout(params["readout"], memory, q)
    elif use_tm and name == "dien":
        x_neg_tm = lookup_fn(emb, batch.neg_item_seq.T, batch.neg_cat_seq.T)
        state, aux_loss = dien_mod.encode_tm(
            params["encoder"], x_tm, mask_tm, q, x_neg_tm,
            cfg.model.dien_use_aux_loss, gru_seq_tm_fn=scan_tm)
        state = state.astype(jnp.float32)
        aux["aux_loss"] = aux_loss
    elif use_tm and name == "gru4rec":
        _, state = scan_tm(params["encoder"]["gru"], x_tm, mask_tm)
        state = state.astype(jnp.float32)
    elif name == "hpmn":
        if cfg.model.use_hierarchical_scan:
            memory = hpmn_mod.encode_hierarchical(
                params["encoder"], x, mask, cfg.model.hpmn_period,
                gru_seq_fn=gru_seq_fn)
        else:
            memory = hpmn_mod.encode_oracle(params["encoder"], x, mask,
                                            cfg.model.hpmn_period)
        aux["memory"] = memory
        state = attention_readout(params["readout"], memory, q)
    elif name == "gru4rec":
        state = gru4rec_mod.encode(params["encoder"], x, mask,
                                   gru_seq_fn=gru_seq_fn)
    elif name == "dien":
        x_neg = lookup_fn(emb, batch.neg_item_seq, batch.neg_cat_seq)
        state, aux_loss = dien_mod.encode(
            params["encoder"], x, mask, q, x_neg=x_neg,
            use_aux_loss=cfg.model.dien_use_aux_loss, gru_seq_fn=gru_seq_fn)
        aux["aux_loss"] = aux_loss
    elif name == "rum":
        state = rum_mod.encode(params["encoder"], x, mask, q)
    else:
        from . import extra_baselines
        state = extra_baselines.encode(params["encoder"], name, cfg, x, mask,
                                       q, uid=batch.uid)

    tower_in = [q, state]
    if getattr(cfg.model, "use_user_emb", False):
        tower_in.append(_user_lookup(lookup_fn, params["embedding"],
                                     batch.uid))
    logits = apply_tower(params["tower"], jnp.concatenate(tower_in, -1))
    if _of_sink:
        flag = _of_sink[0]
        for f in _of_sink[1:]:
            flag = jnp.maximum(flag, f)
        # 1.0 iff ANY exchange this step hit the all_gather+psum fallback
        aux["a2a_overflow"] = flag.astype(jnp.float32)
        _of_sink.clear()
    return logits, aux


def total_loss(params: Dict, cfg, logits: jax.Array, aux: Dict,
               labels: jax.Array) -> Tuple[jax.Array, Dict]:
    """BCE + lambda_cov * cov_reg (HPMN, [P §4.4]) + aux loss (DIEN)
    + lambda_L2 * ||theta||^2 (SURVEY.md §3.3)."""
    bce = bce_with_logits(logits, labels)
    loss = bce
    metrics = {"bce": bce}
    if "memory" in aux and cfg.loss.cov_weight > 0:
        cov = covariance_regularizer(aux["memory"])
        loss = loss + cfg.loss.cov_weight * cov
        metrics["cov_reg"] = cov
    if "aux_loss" in aux and cfg.model.aux_weight > 0:
        loss = loss + cfg.model.aux_weight * aux["aux_loss"]
        metrics["aux_loss"] = aux["aux_loss"]
    if cfg.loss.l2_weight > 0:
        l2 = l2_regularizer(params)
        loss = loss + cfg.loss.l2_weight * l2
        metrics["l2"] = l2
    metrics["loss"] = loss
    return loss, metrics


def loss_fn(params: Dict, cfg, batch: Batch,
            lookup_fn: Optional[Callable] = None,
            gru_seq_fn: Optional[Callable] = None) -> Tuple[jax.Array, Dict]:
    """Single callable for value_and_grad."""
    logits, aux = apply_model(params, cfg, batch, lookup_fn, gru_seq_fn)
    loss, metrics = total_loss(params, cfg, logits, aux,
                               batch.label.astype(logits.dtype))
    if "a2a_overflow" in aux:
        metrics["a2a_overflow"] = aux["a2a_overflow"]
    metrics["logits"] = logits
    return loss, metrics

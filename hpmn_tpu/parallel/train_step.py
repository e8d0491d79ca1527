"""Sharded training: DP towers with psum grad exchange + row-sharded tables,
all inside one pjit'd step.

Reference equivalent: NONE (single-device reference, SURVEY.md §2.3);
mandated by [B:5]. Idiom: annotate shardings (params via
``mesh.param_shardings``: tables P("model", None), dense replicated; batch
P("data")), and let XLA insert the DP gradient ``psum``s — the embedding
lookup's collectives are the only hand-written ones (shard_map in
``embedding_sharding``). Donation of params/opt_state keeps the step
in-place in HBM.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh

from ..models import apply_model, init_model, loss_fn
from .embedding_sharding import make_sharded_lookup, pad_vocab
from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, param_shardings,
                   replicated)


def init_sharded_model(key, cfg, n_items: int, n_cats: int, mesh: Mesh,
                       n_users: int = 0):
    """init_model with vocab padded to the model-shard count, placed onto the
    mesh with row-sharded tables (user table included when enabled)."""
    n_shards = mesh.shape[MODEL_AXIS]
    params = init_model(key, cfg, pad_vocab(n_items, n_shards),
                        pad_vocab(n_cats, n_shards),
                        n_users=pad_vocab(n_users, n_shards))
    return jax.device_put(params, param_shardings(mesh, params))


def make_sharded_steps(cfg, tx, mesh: Mesh,
                       gru_seq_fn: Optional[Callable] = None,
                       ) -> Tuple[Callable, Callable]:
    """-> (train_step, eval_step) jitted over the mesh.

    With ``cfg.train.steps_per_dispatch > 1`` the train step takes a
    STACKED Batch [k, B, ...] and scans k steps in one dispatch (same
    math/overhead win as the single-device ``make_multistep_train``,
    ARCHITECTURE §4)."""
    mode = cfg.mesh.embedding_mode
    # 0 = auto; resolved by the driver (train.resolve_capacity_factor).
    # Direct API callers who leave it 0 get the uniform-distribution 2.0.
    cap_f = float(getattr(cfg.mesh, "a2a_capacity_factor", 2.0)) or 2.0
    lookup_fn = (None if mode == "replicated"
                 else make_sharded_lookup(mesh, mode, cap_f))
    k = cfg.train.steps_per_dispatch
    p_shard = lambda p: param_shardings(mesh, p)
    b_shard = batch_sharding(mesh, stacked=k > 1)
    b_shard_eval = batch_sharding(mesh)  # eval batches are never stacked
    rep = replicated(mesh)

    def _step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch, lookup_fn, gru_seq_fn)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        del metrics["logits"]
        return params, opt_state, metrics

    if k > 1:
        from ..train.train import fuse_steps

        _train = fuse_steps(_step)
    else:
        _train = _step

    def _eval(params, batch):
        logits, _ = apply_model(params, cfg, batch, lookup_fn, gru_seq_fn)
        return logits

    def jit_train(params, opt_state):
        ps = p_shard(params)
        # Adam's mu/nu mirror the param tree under paths that still contain
        # "embedding", so the same path rule shards them correctly.
        os_shard = param_shardings(mesh, opt_state)
        return jax.jit(
            _train,
            in_shardings=(ps, os_shard, b_shard),
            out_shardings=(ps, os_shard, rep),
            donate_argnums=(0, 1),
        )

    def jit_eval(params):
        return jax.jit(_eval, in_shardings=(p_shard(params), b_shard_eval),
                       out_shardings=rep)

    def jit_eval_fused(params):
        # k-chained eval: lax.map over a stacked [k, B, ...] batch — the
        # dispatch-overhead treatment for the eval loop (ARCHITECTURE §4).
        from ..train.train import fuse_eval

        return jax.jit(fuse_eval(_eval),
                       in_shardings=(p_shard(params),
                                     batch_sharding(mesh, stacked=True)),
                       out_shardings=rep)

    jit_eval.fused = jit_eval_fused
    return jit_train, jit_eval


def make_shardmap_steps(cfg, tx, mesh: Mesh,
                        gru_seq_fn: Optional[Callable] = None,
                        ) -> Tuple[Callable, Callable]:
    """Explicit shard_map training step — the idiom the Pallas path needs.

    GSPMD cannot partition a Pallas custom call, so under jit-with-shardings
    the fused kernels run replicated on the global batch. This variant maps
    the whole step over the mesh instead: every device computes on its LOCAL
    batch shard with its LOCAL table shard, the embedding exchange uses the
    in-shard_map collective lookup, dense gradients are pmean'd over
    ("data", "model") (model copies are identical; averaging is exact) and
    row-sharded table gradients over "data" only. [B:5], SNIPPETS [S:36-49].

    Composes with sequence parallelism: on a (data, seq, model) mesh
    (``make_mesh(model_parallel, seq_parallel)``) the long scans run
    T-sharded over "seq" via ``seq_parallel.sp_gru_seq_fn`` and every pmean
    above additionally includes "seq" — exact for both the sequence-sharded
    and replicated parts of the graph (derivation in seq_parallel's module
    docstring; table cotangents from the SP'd layer-0 input arrive
    chunk-localized with the n_seq factor the seq-pmean removes).
    """
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from ..data.schema import Batch
    from ..models import apply_model, loss_fn
    from ..models.losses import l2_parts
    from .embedding_sharding import local_bucketed_lookup_fn, local_lookup_fn
    from .seq_parallel import SEQ_AXIS, resolve_sp_fn

    n_model = mesh.shape[MODEL_AXIS]
    n_seq = mesh.shape.get(SEQ_AXIS, 1)
    dense_axes = ((DATA_AXIS, SEQ_AXIS, MODEL_AXIS) if n_seq > 1
                  else (DATA_AXIS, MODEL_AXIS))
    table_axes = (DATA_AXIS, SEQ_AXIS) if n_seq > 1 else (DATA_AXIS,)
    # batch_over_model: the batch's example axis shards over ("data",
    # "model") instead of replicating over "model" — ids arrive shard-local
    # and the bucketed a2a exchange's ~2*f*N*d/S wire volume is realized
    # (no re-replicating all_gather; ARCHITECTURE §5). Gradient accounting:
    # dense grads pmean over dense_axes is now a true average over distinct
    # sub-batches (before, the model-axis copies were identical); table
    # grads arrive owner-resident with the lookup VJP's sum over the S
    # sources, so the lookup scales them by 1/n_model and the data-axis
    # pmean (table_axes, unchanged) completes the global mean. Direct-param
    # table gradients (l2) are NOT routed through the lookup and stay
    # unscaled — exactly once per shard, averaged over table_axes.
    # batch_over_model ships True (the measured-best TP layout, r5) but is
    # only meaningful with the bucketed exchange: psum needs model-
    # replicated ids, so an explicit embedding_mode="psum" selects the
    # replicated-batch layout and bom is ignored (the embedding mode is the
    # authoritative layout selector; same rule as the train driver).
    bom = (bool(getattr(cfg.mesh, "batch_over_model", False))
           and n_model > 1 and cfg.mesh.embedding_mode == "a2a")
    batch_axes = (DATA_AXIS, MODEL_AXIS) if bom else (DATA_AXIS,)
    if n_seq > 1:
        if cfg.model.use_pallas:
            raise ValueError(
                "seq axis in the mesh drives the scans via gru_seq_fn; the "
                "Pallas time-major path ignores it — set "
                "model.use_pallas=False (mesh.sp_inner='pallas' still runs "
                "the fused kernel inside the SP schedule)")
        if gru_seq_fn is not None:
            raise ValueError("gru_seq_fn is owned by the seq axis here")
        gru_seq_fn = resolve_sp_fn(cfg, n_seq)
    k = cfg.train.steps_per_dispatch
    # 0 = auto (driver-resolved); direct callers fall back to 2.0.
    cap_f = float(getattr(cfg.mesh, "a2a_capacity_factor", 2.0)) or 2.0
    if bom:
        lookup = local_bucketed_lookup_fn(n_model, capacity_factor=cap_f,
                                          table_grad_scale=1.0 / n_model)
    else:
        lookup = (local_lookup_fn(n_model, cfg.mesh.embedding_mode, cap_f)
                  if n_model > 1 else None)

    def spec_of(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
                for p in path]
        if "embedding" in keys and hasattr(leaf, "ndim") and leaf.ndim == 2:
            return P(MODEL_AXIS, None)
        return P()

    def param_specs(tree):
        return jax.tree_util.tree_map_with_path(spec_of, tree)

    def grad_mean(path, g):
        keys = [getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
                for p in path]
        if "embedding" in keys and hasattr(g, "ndim") and g.ndim == 2:
            return jax.lax.pmean(g, table_axes)
        return jax.lax.pmean(g, dense_axes)

    batch_spec = Batch(**{f.name: P(*(((None,) if k > 1 else ()) +
                                      (batch_axes,)))
                          for f in dataclasses.fields(Batch)})
    eval_batch_spec = Batch(**{f.name: P(batch_axes)  # never stacked
                               for f in dataclasses.fields(Batch)})

    def _step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch, lookup, gru_seq_fn)
        del metrics["logits"]
        if "a2a_overflow" in metrics:
            # psum'd over "model" inside the lookup; data(/seq) groups run
            # independent exchanges, so pmax -> 1.0 iff ANY group fell back
            # this step (binary counter; the later pmean is then identity)
            metrics["a2a_overflow"] = jax.lax.pmax(metrics["a2a_overflow"],
                                                   dense_axes)
        if cfg.loss.l2_weight > 0 and n_model > 1:
            # Each model-shard's l2 sees only its table rows, undercounting
            # the reported loss/l2 (gradients are unaffected:
            # d l2_local / d shard == the full objective's). Reconstruct the
            # exact global objective on the PRE-update params (what loss_fn
            # evaluated): psum the sharded table part over "model"; dense
            # params are replicated already.
            t_l2, d_l2 = l2_parts(params)
            l2_true = d_l2 + jax.lax.psum(t_l2, MODEL_AXIS)
            metrics["loss"] = metrics["loss"] + cfg.loss.l2_weight * (
                l2_true - metrics["l2"])
            metrics["l2"] = l2_true
        grads = jax.tree_util.tree_map_with_path(grad_mean, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = jax.tree.map(
            lambda m: jax.lax.pmean(m, dense_axes), metrics)
        return params, opt_state, metrics

    if k > 1:
        from ..train.train import fuse_steps

        _train = fuse_steps(_step)
    else:
        _train = _step

    def _eval(params, batch):
        logits, _ = apply_model(params, cfg, batch, lookup, gru_seq_fn)
        return logits

    def jit_train(params, opt_state):
        ps, os_ = param_specs(params), param_specs(opt_state)
        return jax.jit(jax.shard_map(
            _train, mesh=mesh, in_specs=(ps, os_, batch_spec),
            out_specs=(ps, os_, P()), check_vma=False))

    def jit_eval(params):
        return jax.jit(jax.shard_map(
            _eval, mesh=mesh, in_specs=(param_specs(params),
                                        eval_batch_spec),
            out_specs=P(batch_axes), check_vma=False))

    def jit_eval_fused(params):
        # k-chained eval (ARCHITECTURE §4 applied to the eval loop): the
        # lax.map over stacked batches runs INSIDE the shard_map, same
        # shape as fuse_steps' scan.
        from ..train.train import fuse_eval

        spec_k = Batch(**{f.name: P(None, batch_axes)
                          for f in dataclasses.fields(Batch)})
        return jax.jit(jax.shard_map(
            fuse_eval(_eval), mesh=mesh,
            in_specs=(param_specs(params), spec_k),
            out_specs=P(None, batch_axes), check_vma=False))

    jit_eval.fused = jit_eval_fused
    return jit_train, jit_eval

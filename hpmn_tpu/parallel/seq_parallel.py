"""Sequence parallelism: T-axis-sharded GRU scans with pipelined carry
handoff over ``ppermute``.

Reference equivalent: NONE — the reference is single-device and SURVEY.md
§2.3 lists SP as an *optional stretch* ("shard the T axis of layer-1's scan
across chips with a carry handoff"). This module implements that stretch as
real, tested capability rather than a documented N/A.

Design (TPU-first, not a translation):

- The mesh gains a ``"seq"`` axis: devices along it each own one contiguous
  time chunk of ``T_loc = T / n_seq`` steps.
- A GRU is sequential in T, so chunk i cannot start before chunk i-1's final
  carry exists. The classic fix is **microbatch pipelining** (the same
  schedule as GPipe, applied to the time axis of a scan instead of layer
  stages): split the batch into MB microbatches; at pipeline tick k, seq-
  shard i scans microbatch ``j = k - i`` over its local chunk, then hands
  the resulting carry to shard i+1 via ``lax.ppermute``. Shard 0's carry
  arrives as ppermute's fill value — zeros — which IS the correct h0 at the
  start of every sequence. After ``MB + n_seq - 1`` ticks every microbatch
  has traversed every chunk; bubble fraction = (n_seq-1)/(MB+n_seq-1).
- The whole schedule is a ``lax.scan`` over ticks with masked
  ``dynamic_update_index_in_dim`` buffer writes, so it is reverse-mode
  differentiable end to end: ``ppermute`` transposes to the inverse
  permutation (carry cotangents flow backward through the pipeline) and the
  tiled ``all_gather`` of outputs transposes to a reduce-scatter.

Gradient convention: under ``shard_map(..., check_vma=False)`` each seq
shard's backward seeds its OWN replica of the loss, so summed-over-shards
parameter cotangents carry an extra factor n_seq exactly where computation
was sequence-sharded and a factor 1 where it was replicated. A uniform
``pmean`` over the seq axis resolves both cases to the true gradient (the
varying SP-scan grads average to the exact total; the identical replicated
grads average to themselves). ``make_sp_steps`` applies that rule; equality
with the single-device step is asserted in tests/test_seq_parallel.py.

``sp_gru_sequence`` is a drop-in ``gru_seq_fn`` for ``apply_model`` /
``encode_hierarchical``: it takes the full (replicated) sequence, slices its
own chunk by ``axis_index``, and returns the full gathered output — so every
encoder (HPMN hierarchy, GRU4Rec, DIEN's two stages incl. the AUGRU
gate-scale) gets T-sharding with zero model changes. Layers whose T is not
divisible by n_seq (the short upper HPMN scans) fall back to replicated
local scans, which is both exact and the right call at their size.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.gru import GRUParams, gru_sequence
from .mesh import DATA_AXIS

SEQ_AXIS = "seq"


def make_sp_mesh(seq_parallel: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh (data, seq). seq_parallel must divide the device count.

    The seq axis is innermost so carry handoffs between adjacent time chunks
    ride neighboring devices (ICI next-door hops), like the model axis in
    ``make_mesh``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % seq_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"seq_parallel={seq_parallel}")
    arr = np.asarray(devices).reshape(n // seq_parallel, seq_parallel)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def sp_gru_sequence(params: GRUParams, x: jax.Array,
                    mask: Optional[jax.Array] = None,
                    gate_scale: Optional[jax.Array] = None, *,
                    n_shards: int, axis_name: str = SEQ_AXIS,
                    microbatches: int = 4, min_local_steps: int = 8,
                    inner: Optional[Callable] = None,
                    ) -> Tuple[jax.Array, jax.Array]:
    """T-sharded GRU scan for use INSIDE a shard_map over ``axis_name``.

    x [B, T, d_in] (replicated over the seq axis) -> (h_seq [B, T, d_m],
    h_T [B, d_m]), both replicated again (h_seq via tiled all_gather, h_T
    via psum of the last shard's pipeline-exit states). Falls back to the
    plain local scan when T doesn't split (or chunks would be tiny) —
    replicated compute, identical on every shard, still exact.

    inner: chunk-scan implementation with ``gru_sequence``'s signature
    (params, x, h0=, mask=, gate_scale=) -> (h_seq, h_T) — e.g. the fused
    Pallas kernel (``ops.pallas_gru.pallas_gru_sequence``, batch-major
    wrapper); defaults to the jnp scan.
    """
    if inner is None:
        inner = gru_sequence
    B, T, d_in = x.shape
    d_m = params.wh.shape[0]
    dtype = x.dtype
    T_loc = T // n_shards
    if n_shards == 1 or T % n_shards or T_loc < min_local_steps:
        return inner(params, x, mask=mask, gate_scale=gate_scale)
    if mask is None:
        mask = jnp.ones((B, T), dtype)
    if gate_scale is None:
        gate_scale = jnp.ones((B, T), dtype)
    MB = max(1, min(microbatches, B))
    while B % MB:  # static: largest divisor of B not above `microbatches`
        MB -= 1
    Bm = B // MB

    idx = jax.lax.axis_index(axis_name)
    start = idx * T_loc
    # [MB, Bm, T_loc, ...] microbatch-major views of this shard's time chunk.
    xm = jax.lax.dynamic_slice_in_dim(x, start, T_loc, 1) \
        .reshape(MB, Bm, T_loc, d_in)
    mm = jax.lax.dynamic_slice_in_dim(mask, start, T_loc, 1) \
        .reshape(MB, Bm, T_loc)
    am = jax.lax.dynamic_slice_in_dim(gate_scale, start, T_loc, 1) \
        .reshape(MB, Bm, T_loc)

    perm = [(i, i + 1) for i in range(n_shards - 1)]
    last = (idx == n_shards - 1).astype(dtype)

    def tick(carry, k):
        h_in, out_buf, hT_buf = carry
        j = jnp.clip(k - idx, 0, MB - 1)
        active = ((k >= idx) & (k - idx < MB)).astype(dtype)
        x_j = jax.lax.dynamic_index_in_dim(xm, j, 0, keepdims=False)
        m_j = jax.lax.dynamic_index_in_dim(mm, j, 0, keepdims=False)
        a_j = jax.lax.dynamic_index_in_dim(am, j, 0, keepdims=False)
        h_seq_j, h_out = inner(params, x_j, h0=h_in, mask=m_j,
                               gate_scale=a_j)
        # Masked buffer writes: bubble ticks compute on a clipped microbatch
        # and are discarded here (and their cotangents zeroed by the same
        # multiply on the way back).
        cur = jax.lax.dynamic_index_in_dim(out_buf, j, 0, keepdims=False)
        out_buf = jax.lax.dynamic_update_index_in_dim(
            out_buf, active * h_seq_j + (1.0 - active) * cur, j, 0)
        f = active * last  # pipeline exit: full-sequence final state
        curT = jax.lax.dynamic_index_in_dim(hT_buf, j, 0, keepdims=False)
        hT_buf = jax.lax.dynamic_update_index_in_dim(
            hT_buf, f * h_out + (1.0 - f) * curT, j, 0)
        # Hand the carry to the next chunk's owner. Shard 0 has no source
        # pair, so ppermute delivers zeros — the correct sequence-start h0.
        h_next = jax.lax.ppermute(active * h_out, axis_name, perm)
        return (h_next, out_buf, hT_buf), None

    init = (jnp.zeros((Bm, d_m), dtype),
            jnp.zeros((MB, Bm, T_loc, d_m), dtype),
            jnp.zeros((MB, Bm, d_m), dtype))
    (_, out_buf, hT_buf), _ = jax.lax.scan(
        tick, init, jnp.arange(MB + n_shards - 1))

    h_seq = jax.lax.all_gather(out_buf.reshape(B, T_loc, d_m), axis_name,
                               axis=1, tiled=True)  # time order = shard order
    h_T = jax.lax.psum(hT_buf, axis_name).reshape(B, d_m)  # last shard only
    return h_seq, h_T


def sp_gru_seq_fn(n_shards: int, microbatches: int = 4,
                  min_local_steps: int = 8,
                  inner: Optional[Callable] = None) -> Callable:
    """Drop-in ``gru_seq_fn`` (signature (params, x, mask, gate_scale=None))
    for ``apply_model`` inside a shard_map with a seq axis."""
    def fn(p, xs, m, a=None):
        return sp_gru_sequence(p, xs, mask=m, gate_scale=a,
                               n_shards=n_shards, microbatches=microbatches,
                               min_local_steps=min_local_steps, inner=inner)
    return fn


def resolve_sp_fn(cfg, n_shards: int) -> Callable:
    """Build the SP gru_seq_fn from the config — the ONE place
    ``mesh.sp_inner`` is interpreted (a typo must error on every path, not
    silently fall back to the jnp scan)."""
    sp_inner = getattr(cfg.mesh, "sp_inner", "jnp")
    if sp_inner == "pallas":
        # Fused kernel as the chunk scan (batch-major wrapper; the SP
        # schedule is batch-major throughout). Size sp_microbatches so
        # B/MB stays >= the kernel's batch tile on real chips
        # (ops/pallas_gru.py).
        from ..ops.pallas_gru import pallas_gru_sequence as inner
    elif sp_inner == "jnp":
        inner = None
    else:
        raise ValueError(f"unknown mesh.sp_inner {sp_inner!r}")
    return sp_gru_seq_fn(
        n_shards, microbatches=getattr(cfg.mesh, "sp_microbatches", 4),
        min_local_steps=getattr(cfg.mesh, "sp_min_local_steps", 8),
        inner=inner)


def make_sp_steps(cfg, tx, mesh: Mesh) -> Tuple[Callable, Callable]:
    """shard_map train/eval steps over a (data, seq) mesh.

    Batch sharded over "data", replicated over "seq"; every param replicated
    (SP composes with DP here — row-sharded tables would need a third mesh
    axis, out of v1 scope and enforced below). Gradients: uniform pmean over
    both axes (see module docstring for why that is exact on both the
    sequence-sharded and the replicated parts of the graph).
    """
    import dataclasses

    from ..data.schema import Batch
    from ..models import apply_model, loss_fn
    from ..train.train import fuse_steps

    if cfg.mesh.embedding_mode != "replicated":
        raise ValueError("make_sp_steps requires replicated embedding "
                         "tables (mesh axes are (data, seq))")
    if cfg.model.use_pallas:
        raise ValueError("make_sp_steps drives the scans via gru_seq_fn; "
                         "the Pallas time-major path ignores gru_seq_fn — "
                         "set model.use_pallas=False and pick the kernel "
                         "with mesh.sp_inner='pallas' instead")
    n_seq = mesh.shape[SEQ_AXIS]
    k = cfg.train.steps_per_dispatch
    sp_fn = resolve_sp_fn(cfg, n_seq)

    batch_spec = Batch(**{f.name: P(*(((None,) if k > 1 else ())
                                      + (DATA_AXIS,)))
                          for f in dataclasses.fields(Batch)})
    eval_batch_spec = Batch(**{f.name: P(DATA_AXIS)
                               for f in dataclasses.fields(Batch)})

    def _step(params, opt_state, batch):
        import optax

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch, None, sp_fn)
        del metrics["logits"]
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, (DATA_AXIS, SEQ_AXIS)), grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = jax.tree.map(
            lambda m: jax.lax.pmean(m, (DATA_AXIS, SEQ_AXIS)), metrics)
        return params, opt_state, metrics

    _train = fuse_steps(_step) if k > 1 else _step

    def _eval(params, batch):
        logits, _ = apply_model(params, cfg, batch, None, sp_fn)
        return logits

    def param_specs(tree):
        return jax.tree.map(lambda _: P(), tree)

    def jit_train(params, opt_state):
        ps, os_ = param_specs(params), param_specs(opt_state)
        return jax.jit(jax.shard_map(
            _train, mesh=mesh, in_specs=(ps, os_, batch_spec),
            out_specs=(ps, os_, P()), check_vma=False))

    def jit_eval(params):
        return jax.jit(jax.shard_map(
            _eval, mesh=mesh,
            in_specs=(param_specs(params), eval_batch_spec),
            out_specs=P(DATA_AXIS), check_vma=False))

    def jit_eval_fused(params):
        from ..train.train import fuse_eval

        spec_k = Batch(**{f.name: P(None, DATA_AXIS)
                          for f in dataclasses.fields(Batch)})
        return jax.jit(jax.shard_map(
            fuse_eval(_eval), mesh=mesh,
            in_specs=(param_specs(params), spec_k),
            out_specs=P(None, DATA_AXIS), check_vma=False))

    jit_eval.fused = jit_eval_fused
    return jit_train, jit_eval

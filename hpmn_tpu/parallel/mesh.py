"""Device mesh + sharding-spec helpers.

Reference equivalent: NONE — the reference is single-device (SURVEY.md §2.3);
this layer is new capability mandated by [B:5]: a single ``jax.Mesh`` over
the pod slice with axes ``("data", "model")`` — batch sharded over "data"
(DP), embedding tables row-sharded over "model" (the one model-parallel axis
this workload needs), dense params replicated — XLA collectives over ICI
within a slice / DCN across slices (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(model_parallel: int = 1, seq_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh (data, model), or (data, seq, model) when seq_parallel > 1 —
    the full DP x SP x TP composition. The model axis stays innermost
    (table-exchange collectives ride next-door ICI hops); the seq axis
    sits between so adjacent time chunks are near neighbors too.
    Data-parallel size is n_devices // (model_parallel * seq_parallel)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    per = model_parallel * seq_parallel
    if n % per:
        raise ValueError(f"{n} devices not divisible by model_parallel*"
                         f"seq_parallel={per}")
    if seq_parallel > 1:
        arr = np.asarray(devices).reshape(n // per, seq_parallel,
                                          model_parallel)
        return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, stacked: bool = False,
                   over: Sequence[str] = (DATA_AXIS,)) -> Any:
    """Every Batch field is sharded on its example axis. ``stacked=True``
    for [k, B, ...] multi-step batches (steps_per_dispatch > 1): the step
    axis k is unsharded, the example axis sharded. ``over``: mesh axes the
    example axis shards across — (data,) by default, ("data", "model") for
    batch_over_model steps."""
    from ..data.schema import Batch
    import dataclasses

    lead = (None,) if stacked else ()
    ax = tuple(over)

    def spec(ndim):
        return NamedSharding(mesh, P(*lead, ax, *([None] * (ndim - 1))))

    # All Batch fields are [B] or [B, T] (plus the k axis when stacked).
    return Batch(**{f.name: spec(2) if f.name.endswith("_seq") or
                    f.name == "seq_mask" else spec(1)
                    for f in dataclasses.fields(Batch)})


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Embedding tables row-sharded over MODEL_AXIS; everything else
    replicated (psum-DP handled by XLA from these shardings) [B:5]."""
    def assign(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
                for p in path]
        if "embedding" in keys and hasattr(leaf, "ndim") and leaf.ndim == 2:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, stacked: bool = False,
                over: Sequence[str] = (DATA_AXIS,)) -> Any:
    """Place a host-local Batch onto the mesh with example-axis sharding
    over the ``over`` mesh axes (see batch_sharding).

    Multi-host: each process holds a DIFFERENT local batch (the DataLoader
    shards by process), so the global array must be assembled from the
    per-process pieces — plain device_put would treat every host's distinct
    local batch as the same global array and silently drop (P-1)/P of the
    loaded rows. Global batch = per-host batch x process_count.
    """
    shardings = batch_sharding(mesh, stacked=stacked, over=over)
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, batch, shardings)
    return jax.tree.map(
        lambda a, s: jax.make_array_from_process_local_data(s, np.asarray(a)),
        batch, shardings)

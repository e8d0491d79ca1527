"""Train/eval driver.

Reference equivalent: the ``train.py`` scripts — build graph, Adam, epoch
loop, periodic val AUC/log-loss, early stopping, Saver (SURVEY.md §3.2).
TPU-native shape: one jitted ``train_step`` (value_and_grad + optax Adam),
datasets generated synthetically when no preprocessed real data is supplied
(SURVEY.md §7 M0), sharded execution delegated to ``hpmn_tpu.parallel``.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, NamedTuple

import jax
import optax

from ..configs import get_config
from ..data import (DataLoader, SPECS, make_ctr_dataset, make_periodic_dataset,
                    train_val_test_split)
from ..data.schema import Batch
from ..models import init_model, loss_fn
from .evaluate import evaluate as run_evaluate
from .checkpoint import CheckpointManager


def make_datasets(cfg):
    """Synthetic by default; real preprocessed arrays when cfg.data_dir is
    set (the loader accepts the real format when present, SURVEY.md §7).
    With real data the returned spec carries the REAL vocab sizes from the
    npz, so embedding tables are sized to the data, not to the synthetic
    stand-in spec."""
    import dataclasses

    spec = SPECS[cfg.dataset]
    if cfg.data_dir:
        from ..data import preprocess
        arrays = preprocess.load_preprocessed(cfg.data_dir, spec)
        spec = dataclasses.replace(spec, n_items=int(arrays.pop("_n_items")),
                                   n_cats=int(arrays.pop("_n_cats")),
                                   n_users=int(arrays.pop("_n_users")))
    else:
        gen = (make_periodic_dataset if cfg.synthetic_task == "periodic"
               else make_ctr_dataset)
        arrays = gen(spec, cfg.n_examples, seed=cfg.seed)
    return (*train_val_test_split(arrays), spec)


class EmaState(NamedTuple):
    """Optimizer-state wrapper carrying a Polyak/EMA shadow of the params."""
    inner: optax.OptState
    ema: dict


def with_ema(tx: optax.GradientTransformation,
             decay: float) -> optax.GradientTransformation:
    """Wrap ``tx`` so its state additionally tracks an exponential moving
    average of the POST-update params: ``ema <- d*ema + (1-d)*params'``.

    Evaluating/serving with the averaged params is standard production-CTR
    practice (smooths the last-minibatch noise out of the decision surface).
    The EMA initializes AT the initial params, so no debias term is needed.
    Living inside the optimizer state, it flows through every execution
    path unchanged (single-device, GSPMD, shard_map, SP) and through
    checkpoints; the sharding rules (path contains "embedding" and ndim==2
    -> row-sharded) see the same param-tree paths under ``.ema``."""

    def init(params):
        return EmaState(tx.init(params), params)

    def update(updates, state, params=None, **extra):
        updates, inner = tx.update(updates, state.inner, params, **extra)
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           state.ema, new_p)
        return updates, EmaState(inner, ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """The EMA param tree inside a (possibly wrapped) opt state, or None.

    Walks tuple-shaped wrappers (optax chains, MultiSteps, and NamedTuple
    states are all tuples) for the :class:`EmaState` that ``with_ema``
    installed."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):
        for child in opt_state:
            found = get_ema_params(child)
            if found is not None:
                return found
    return None


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam (the reference's optimizer, SURVEY.md §2.1) plus config-gated
    production options: lr schedules (linear warmup + cosine/exponential
    decay), global-norm gradient clipping, decoupled weight decay (adamw —
    distinct from loss.l2_weight, which penalizes the loss), and k-step
    gradient accumulation (optax.MultiSteps; each driver step feeds one
    micro-batch, params move every k-th). Defaults leave the transform as
    plain optax.adam so existing checkpoints' opt-state trees keep their
    exact structure."""
    t = cfg.train
    warmup = getattr(t, "warmup_steps", 0)
    sched = getattr(t, "lr_schedule", "constant")
    clip = getattr(t, "grad_clip_norm", 0.0)
    wd = getattr(t, "weight_decay", 0.0)
    accum = getattr(t, "grad_accum", 1)

    lr = t.lr
    if sched != "constant" or warmup > 0:
        horizon = getattr(t, "decay_steps", 0) or t.max_steps
        end = lr * getattr(t, "lr_min_ratio", 0.0)
        if sched == "cosine":
            body = optax.cosine_decay_schedule(lr, max(1, horizon - warmup),
                                               alpha=end / lr if lr else 0.0)
        elif sched == "exponential":
            body = optax.exponential_decay(
                lr, max(1, horizon - warmup),
                decay_rate=max(end / lr, 1e-8) if lr else 1.0)
        elif sched == "constant":
            body = optax.constant_schedule(lr)
        else:
            raise ValueError(f"unknown lr_schedule {sched!r}")
        if warmup > 0:
            lr = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), body], [warmup])
        else:
            lr = body

    base = (optax.adamw(lr, weight_decay=wd) if wd > 0 else optax.adam(lr))
    if clip > 0:
        base = optax.chain(optax.clip_by_global_norm(clip), base)
    ema_decay = getattr(t, "ema_decay", 0.0)
    if ema_decay > 0:
        # Inside MultiSteps: the EMA must only advance when params actually
        # move (MultiSteps skips the inner update on accumulation steps).
        base = with_ema(base, ema_decay)
    if accum > 1:
        base = optax.MultiSteps(base, every_k_schedule=accum)
    return base


def prefetch_to_device(iterator, place, size: int = 2):
    """Keep `size` batches in flight on device: jax transfers are async, so
    device_put-ing ahead overlaps host->device copies (8MB+/step on XLong)
    with the previous step's compute."""
    import collections

    queue = collections.deque()
    for batch in iterator:
        queue.append(place(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _raw_train_step(cfg, tx, lookup_fn=None, gru_seq_fn=None) -> Callable:
    def train_step(params, opt_state, batch: Batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch, lookup_fn, gru_seq_fn)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        del metrics["logits"]
        return params, opt_state, metrics

    return train_step


def make_train_step(cfg, tx, lookup_fn=None, gru_seq_fn=None) -> Callable:
    return jax.jit(_raw_train_step(cfg, tx, lookup_fn, gru_seq_fn))


def fuse_steps(step_fn: Callable) -> Callable:
    """Fuse a ``(params, opt_state, batch) -> (params, opt_state, metrics)``
    step into a stacked-batch multistep: ``lax.scan`` over [k, B, ...]
    batches, one device dispatch for all k steps. Identical math to k
    sequential calls (tested bitwise per execution path); wins the
    per-dispatch host/runtime overhead (ARCHITECTURE §4). Returns the LAST
    step's metrics, matching the single-step driver's log lines — except
    ``a2a_overflow``, which is SUMMED over the k steps (it is an event
    counter: "how many steps of this dispatch hit the exchange fallback";
    a last-step sample would hide k-1 of them). Shared by the
    single-device, GSPMD, and shard_map step factories."""

    def multistep(params, opt_state, batches):
        def body(carry, batch):
            p, o, m = step_fn(*carry, batch)
            return (p, o), m

        (params, opt_state), ms = jax.lax.scan(body, (params, opt_state),
                                               batches)
        out = jax.tree.map(lambda x: x[-1], ms)
        if "a2a_overflow" in ms:
            out["a2a_overflow"] = ms["a2a_overflow"].sum()
        return params, opt_state, out

    return multistep


def make_multistep_train(cfg, tx, lookup_fn=None, gru_seq_fn=None) -> Callable:
    """jit(fuse_steps(train step)) — see :func:`fuse_steps`."""
    return jax.jit(fuse_steps(_raw_train_step(cfg, tx, lookup_fn,
                                              gru_seq_fn)))


def chunk_batches(iterator, k: int):
    """Stack every k consecutive host Batches into one [k, B, ...] Batch
    (numpy, before device transfer) for :func:`make_multistep_train`."""
    import numpy as np

    buf = []
    for b in iterator:
        buf.append(b)
        if len(buf) == k:
            yield jax.tree.map(lambda *xs: np.stack(xs), *buf)
            buf = []


def make_eval_step(cfg, lookup_fn=None, gru_seq_fn=None) -> Callable:
    from ..models import apply_model

    @jax.jit
    def eval_step(params, batch: Batch):
        logits, _ = apply_model(params, cfg, batch, lookup_fn, gru_seq_fn)
        return logits

    return eval_step


def _run_ladder(time_fn: Callable, cap: int, tol: float, flat_stop: int):
    """Geometric-k ladder with flat-stop early exit (shared by the train
    and eval dispatch probes — ONE implementation so the two can't drift):
    times k = 1, 2, 4, ... <= cap via ``time_fn(k) -> seconds/step`` and
    stops once ``flat_stop`` consecutive rungs fail to beat the best prior
    time by more than ``tol`` (past the knee the curve is flat and each
    rung costs a full compile). Returns (ladder {k: t}, flat count).

    Multi-host: every rung's program is a GLOBAL collective, so the
    continue/stop decision must be identical on every host — each rung's
    measured time is broadcast from process 0 before the flat-stop test
    (hosts deciding from their own clocks could exit at different rungs
    and deadlock in a dispatch the others never join; same hazard class
    as the eval-epoch cap)."""
    pcnt = jax.process_count()
    if pcnt > 1:
        import numpy as np

        from jax.experimental import multihost_utils

        bcast = lambda t: float(multihost_utils.broadcast_one_to_all(
            np.asarray(t, np.float64)))
    else:
        bcast = lambda t: t
    ladder, k, flat = {}, 1, 0
    while k <= cap:
        t = ladder[k] = bcast(time_fn(k))
        prior = [ladder[kk] for kk in ladder if kk < k]
        if prior and t > min(prior) * (1 - tol):
            # this rung did not beat the prior best by > tol
            flat += 1
            if flat >= flat_stop:
                break
        else:
            flat = 0
        k *= 2
    return ladder, flat


def _ladder_choice(ladder: Dict, tol: float) -> int:
    """Smallest k within ``tol`` of the ladder's best time; on multi-host
    the choice is broadcast from process 0 so all hosts build identical
    programs even if clocks disagreed."""
    import numpy as np

    best_t = min(ladder.values())
    choice = min(kk for kk, t in ladder.items() if t <= best_t * (1 + tol))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        choice = int(multihost_utils.broadcast_one_to_all(
            np.asarray(choice, np.int32)))
    return choice


def probe_steps_per_dispatch(cfg, build_train, params, opt_state, spec,
                             log: Callable[[str], None] = print,
                             tol: float = 0.03, repeats: int = 2,
                             n_stacks: int = 3, place=None,
                             flat_stop: int = 2) -> int:
    """Derive the dispatch-chaining knee for THE ATTACHED LINK at startup
    (``train.steps_per_dispatch = 0``). The shipped r3 knees encoded this
    tunnel's 3-5 ms/dispatch latency; a production-attached chip pays ~10x
    less and the knee moves (BASELINE.md) — so when the config ships
    "auto", time the geometric ladder k = 1, 2, 4, ... (capped by 64,
    eval_every and max_steps — dispatch granularity bounds eval/ckpt
    cadence) and pick the SMALLEST k within ``tol`` of the best per-step
    time. The ladder stops early once ``flat_stop`` consecutive rungs fail
    to improve the best time by more than ``tol`` — past the knee the curve
    is flat and each extra rung costs a full train-step compile (20-40 s on
    TPU; the probe's dominant cost, BASELINE.md autotune section). Each
    rung times repeats x n_stacks fused dispatches on distinct synthetic
    stacks (the relay dedups identical dispatches) ending in a scalar pull
    (block_until_ready lies over the tunnel); params/opt flow through
    copies so donation cannot consume the caller's buffers, and every
    measurement is discarded. Multi-host: every host runs the identical
    deterministic ladder; the choice is additionally broadcast from
    process 0 so all hosts build identical programs.

    ``place(batch, stacked) -> placed batch`` must be the SAME placement
    the training loop uses (``shard_batch`` on mesh paths): the probe pool
    is built as host numpy batches and placed per dispatch, because a
    locally-committed device array cannot be fed to a multi-host jitted
    step (every process must contribute its addressable shards). Default:
    ``jax.device_put`` per leaf (the single-device path).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..data.schema import can_compact, compact_batch, dummy_batch

    B, T = cfg.train.batch_size, spec.seq_len
    # Probe in the same wire regime the loop will use: compact batches
    # change the transfer bytes the knee amortizes.
    cb = (compact_batch
          if bool(getattr(cfg.train, "compact_transfer", False))
          and can_compact(spec.n_items, spec.n_cats) else (lambda b: b))
    # Host numpy pool (placed per dispatch — see docstring).
    pool = [cb(dummy_batch(B, T, spec.n_items, spec.n_cats, seed=7000 + i))
            for i in range(n_stacks + 1)]
    if place is None:
        place = lambda b, stacked: jax.tree.map(jax.device_put, b)
    cap = max(1, min(64, cfg.train.eval_every, cfg.train.max_steps))

    # Peak-HBM bound for the placed probe pool (the k=64 rung would
    # otherwise hold (n_stacks+1) x 64 batches at once — ~1.2 GB at xlong
    # shapes, a transient startup OOM risk the steady-state loop, which
    # keeps ONE stack in flight, never pays). Fewer distinct stacks cannot
    # trip the relay's dispatch dedup here: params/opt advance every
    # dispatch, so requests differ even on a reused stack; extra repeats
    # keep the dispatch count per rung constant.
    budget = 1 << 28  # 256 MB of placed batch stacks per rung

    def time_k(k):
        step = build_train(k)
        # Stacks are placed BEFORE the timed region: the training loop
        # overlaps host->device transfers with compute (prefetch_to_device),
        # but a probe-loop device_put is synchronous over relayed links —
        # timing it would charge each dispatch k x the wire bytes and
        # invert the ladder (k=1 "wins" on any transfer-bound link).
        if k > 1:
            mk = lambda i: jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[pool[(i + j) % len(pool)] for j in range(k)])
        else:
            mk = lambda i: pool[i % len(pool)]
        stack_bytes = k * sum(np.asarray(x).nbytes
                              for x in jax.tree.leaves(pool[0]))
        n_use = max(1, min(n_stacks, budget // max(1, stack_bytes)))
        reps = repeats * -(-n_stacks // n_use)
        p, o = jax.tree.map(jnp.copy, (params, opt_state))
        warm = place(mk(0), k > 1)
        p, o, m = step(p, o, warm)  # compile + warm
        float(m["loss"])
        del warm  # freed before the timed stacks are placed
        stacks = [place(mk(1 + i), k > 1) for i in range(n_use)]
        t0 = time.time()
        for r in range(reps):
            for i in range(n_use):
                p, o, m = step(p, o, stacks[i])
        float(m["loss"])
        return (time.time() - t0) / (reps * n_use * k)

    # build_train(k) mutates cfg.train.steps_per_dispatch as a side effect;
    # restore it even when a rung raises mid-ladder, so the caller never
    # sees a half-probed config (ADVICE r4).
    saved_k = cfg.train.steps_per_dispatch
    try:
        ladder, flat = _run_ladder(time_k, cap, tol, flat_stop)
    finally:
        cfg.train.steps_per_dispatch = saved_k
    choice = _ladder_choice(ladder, tol)
    capped = (flat < flat_stop and max(ladder) < 64
              and max(ladder) * 2 > cap)
    log("autotuned steps_per_dispatch=" + str(choice) + " (ms/step: "
        + ", ".join(f"k={kk}:{t * 1e3:.2f}" for kk, t in ladder.items())
        + f"; cap {cap}"
        + ("; ladder CUT BY eval_every/max_steps, not timing" if capped
           and choice == max(ladder) else "")
        + (f"; stopped flat after k={max(ladder)}" if flat >= flat_stop
           else "") + ")")
    return choice


def probe_eval_steps_per_dispatch(cfg, eval_step, fused_eval, params, spec,
                                  n_batches_cap: int,
                                  log: Callable[[str], None] = print,
                                  tol: float = 0.05, n_groups: int = 2,
                                  flat_stop: int = 2) -> int:
    """Eval-loop twin of :func:`probe_steps_per_dispatch` (VERDICT r4 next
    #1b: the r4 configs shipped eval knees measured on ONE tunnel; a
    production link moves them). Times the geometric ke ladder through the
    driver's own ``eval_step``/``fused_eval`` closures — host batches in,
    device pull per dispatch — which is exactly the production evaluate
    loop's cost shape (eval has no prefetch; transfer rides the dispatch).

    The ladder is capped by the eval epoch's per-host batch count: fusing
    more batches than an epoch holds only pads the trailing group with
    discarded work (the r4 xlong measurement: k=16 REGRESSED on a 16-batch
    epoch). Multi-host: the cap must be HOST-INVARIANT
    (``DataLoader.epoch_batches``, not a local count — hosts on different
    rungs deadlock in the global fused dispatch); every host runs the
    identical ladder and the choice is broadcast from process 0. Output
    pulls go through the production row extraction
    (``evaluate._local_rows*``) — the raw array may span non-addressable
    devices under the sharded eval steps."""
    import numpy as np

    from ..data.schema import dummy_batch
    from .evaluate import _local_rows, _local_rows_stacked

    B, T = cfg.eval_batch_size, spec.seq_len
    # Every timed dispatch must be DISTINCT (params never change between
    # eval calls, unlike the train probe's) or the relay's dispatch dedup
    # undertimes a rung: warmup takes pool[0], k=1 times pool[1..2g].
    pool = [dummy_batch(B, T, spec.n_items, spec.n_cats, seed=8000 + i)
            for i in range(2 * n_groups + 2)]
    cap = max(1, min(64, n_batches_cap))

    def time_ke(k):
        if k == 1:
            _local_rows(eval_step(params, pool[0]), B)  # warm
            t0 = time.time()
            for i in range(2 * n_groups):
                _local_rows(eval_step(params, pool[1 + i]), B)
            return (time.time() - t0) / (2 * n_groups)
        mk = lambda i: jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[pool[(i + j) % len(pool)] for j in range(k)])
        stacks = [mk(i) for i in range(n_groups + 1)]
        _local_rows_stacked(fused_eval(params, stacks[0]), B)  # warm
        t0 = time.time()
        for i in range(n_groups):
            _local_rows_stacked(fused_eval(params, stacks[1 + i]), B)
        return (time.time() - t0) / (n_groups * k)

    ladder, _ = _run_ladder(time_ke, cap, tol, flat_stop)
    choice = _ladder_choice(ladder, tol)
    log("autotuned eval_steps_per_dispatch=" + str(choice) + " (ms/batch: "
        + ", ".join(f"k={kk}:{t * 1e3:.2f}" for kk, t in ladder.items())
        + f"; cap {cap})")
    return choice


def resolve_capacity_factor(cfg, arrays, spec, n_model: int, bom: bool,
                            log: Callable[[str], None] = print) -> None:
    """``mesh.a2a_capacity_factor == 0`` (the shipped default) = AUTO:
    derive it from the ACTUAL id distribution at startup
    (``parallel.embedding_sharding.derive_capacity_factor``) instead of a
    fixed constant — frequency-sorted real vocabs skew per-owner load far
    beyond the uniform-synthetic 2.0 (VERDICT r4 weak #2). Samples item and
    category ids from the training arrays at the per-shard query sizes the
    production step will issue — INCLUDING the eval step's
    (``cfg.eval_batch_size`` is typically smaller than the train batch,
    and relative per-owner imbalance grows as the slice shrinks, so the
    eval sizes often bind; deriving over both keeps the smaller eval
    exchanges off the chronic-fallback path even though the runtime
    ``a2a_overflow`` counter only watches train dispatches — both draw
    from the same id distribution, so post-derivation drift shows up
    there). Mutates cfg in place; no-op for explicit factors or non-a2a
    modes."""
    if cfg.mesh.embedding_mode != "a2a" or \
            float(cfg.mesh.a2a_capacity_factor) != 0.0:
        return
    import numpy as np

    from ..parallel.embedding_sharding import (derive_capacity_factor,
                                               pad_vocab)

    n_dev = max(1, len(jax.devices()))
    n_data = max(1, n_dev // (n_model * max(1, cfg.mesh.seq_parallel)))
    T = spec.seq_len
    sizes = []
    for B in (cfg.train.batch_size, cfg.eval_batch_size):
        B_glob = B * jax.process_count()
        if bom:  # ids arrive shard-local: per-shard N = examples/shard x T
            ex = max(1, B_glob // (n_data * n_model))
            sizes += [ex, ex * T]
        else:  # replicated-ids contract: each shard takes a 1/S chunk
            ex = max(1, B_glob // n_data)
            sizes += [-(-ex // n_model), -(-ex * T // n_model)]
    sizes = sorted(set(sizes))
    # Representative samples (<= ~2k example rows keeps memmaps cheap).
    rows = min(2000, len(arrays["target_item"]))
    samples = []
    for seq_f, tgt_f, n_vocab in (("item_seq", "target_item", spec.n_items),
                                  ("cat_seq", "target_cat", spec.n_cats)):
        ids = np.concatenate([
            np.asarray(arrays[seq_f][:rows]).reshape(-1).astype(np.int64),
            np.asarray(arrays[tgt_f][:rows]).astype(np.int64)])
        samples.append((ids, pad_vocab(int(n_vocab), n_model) // n_model))
    cfg.mesh.a2a_capacity_factor = derive_capacity_factor(
        samples, n_model, sizes)
    log(f"derived a2a_capacity_factor="
        f"{cfg.mesh.a2a_capacity_factor:.2f} from the id distribution "
        f"(slice sizes {sizes})")


def fuse_eval(eval_fn: Callable) -> Callable:
    """Chain k eval batches into ONE dispatch: ``lax.map`` over a stacked
    [k, B, ...] Batch -> [k, B] logits (no carry — eval is a trivial scan).
    The train path's per-dispatch-overhead win (ARCHITECTURE §4) applied to
    eval; identical logits to k separate calls."""

    def fused(params, batches):
        return jax.lax.map(lambda b: eval_fn(params, b), batches)

    return fused


def make_fused_eval(cfg, lookup_fn=None, gru_seq_fn=None) -> Callable:
    from ..models import apply_model

    def eval_step(params, batch: Batch):
        logits, _ = apply_model(params, cfg, batch, lookup_fn, gru_seq_fn)
        return logits

    return jax.jit(fuse_eval(eval_step))


def train(cfg, lookup_fn=None, gru_seq_fn=None,
          log: Callable[[str], None] = print) -> Dict:
    """Run one config end-to-end. Returns final test metrics + history."""
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if getattr(cfg.train, "compilation_cache_dir", ""):
        # Persistent compiled-program cache: a restarted/preempted run (or
        # the next run of the same config) skips the 20-40s TPU compiles —
        # including the autotune probes' per-rung compiles (their dominant
        # cost). Ships on by default (r5).
        import os as _os

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser(cfg.train.compilation_cache_dir))
        # Cache every compile: the default min-compile-time threshold (1s)
        # skips exactly the small programs the CPU test/dev loops recompile
        # most, and TPU programs all clear it anyway.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    train_arrays, val_arrays, test_arrays, spec = make_datasets(cfg)
    pidx, pcnt = jax.process_index(), jax.process_count()
    # Pre-compact the in-RAM dataset arrays ONCE when the wire format is
    # on (train.compact_transfer + vocab fits uint16): every batch gather
    # then copies half the bytes (the native batcher is byte-based) and
    # the per-batch compact_batch becomes an idempotent no-op. Memory-
    # mapped real-data arrays stay as-is (materializing them would defeat
    # the mmap); those compact per batch instead.
    from ..data.schema import _ID_FIELDS as _IDF, can_compact as _cc

    if bool(getattr(cfg.train, "compact_transfer", False)) \
            and _cc(spec.n_items, spec.n_cats):
        import numpy as _np

        for _split in (train_arrays, val_arrays, test_arrays):
            for _f in _IDF:
                _a = _split.get(_f)
                if (isinstance(_a, _np.ndarray)
                        and not isinstance(_a, _np.memmap)
                        and _a.dtype == _np.int32):
                    _split[_f] = _a.astype(_np.uint16)
            _m = _split.get("seq_mask")
            if (isinstance(_m, _np.ndarray)
                    and not isinstance(_m, _np.memmap)
                    and _m.dtype == _np.float32):
                _split["seq_mask"] = _m.astype(_np.uint8)

    train_loader = DataLoader(train_arrays, cfg.train.batch_size, shuffle=True,
                              seed=cfg.seed, process_index=pidx,
                              process_count=pcnt)
    # Eval is sharded per host too; evaluate() merges across hosts
    # (SURVEY.md §5.5).
    val_loader = DataLoader(val_arrays, cfg.eval_batch_size, shuffle=False,
                            process_index=pidx, process_count=pcnt)
    test_loader = DataLoader(test_arrays, cfg.eval_batch_size, shuffle=False,
                             process_index=pidx, process_count=pcnt)

    tx = make_optimizer(cfg)
    ema_on = getattr(cfg.train, "ema_decay", 0.0) > 0

    def params_for_eval(params, opt_state):
        """Evaluate with the Polyak-averaged params when EMA is enabled
        (the weights that would be served); raw params otherwise."""
        if not ema_on:
            return params
        ema = get_ema_params(opt_state)
        return ema if ema is not None else params

    # Eval dispatch chaining (ARCHITECTURE §4 applied to the eval loop):
    # ke batches per eval dispatch, single- and multi-host (the stacked
    # shard-local row extraction, evaluate._local_rows_stacked). 0 = AUTO:
    # probed after the steps are built (see the autotune block below).
    ke = int(getattr(cfg, "eval_steps_per_dispatch", 1))
    fused_eval = None
    # Wire-compact every host->device batch when the vocab allows (exact;
    # schema.compact_batch — expanded on device inside apply_model).
    from ..data.schema import can_compact, compact_batch
    compact_on = bool(getattr(cfg.train, "compact_transfer", False)) \
        and can_compact(spec.n_items, spec.n_cats)
    cb = compact_batch if compact_on else (lambda b: b)
    use_mesh = (cfg.mesh.model_parallel > 1 or len(jax.devices()) > 1) \
        and cfg.mesh.enable and lookup_fn is None
    if use_mesh and cfg.mesh.seq_parallel > 1 and \
            cfg.mesh.model_parallel > 1:
        # Full DP x SP x TP composition: (data, seq, model) mesh through
        # the shard_map step (T-sharded scans + row-sharded tables).
        from ..parallel import (init_sharded_model, make_mesh,
                                make_shardmap_steps, param_shardings,
                                shard_batch)

        mesh = make_mesh(cfg.mesh.model_parallel, cfg.mesh.seq_parallel)
        # batch_over_model ships True (the measured-best TP layout) but an
        # EXPLICIT embedding_mode="psum" wins: psum needs model-replicated
        # ids, so the user's choice of exchange implies the layout.
        bom = bool(getattr(cfg.mesh, "batch_over_model", False)) \
            and cfg.mesh.embedding_mode in ("replicated", "a2a")
        if cfg.mesh.embedding_mode == "replicated":
            cfg.mesh.embedding_mode = "a2a" if bom else "psum"
        resolve_capacity_factor(cfg, train_arrays, spec,
                                cfg.mesh.model_parallel, bom, log)
        over = ("data", "model") if bom else ("data",)
        params = init_sharded_model(jax.random.key(cfg.seed), cfg,
                                    spec.n_items, spec.n_cats, mesh,
                                    n_users=spec.n_users)
        opt_shardings = param_shardings(mesh, jax.eval_shape(tx.init, params))
        opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
        jit_train, jit_eval = make_shardmap_steps(cfg, tx, mesh)

        def build_train(k2):
            cfg.train.steps_per_dispatch = k2
            return make_shardmap_steps(cfg, tx, mesh)[0](params, opt_state)

        _eval_step = jit_eval(params)
        eval_step = lambda p, b: _eval_step(p, shard_batch(mesh, cb(b),
                                                           over=over))
        def make_fused(jit_eval=jit_eval, mesh=mesh, over=over):
            _fe = jit_eval.fused(params)
            return lambda p, bs: _fe(
                p, shard_batch(mesh, cb(bs), stacked=True, over=over))
        place = lambda b: shard_batch(
            mesh, cb(b), stacked=cfg.train.steps_per_dispatch > 1, over=over)
        probe_place = lambda b, stacked: shard_batch(mesh, b, stacked=stacked,
                                                     over=over)
        log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
            f"embedding_mode={cfg.mesh.embedding_mode}, "
            f"batch_over_model={bom}, "
            f"sp_microbatches={cfg.mesh.sp_microbatches}")
    elif use_mesh and cfg.mesh.seq_parallel > 1:
        # Sequence-parallel execution: T axis of the long scans sharded over
        # a (data, seq) mesh with pipelined carry handoff
        # (parallel/seq_parallel.py; SURVEY.md §2.3 SP row).
        from ..parallel import replicated, shard_batch
        from ..parallel.seq_parallel import make_sp_mesh, make_sp_steps

        mesh = make_sp_mesh(cfg.mesh.seq_parallel)
        params = init_model(jax.random.key(cfg.seed), cfg, spec.n_items,
                            spec.n_cats, n_users=spec.n_users)
        rep = replicated(mesh)
        params = jax.device_put(params, jax.tree.map(lambda _: rep, params))
        opt_state = jax.device_put(
            tx.init(params), jax.tree.map(lambda _: rep,
                                          jax.eval_shape(tx.init, params)))
        jit_train, jit_eval = make_sp_steps(cfg, tx, mesh)

        def build_train(k2):
            cfg.train.steps_per_dispatch = k2
            return make_sp_steps(cfg, tx, mesh)[0](params, opt_state)

        _eval_step = jit_eval(params)
        eval_step = lambda p, b: _eval_step(p, shard_batch(mesh, cb(b)))
        def make_fused(jit_eval=jit_eval, mesh=mesh):
            _fe = jit_eval.fused(params)
            return lambda p, bs: _fe(p, shard_batch(mesh, cb(bs),
                                                    stacked=True))
        place = lambda b: shard_batch(
            mesh, cb(b), stacked=cfg.train.steps_per_dispatch > 1)
        probe_place = lambda b, stacked: shard_batch(mesh, b, stacked=stacked)
        log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
            f"seq_parallel={cfg.mesh.seq_parallel} "
            f"(microbatches={cfg.mesh.sp_microbatches})")
    elif use_mesh:
        # Sharded execution over the device mesh (SURVEY.md §2.3, [B:5]):
        # DP over "data", row-sharded tables over "model".
        from ..parallel import (init_sharded_model, make_mesh,
                                make_sharded_steps, make_shardmap_steps,
                                param_shardings, shard_batch)

        mesh = make_mesh(cfg.mesh.model_parallel)
        # Same rule as the DPxSPxTP branch: bom ships True but an explicit
        # "psum" exchange disables it (psum needs model-replicated ids).
        bom = bool(getattr(cfg.mesh, "batch_over_model", False)) and \
            cfg.mesh.model_parallel > 1 and \
            cfg.mesh.embedding_mode in ("replicated", "a2a")
        if cfg.mesh.model_parallel > 1 and \
                cfg.mesh.embedding_mode == "replicated":
            cfg.mesh.embedding_mode = "a2a" if bom else "psum"
        resolve_capacity_factor(cfg, train_arrays, spec,
                                cfg.mesh.model_parallel, bom, log)
        over = ("data", "model") if bom else ("data",)
        params = init_sharded_model(jax.random.key(cfg.seed), cfg,
                                    spec.n_items, spec.n_cats, mesh,
                                    n_users=spec.n_users)
        # Derive opt-state shardings from abstract shapes (no second
        # materialization of Adam's mu/nu).
        opt_shardings = param_shardings(mesh, jax.eval_shape(tx.init, params))
        opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
        # GSPMD cannot partition Pallas custom calls — use the explicit
        # shard_map step so the kernels run on local shards. batch_over_model
        # is a shard_map-step feature too (GSPMD would re-replicate).
        make_steps = (make_shardmap_steps if cfg.model.use_pallas or bom
                      else make_sharded_steps)
        jit_train, jit_eval = make_steps(cfg, tx, mesh, gru_seq_fn=gru_seq_fn)

        def build_train(k2):
            cfg.train.steps_per_dispatch = k2
            return make_steps(cfg, tx, mesh,
                              gru_seq_fn=gru_seq_fn)[0](params, opt_state)

        _eval_step = jit_eval(params)
        eval_step = lambda p, b: _eval_step(p, shard_batch(mesh, cb(b),
                                                           over=over))
        def make_fused(jit_eval=jit_eval, mesh=mesh, over=over):
            _fe = jit_eval.fused(params)
            return lambda p, bs: _fe(
                p, shard_batch(mesh, cb(bs), stacked=True, over=over))
        place = lambda b: shard_batch(
            mesh, cb(b), stacked=cfg.train.steps_per_dispatch > 1, over=over)
        probe_place = lambda b, stacked: shard_batch(mesh, b, stacked=stacked,
                                                     over=over)
        log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
            f"embedding_mode={cfg.mesh.embedding_mode}, "
            f"batch_over_model={bom}")
    else:
        params = init_model(jax.random.key(cfg.seed), cfg, spec.n_items,
                            spec.n_cats, n_users=spec.n_users)
        opt_state = tx.init(params)

        def build_train(k2):
            cfg.train.steps_per_dispatch = k2
            if k2 > 1:
                return make_multistep_train(cfg, tx, lookup_fn, gru_seq_fn)
            return make_train_step(cfg, tx, lookup_fn, gru_seq_fn)

        _es0 = make_eval_step(cfg, lookup_fn, gru_seq_fn)
        eval_step = lambda p, b: _es0(p, cb(b))
        def make_fused():
            _fe0 = make_fused_eval(cfg, lookup_fn, gru_seq_fn)
            return lambda p, bs: _fe0(p, cb(bs))
        place = lambda b: jax.tree.map(jax.device_put, cb(b))
        probe_place = None

    # steps_per_dispatch == 0 / eval_steps_per_dispatch == 0 ("auto"):
    # probe the dispatch-chaining knees for the attached link, then build
    # at the chosen k/ke. Explicit values skip the probes entirely (the
    # override path). With a ckpt_dir, both choices persist in ONE sidecar
    # so a PREEMPTED/RESUMED run reuses them instead of re-probing —
    # re-probing costs minutes of compiles and a timing-dependent k would
    # change the step grouping (eval cadence, log boundaries) of the
    # replayed trajectory.
    import json
    import os as _os

    side = (_os.path.join(cfg.train.ckpt_dir, "autotune.json")
            if cfg.train.ckpt_dir else "")
    sidecar, side_dirty = {}, False
    if side and _os.path.exists(side):
        with open(side) as f:
            sidecar = json.load(f)
    if cfg.train.steps_per_dispatch == 0:
        if "steps_per_dispatch" in sidecar:
            cfg.train.steps_per_dispatch = int(
                sidecar["steps_per_dispatch"])
            log(f"reusing autotuned steps_per_dispatch="
                f"{cfg.train.steps_per_dispatch} from {side}")
        else:
            cfg.train.steps_per_dispatch = probe_steps_per_dispatch(
                cfg, build_train, params, opt_state, spec, log,
                place=probe_place)
            sidecar["steps_per_dispatch"] = cfg.train.steps_per_dispatch
            side_dirty = True
    train_step = build_train(cfg.train.steps_per_dispatch)
    if ke == 0:
        if "eval_steps_per_dispatch" in sidecar:
            ke = int(sidecar["eval_steps_per_dispatch"])
            log(f"reusing autotuned eval_steps_per_dispatch={ke} "
                f"from {side}")
        else:
            # HOST-INVARIANT cap (ragged per-host shards would put hosts
            # on different ladder rungs -> collective deadlock at startup)
            fused_eval = make_fused()  # the probe warms its compile cache
            ke = probe_eval_steps_per_dispatch(
                cfg, eval_step, fused_eval, params, spec,
                n_batches_cap=val_loader.epoch_batches(), log=log)
            sidecar["eval_steps_per_dispatch"] = ke
            side_dirty = True
    ke = max(1, ke)
    cfg.eval_steps_per_dispatch = ke
    if ke > 1 and fused_eval is None:
        fused_eval = make_fused()
    elif ke <= 1:
        fused_eval = None
    if side_dirty and side and jax.process_index() == 0:
        _os.makedirs(cfg.train.ckpt_dir, exist_ok=True)
        with open(side, "w") as f:
            json.dump(sidecar, f)

    mngr = None
    start_step = 0
    if cfg.train.ckpt_dir:
        mngr = CheckpointManager(cfg.train.ckpt_dir, cfg.train.keep_best_k,
                                 async_checkpointing=cfg.train.async_checkpoint)
        restored = mngr.restore(template={
            "params": params, "opt_state": opt_state,
            "loader": train_loader.state_dict(), "step": 0})
        if restored is not None:
            params, opt_state = restored["params"], restored["opt_state"]
            train_loader.load_state_dict(restored["loader"])
            start_step = int(restored["step"])
            log(f"resumed from step {start_step}")

    writer = None
    if cfg.train.log_dir and jax.process_index() == 0:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(cfg.train.log_dir)

    # Graceful preemption: on SIGTERM (the scheduler's eviction notice),
    # checkpoint at the next step boundary and exit fast. Without this,
    # everything since the last best-val improvement is lost — periodic
    # saves are best-only. The snapshot saves WITHOUT metrics so orbax's
    # best-k GC keeps it; it becomes `latest`, which auto-resume prefers.
    import signal
    import threading

    stop_signal: list = []
    prev_sigterm = None
    if (mngr is not None
            and threading.current_thread() is threading.main_thread()):
        prev_sigterm = signal.signal(
            signal.SIGTERM, lambda s, f: stop_signal.append(s))

    best_auc, best_step, evals_since_best = -1.0, -1, 0
    preempted = False
    history = []
    step = start_step
    # Goodput accounting (SURVEY.md §5.3): productive time = wall time spent
    # training; eval + checkpoint pauses are "badput" the run reports so
    # regressions in overhead are visible without a profiler.
    t_run_start = time.time()
    nonproductive_s = 0.0
    t_last, n_since = time.time(), 0
    # Bucketed-exchange fallback counter (VERDICT r4 weak #2): device
    # scalars are collected per dispatch and pulled only at log boundaries
    # (already synced there), so counting costs no extra syncs.
    of_pending, overflow_steps = [], 0
    of_seen = False  # any a2a_overflow metric observed this run

    def fold_overflow(keep_newest: bool = False) -> int:
        """Pull pending overflow flags into the step counter. The ONE
        accumulation implementation (three call sites). keep_newest skips
        the most recent flag — its dispatch may still be in flight, and
        the quiet-run cap fold must not become a pipeline sync."""
        nonlocal overflow_steps
        upto = len(of_pending) - 1 if keep_newest else len(of_pending)
        if upto > 0:
            overflow_steps += int(sum(float(x) for x in of_pending[:upto]))
            del of_pending[:upto]
        return overflow_steps
    k = cfg.train.steps_per_dispatch
    base_it = iter(train_loader)
    if k > 1:
        base_it = chunk_batches(base_it, k)
    it = prefetch_to_device(base_it, place)
    profiling, profiled = False, False  # one-shot: trace a single window
    try:
        while step < cfg.train.max_steps:
            batch = next(it)
            if cfg.train.profile_steps and step >= 5 and not profiling \
                    and not profiled:
                jax.profiler.start_trace("/tmp/hpmn_trace")
                profiling = True
            params, opt_state, metrics = train_step(params, opt_state, batch)
            step += k
            n_since += k
            if "a2a_overflow" in metrics:
                of_pending.append(metrics["a2a_overflow"])
                of_seen = True
                if len(of_pending) >= 256:
                    # Quiet runs (log_every=inf — the bench/sweep tools)
                    # must not grow a device scalar per dispatch forever.
                    # keep_newest: all but the just-dispatched flag are
                    # long retired, so the fold costs no pipeline stall.
                    fold_overflow(keep_newest=True)
            if stop_signal:
                mngr.save_preemption(step, params, opt_state,
                                     train_loader.state_dict())
                log(f"SIGTERM: checkpoint saved at step {step}; exiting")
                preempted = True
                break
            if profiling and step >= 5 + cfg.train.profile_steps:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                profiling, profiled = False, True
                log("profile trace written to /tmp/hpmn_trace")
            if step % cfg.train.log_every < k:  # crossed a log boundary
                # Sync via the scalar pull BEFORE reading the clock:
                # block_until_ready returns at dispatch over relayed links
                # (CLAUDE.md), so timing it yields dispatch-rate-inflated
                # ex/s with the execution backlog leaking into the NEXT
                # window (r4: windows read 2.4-4.7k while wall said ~0.5k).
                loss_v = float(metrics["loss"])
                dt = time.time() - t_last
                eps = n_since * cfg.train.batch_size / dt
                of_line = ""
                if of_seen:
                    # steps (not dispatches) that fell back to the exact
                    # all_gather+psum exchange — chronically nonzero means
                    # raise mesh.a2a_capacity_factor (OPERATIONS.md).
                    # Gate on of_seen, not of_pending: a cap fold between
                    # boundaries must not drop the field from the line.
                    of_line = f" a2a_overflow_steps {fold_overflow()}"
                log(f"step {step} loss {loss_v:.4f} "
                    f"bce {float(metrics['bce']):.4f} ex/s {eps:.1f}"
                    f"{of_line}")
                if writer is not None:
                    # NB: do not shadow `k` (the steps-per-dispatch stride)
                    for name, v in metrics.items():
                        writer.add_scalar(f"train/{name}", float(v), step)
                    writer.add_scalar("train/examples_per_sec", eps, step)
                t_last, n_since = time.time(), 0
            if step % cfg.train.eval_every < k or step >= cfg.train.max_steps:
                t_pause = time.time()
                val = run_evaluate(eval_step, params_for_eval(params,
                                                              opt_state),
                                   val_loader, cfg.eval_streaming_bins,
                                   cfg.eval_gauc_bins,
                                   cfg.eval_gauc_max_users,
                                   fused_eval=fused_eval,
                                   steps_per_dispatch=ke)
                log(f"step {step} VAL auc {val['auc']:.4f} "
                    f"gauc {val['gauc']:.4f} log_loss {val['log_loss']:.4f} "
                    f"calib {val['calib']:.3f}")
                if writer is not None:
                    writer.add_scalar("val/auc", val["auc"], step)
                    writer.add_scalar("val/log_loss", val["log_loss"], step)
                history.append({"step": step, **val})
                if val["auc"] > best_auc:
                    best_auc, best_step, evals_since_best = val["auc"], step, 0
                    if mngr is not None:
                        mngr.save(step, params, opt_state,
                                  train_loader.state_dict(),
                                  {"val_auc": val["auc"],
                                   "val_log_loss": val["log_loss"]})
                else:
                    evals_since_best += 1
                    if evals_since_best >= cfg.train.early_stop_patience:
                        log(f"early stop at step {step} (best {best_auc:.4f} "
                            f"@ {best_step})")
                        nonproductive_s += time.time() - t_pause
                        break
                nonproductive_s += time.time() - t_pause
                t_last, n_since = time.time(), 0

    finally:
        # Restore the previous SIGTERM disposition even when the
        # loop raises — leaving the swallow-into-list lambda
        # installed would make the process ignore SIGTERM forever.
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
    total_s = max(time.time() - t_run_start, 1e-9)
    goodput = max(0.0, 1.0 - nonproductive_s / total_s)
    # fold flags pending since the last log boundary so early-stop /
    # preemption / quiet runs still report the diagnostic
    fold_overflow()
    if overflow_steps:
        log(f"a2a_overflow_steps {overflow_steps} total (chronic fallback "
            f"-> raise mesh.a2a_capacity_factor, OPERATIONS.md)")
    if step > start_step:
        log(f"goodput {100 * goodput:.1f}% (train {total_s - nonproductive_s:.1f}s, "
            f"eval+ckpt {nonproductive_s:.1f}s of {total_s:.1f}s)")
    if preempted:
        # Fast exit: the evicting scheduler's deadline is short — skip the
        # final test eval; the restarted run continues from this snapshot.
        # "test" keeps the metric keys (nan) so consumers that index
        # res["test"]["auc"] unconditionally (sweep, make_golden) survive.
        if writer is not None:
            writer.close()
        mngr.close()
        nan = float("nan")
        return {"test": {"auc": nan, "gauc": nan, "log_loss": nan,
                         "calib": nan, "n": 0.0},
                "best_val_auc": best_auc, "best_step": best_step,
                "history": history, "params": params, "preempted": True,
                "goodput": goodput,
                "ema_params": get_ema_params(opt_state) if ema_on else None}

    # Final test eval with the best checkpoint if available, else current.
    if mngr is not None and mngr.best_step() is not None:
        restored = mngr.restore(mngr.best_step(), template={
            "params": params, "opt_state": opt_state,
            "loader": train_loader.state_dict(), "step": 0})
        params = restored["params"]
        opt_state = restored["opt_state"]  # carries the EMA shadow
    test = run_evaluate(eval_step, params_for_eval(params, opt_state),
                        test_loader, cfg.eval_streaming_bins,
                        cfg.eval_gauc_bins, cfg.eval_gauc_max_users,
                        fused_eval=fused_eval, steps_per_dispatch=ke)
    log(f"TEST auc {test['auc']:.4f} gauc {test['gauc']:.4f} "
        f"log_loss {test['log_loss']:.4f} calib {test['calib']:.3f}")
    if writer is not None:
        writer.add_scalar("test/auc", test["auc"], step)
        writer.add_scalar("test/log_loss", test["log_loss"], step)
        writer.close()
    if mngr is not None:
        mngr.close()
    return {"test": test, "best_val_auc": best_auc, "best_step": best_step,
            "history": history, "params": params, "goodput": goodput,
            "ema_params": get_ema_params(opt_state) if ema_on else None}


def apply_overrides(cfg, kvs):
    """Dotted `key=value` config overrides with type coercion from the
    existing value (shared by the train CLI and the tools/ CLIs)."""
    for kv in kvs:
        key, val = kv.split("=", 1)
        ref = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            ref = ref[part]
        old = ref[parts[-1]]
        caster = type(old) if old is not None else str
        if isinstance(old, bool):
            val = val.lower() in ("1", "true", "yes")
        elif isinstance(old, tuple):
            val = tuple(int(x) for x in val.split(",") if x)
        else:
            val = caster(val)
        ref[parts[-1]] = val
    return cfg


def main(argv=None):
    """CLI: python -m hpmn_tpu.train.train --config amazon_hpmn
    [--set key=value ...] — the reference's `python train.py <dataset>
    <model>` equivalent (SURVEY.md §1 L5)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--set", nargs="*", default=[],
                   help="dotted config overrides, e.g. train.max_steps=100")
    args = p.parse_args(argv)
    train(apply_overrides(get_config(args.config), args.set))


if __name__ == "__main__":
    main()

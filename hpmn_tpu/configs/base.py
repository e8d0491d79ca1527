"""Config definitions.

Hyperparameter ballparks follow the paper [P §5.1.2]: embedding dim 16 per id
field (behavior emb = concat(item, cat) = 32), memory/hidden size 32, Adam,
lr ~1e-3, L2 ~1e-4(amazon)/1e-5(taobao,xlong), HPMN periods giving
log-compression of T [P §4.2]. Batch sizes are TPU-friendly multiples of 8.
"""

from __future__ import annotations

import ml_collections


def base_config() -> ml_collections.ConfigDict:
    c = ml_collections.ConfigDict()

    c.seed = 0
    c.dataset = "amazon"  # amazon | taobao | xlong
    c.synthetic_task = "ctr"  # ctr | periodic (planted long-range task)
    c.n_examples = 20000  # synthetic dataset size
    c.data_dir = ""  # if set, load preprocessed real arrays from here

    c.model = ml_collections.ConfigDict()
    c.model.name = "hpmn"  # hpmn|gru4rec|dien|rum|dnn|lstm|caser|shan|svdpp|bst
    c.model.emb_dim = 16  # per id field; behavior emb = 2*emb_dim
    c.model.mem_dim = 32  # GRU memory/hidden width
    c.model.dtype = "float32"  # compute dtype for the towers/scan
    # HPMN hierarchy [P §4.2]: layer l (1-indexed) updates every period**(l-1).
    c.model.hpmn_layers = 3
    c.model.hpmn_period = 2
    c.model.use_hierarchical_scan = True  # fast path; False = masked oracle
    c.model.use_pallas = False  # fused TPU kernels for GRU scan + readout
    # Compute dtype inside the Pallas scan's VPU chain (MXU always
    # accumulates f32): "bfloat16" doubles VPU element throughput at ~1%
    # relative numeric drift vs the f32 oracle.
    c.model.scan_dtype = "float32"
    # Statically assume every sequence is full-length (no padding): elides
    # all mask work in the Pallas path. Safe for the synthetic periodic /
    # XLong-style data whose sequences are always length T.
    c.model.assume_full_mask = False
    # Full-mask HPMN path: emit only the strided rows layer l+1 consumes
    # (plus boundary states) instead of the dense h_seq stream; backward
    # recomputes in-chunk states. Bit-exact, and faster in isolation
    # (fwd 1.95->1.48 ms on the XLong layer-1 shape) — but REJECTED as the
    # default by end-to-end measurement: composed into the training graph
    # (pad copies for T % (period-aligned chunk) != 0, dx slice, sparse
    # cotangent) it is SLOWER at every real layer shape (layer 1: 3.23 ms
    # dense vs 4.58 ms strided; whole hierarchy +1.7 ms, bench 27.9k ->
    # 24.9k ex/s). Kept as a tested variant; see ARCHITECTURE §3.
    c.model.pallas_stride_outputs = False
    c.model.readout_dim = 32  # additive-attention hidden size [P §4.3]
    c.model.tower_hidden = (200, 80)  # PReLU MLP tower [P §4.3]
    # DIEN
    c.model.dien_use_aux_loss = True
    c.model.aux_weight = 1.0
    # RUM external memory [P §5.1.3]
    c.model.rum_slots = 8
    # Caser / SHAN knobs
    c.model.caser_hfilters = 4
    c.model.caser_vfilters = 4
    c.model.shan_recent = 10  # SHAN short-term window length
    # BST (Behavior Sequence Transformer) knobs: post-LN blocks over the
    # [behaviors; target] sequence; heads must divide 2*emb_dim.
    c.model.bst_blocks = 1
    c.model.bst_heads = 2
    c.model.bst_ffn_mult = 4
    # >0: online-softmax attention scanned over key chunks of this size —
    # O(S*chunk) peak memory instead of the dense O(S^2) score matrix
    # (lifelong T: the dense [B,h,T,T] scores for T=1000, B=512 would be
    # ~4 GB). 0 = dense. Both paths are equivalence-tested.
    c.model.bst_attn_chunk = 0
    # Transformer compute dtype: "bfloat16" runs the block matmuls with
    # bf16 operands (params stay f32; softmax statistics and layer-norm
    # moments stay f32, and the attention einsums request f32 accumulation
    # explicitly via preferred_element_type; the FFN/projection matmuls
    # rely on the TPU MXU's native f32 accumulation and emit bf16). The
    # MXU-heavy BST is the model this buys the most for (ARCHITECTURE §3).
    c.model.bst_dtype = "float32"
    # Optional user-id embedding into the tower (SURVEY.md §2.1 tower row:
    # [read/state; target-emb (; user-emb)]); adds a row-shardable
    # [n_users, emb_dim] table.
    c.model.use_user_emb = False

    c.loss = ml_collections.ConfigDict()
    c.loss.cov_weight = 0.1  # HPMN slot-decorrelation [P §4.4]
    c.loss.l2_weight = 1e-4

    c.train = ml_collections.ConfigDict()
    c.train.batch_size = 128
    c.train.lr = 1e-3
    # Optimizer extras (train.make_optimizer) — defaults reproduce plain
    # Adam exactly (incl. opt-state tree structure for old checkpoints).
    c.train.lr_schedule = "constant"  # constant | cosine | exponential
    c.train.warmup_steps = 0  # linear 0 -> lr over this many steps
    c.train.decay_steps = 0  # schedule horizon; 0 = train.max_steps
    c.train.lr_min_ratio = 0.0  # end-of-decay lr as a fraction of lr
    c.train.grad_clip_norm = 0.0  # global-norm clip; 0 = off
    c.train.weight_decay = 0.0  # decoupled (adamw); loss.l2_weight is the
    #                             penalty-term alternative
    c.train.grad_accum = 1  # micro-batches per param update (MultiSteps)
    c.train.ema_decay = 0.0  # >0: keep a Polyak/EMA shadow of the params
    #   in the opt state and evaluate/export with it (train.with_ema)
    c.train.max_steps = 2000
    c.train.eval_every = 200
    c.train.early_stop_patience = 5  # evals without val-AUC improvement
    c.train.log_every = 50
    c.train.ckpt_dir = ""
    c.train.log_dir = ""  # tensorboardX event files (SURVEY.md §5.5)
    c.train.keep_best_k = 3
    c.train.async_checkpoint = False  # overlap snapshot writes with training
    # Persistent jit cache: restarts/relaunches skip the 20-40s TPU
    # compiles — and the autotune probes' per-rung compiles, their
    # dominant cost (BASELINE.md autotune section). Ships ON (r5,
    # VERDICT r4 weak #4): a fresh launch of a previously-run config
    # starts in seconds instead of minutes. "" disables; ~ expands.
    c.train.compilation_cache_dir = "~/.cache/hpmn_tpu/xla"
    c.train.profile_steps = 0  # >0: dump a jax.profiler trace of N steps
    c.train.debug_nans = False
    # Train steps fused into one dispatch (lax.scan over stacked batches).
    # >1 removes per-dispatch host/runtime overhead (measured 19.9->16.7
    # ms/step on the XLong flagship at k=8) at the cost of coarser
    # logging/eval granularity. Supported on the single-device path and
    # both sharded paths (GSPMD + shard_map). 0 = AUTO: the driver probes
    # the geometric k ladder at startup and takes the knee for the
    # ATTACHED link (train.probe_steps_per_dispatch) — the r3 shipped
    # knees encoded this tunnel's 3-5 ms/dispatch latency, which other
    # deployments don't pay (MEASURED_DISPATCH_KNEES keeps those
    # measurements for tools/explicit override).
    c.train.steps_per_dispatch = 1

    # Wire-compact host->device batches (uint16 ids / uint8 mask, expanded
    # on device inside the step — schema.compact_batch): halves the bytes
    # shipped per step, exact whenever the vocab fits uint16 (auto-gated;
    # ids are exact, masks are 0/1). Matters on relayed links (measured:
    # the in-loop bound on this machine, BASELINE.md) and for per-chip
    # feed bandwidth when one host drives several chips.
    c.train.compact_transfer = True

    c.mesh = ml_collections.ConfigDict()
    c.mesh.enable = True  # False: force single-device execution
    c.mesh.data_axis = "data"
    c.mesh.model_axis = "model"
    c.mesh.model_parallel = 1  # table-shard count; 1 = no model parallelism
    c.mesh.embedding_mode = "replicated"  # replicated | psum | a2a (row-sharded)
    # Shard the batch over ("data", "model") in the shard_map step instead
    # of replicating it over "model": each model shard computes the dense
    # tower on its OWN batch slice and the bucketed a2a lookup exchanges
    # only owned rows — per-shard embedding wire falls from ~N*d to
    # ~2*f*N*d/S (ARCHITECTURE §5) and the dense compute parallelizes over
    # S more devices. Default TRUE (r5): it is the only regime where the
    # exchange beats psum's wire (measured 0.52x = f/S embedding wire,
    # tools/bench_a2a_wire.py — the win GROWS with the shard count), so a
    # model_parallel>1 run gets it unless embedding_mode is explicitly
    # "psum" (which the driver honors by disabling this; psum and the
    # replicated-ids a2a are the legacy/fallback layouts). Takes effect
    # only when model_parallel > 1.
    c.mesh.batch_over_model = True
    # Static per-owner bucket capacity = ceil(ceil(N/S)*f) for the bucketed
    # a2a exchange. Any per-owner overflow (e.g. frequency-sorted vocabs
    # skewing load onto the shard owning the hot rows) falls back to an
    # exact all_gather+psum pass for that batch — correct, slower, and
    # surfaced as the ``a2a_overflow_steps`` train-metric/log counter;
    # raise f if that counter runs chronically hot (OPERATIONS.md).
    # 0 = AUTO (r5): the driver derives f from the training arrays' actual
    # id distribution at startup (train.resolve_capacity_factor — sampled
    # per-owner imbalance at the step's per-shard query sizes, x1.25
    # margin). Direct API callers who leave 0 get the uniform 2.0.
    c.mesh.a2a_capacity_factor = 0.0
    # Sequence parallelism (parallel/seq_parallel.py): shard the T axis of
    # the long scans over a "seq" mesh axis with pipelined carry handoff.
    # Mutually exclusive with model_parallel/use_pallas in v1 (enforced).
    c.mesh.seq_parallel = 1
    c.mesh.sp_microbatches = 4  # pipeline depth; bubble = (S-1)/(MB+S-1)
    c.mesh.sp_min_local_steps = 8  # below this chunk size, fall back local
    c.mesh.sp_inner = "jnp"  # chunk-scan impl: jnp | pallas (fused kernel)

    c.eval_batch_size = 256
    # Eval batches fused per device dispatch (lax.map over stacked batches
    # — the train path's steps_per_dispatch economics applied to the eval
    # loop; logits identical, single- AND multi-host). 0 = AUTO (r5): the
    # driver probes the eval ladder for the attached link at startup (the
    # r4 shipped constants encoded THIS tunnel's knees — see
    # MEASURED_EVAL_KNEES) and persists the choice in the autotune
    # sidecar. Tests/fixed harnesses pin an explicit value.
    c.eval_steps_per_dispatch = 0
    c.eval_streaming_bins = 0  # >0: bounded-memory histogram AUC/GAUC
    # Streaming-mode GAUC: per-user [2, eval_gauc_bins] int32 histograms —
    # O(users) memory, independent of impression count. 0 disables (gauc =
    # nan); eval_gauc_max_users > 0 hash-caps the user state HARD
    # (colliding users merge within a bucket).
    c.eval_gauc_bins = 256
    c.eval_gauc_max_users = 0
    return c


# Hierarchy-reach rule (measured, STATUS.md): the top layer's period must
# cover a sizable fraction of T (~T/3) or long-range signal cannot reach the
# final memory within a practical training budget — a 3-layer/period-3 stack
# (reach 9) sits at chance on a T=300 long-range task while reach>=81 learns.


def _amazon(c):
    c.dataset = "amazon"
    c.model.hpmn_layers = 4  # T=100: periods 1,4,16,64
    c.model.hpmn_period = 4
    c.loss.l2_weight = 1e-4
    # Measured eval ladder at T=100 on the r4 tunnel (BASELINE.md): 7.1k
    # -> 24.1k (k=8) -> 28.1k ex/s (k=16) — short steps are dispatch-
    # bound, same as train. Ships 0 = auto since r5 (MEASURED_EVAL_KNEES).
    return c


def _taobao(c):
    c.dataset = "taobao"
    c.model.hpmn_layers = 5  # T=300: periods 1,3,9,27,81
    c.model.hpmn_period = 3
    c.loss.l2_weight = 1e-5
    # r4 tunnel eval knee was 8 (BASELINE.md); ships 0 = auto since r5.
    return c


def _xlong(c):
    c.dataset = "xlong"
    c.model.hpmn_layers = 6  # T=1000: periods 1,3,...,243 (all layers fire;
    c.model.hpmn_period = 3  # period 4 would leave the 1024-period top dead)
    c.loss.l2_weight = 1e-5
    # Measured eval knee on the r4 tunneled chip (tools/bench_eval.py):
    # k=1 3.6k / k=4 5.4k / k=8 6.6k eval ex/s (1.8x); k=16 regressed on a
    # 16-batch epoch (no inter-group pipelining left). Ships 0 = auto
    # since r5; the probe's ladder cap is the eval epoch's batch count,
    # which encodes exactly that regression.
    # B=512 is the measured throughput optimum on TPU v5e (BASELINE.md:
    # 256 and 1024 both bench lower at k=1; with dispatch chaining B=1024
    # only ties it) — the config default IS the recorded headline shape.
    c.train.batch_size = 512
    # Dispatch chaining ships AUTO (0): the startup probe takes the knee
    # for the attached link. On this tunneled v5e the measured ladder was
    # k=1 25.7k, k=8 27.9k, k=16 31.2k, k=24 31.6k, k=32 31.7k, k=64
    # 31.9k ex/s (bf16 tiles) -> knee 32 (MEASURED_DISPATCH_KNEES).
    c.train.steps_per_dispatch = 0
    return c


def amazon_hpmn() -> ml_collections.ConfigDict:
    """[B:7] HPMN single memory layer, Amazon (T=100, CPU-runnable).
    k=64 steps/dispatch is the measured knee (257k ex/s/chip vs 7.4k at
    k=1 — T=100 single steps are per-dispatch-overhead-bound; k=128
    measured +18% more but halves log/eval granularity, BASELINE.md)."""
    c = _amazon(base_config())
    c.model.name = "hpmn"
    c.model.hpmn_layers = 1
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 64
    return c


def taobao_hpmn() -> ml_collections.ConfigDict:
    """[B:8] HPMN 3-layer periodic memory, Taobao (T=300). With only three
    layers the period must be large for the hierarchy to reach the horizon:
    1, 10, 100 (see the reach rule above; period 3 reach=9 is at chance on
    the planted long-range task, period 10 learns it). B=512 / k=32 is the
    measured throughput shape (91.1k ex/s/chip; k=64 +3.6% within noise,
    BASELINE.md)."""
    c = _taobao(base_config())
    c.model.name = "hpmn"
    c.model.hpmn_layers = 3
    c.model.hpmn_period = 10
    c.train.batch_size = 512
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 32
    return c


def xlong_hpmn() -> ml_collections.ConfigDict:
    """[B:9] HPMN full hierarchy on XLong (T=1000, lifelong modeling)."""
    c = _xlong(base_config())
    c.model.name = "hpmn"
    return c


def taobao_dien() -> ml_collections.ConfigDict:
    """[B:10] DIEN baseline (GRU + AUGRU attention evolution) on Taobao.
    B=512 / k=16 is the measured throughput shape (46.7k ex/s/chip with
    Pallas bf16, BASELINE.md)."""
    c = _taobao(base_config())
    c.model.name = "dien"
    c.train.batch_size = 512
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 16
    return c


def amazon_rum() -> ml_collections.ConfigDict:
    """[B:11] RUM external-memory baseline on Amazon. k=64 measured knee
    (104.5k ex/s/chip vs 11.2k at k=1, BASELINE.md)."""
    c = _amazon(base_config())
    c.model.name = "rum"
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 64
    return c


def amazon_gru4rec() -> ml_collections.ConfigDict:
    """[B:11] GRU4Rec RNN baseline on Amazon. k=64 measured knee
    (266k ex/s/chip vs 10.4k at k=1, BASELINE.md)."""
    c = _amazon(base_config())
    c.model.name = "gru4rec"
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 64
    return c


def taobao_bst() -> ml_collections.ConfigDict:
    """BST Transformer (extra model family beyond the reference's set) on
    Taobao: one post-LN block per the BST paper, dense attention (T=300
    fits; lifelong-T runs set bst_attn_chunk). B=256 / k=16 is the measured
    knee (94.1k ex/s/chip full train step; k=8 41.4k, k=32 regresses to
    81.7k, BASELINE.md)."""
    c = _taobao(base_config())
    c.model.name = "bst"
    c.train.batch_size = 256
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 16
    return c


def xlong_bst() -> ml_collections.ConfigDict:
    """BST on XLong (lifelong T=1000): the extra family's lifelong leg,
    with the final block restricted to the target-position query (O(T), the
    r3 optimization — 82% of the r2 step was attention nothing downstream
    read) and the key-chunked online-softmax path available for
    bst_blocks > 1 (no O(T^2) score matrix). B=256 / k=16 is the measured
    optimum: 36.2k ex/s/chip vs 4.8k in r2 — 32.1-33.5k at k=8
    (tools/bench_breakdown.py --config xlong_bst + tools/bench_config.py
    sweeps, BASELINE.md). B=512/k=8 measured WORSE (32.6k) — at T=1000
    the attention/FFN streams already fill the chip at B=256."""
    c = _xlong(base_config())
    c.model.name = "bst"
    c.train.batch_size = 256
    c.train.steps_per_dispatch = 0  # auto; tunnel knee was 16
    c.model.bst_attn_chunk = 128
    return c


# Dispatch-chaining knees measured on the r2/r3 tunneled TPU v5e (BASELINE.md
# matrix; 3-5 ms/dispatch relay). Configs ship steps_per_dispatch=0 (auto:
# the startup probe re-derives the knee for the attached link); this table
# keeps the tunnel measurements for tools that need a fixed k without
# probing (tools/bench_config.py) and as the documented reference point.
MEASURED_DISPATCH_KNEES = {
    "amazon_hpmn": 64,
    "taobao_hpmn": 32,
    "xlong_hpmn": 32,
    "taobao_dien": 16,
    "amazon_rum": 64,
    "amazon_gru4rec": 64,
    "taobao_bst": 16,
    "xlong_bst": 16,
}

# Eval-loop knees measured on the same tunnel (r4, tools/bench_eval.py).
# Configs ship eval_steps_per_dispatch=0 (auto-probe); this table keeps the
# tunnel measurements for tools that need a fixed ke without probing.
MEASURED_EVAL_KNEES = {
    "amazon_hpmn": 16,
    "taobao_hpmn": 8,
    "xlong_hpmn": 8,
    "taobao_dien": 8,
    "amazon_rum": 16,
    "amazon_gru4rec": 16,
    "taobao_bst": 8,
    "xlong_bst": 8,
}


_CONFIGS = {
    "amazon_hpmn": amazon_hpmn,
    "taobao_hpmn": taobao_hpmn,
    "xlong_hpmn": xlong_hpmn,
    "taobao_dien": taobao_dien,
    "amazon_rum": amazon_rum,
    "amazon_gru4rec": amazon_gru4rec,
    "taobao_bst": taobao_bst,
    "xlong_bst": xlong_bst,
}


def list_configs():
    return sorted(_CONFIGS)


def get_config(name: str) -> ml_collections.ConfigDict:
    if name not in _CONFIGS:
        raise KeyError(f"unknown config {name!r}; available: {list_configs()}")
    return _CONFIGS[name]()

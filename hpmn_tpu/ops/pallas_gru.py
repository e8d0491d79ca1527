"""Fused Pallas TPU kernel for the GRU/AUGRU recurrence.

Reference equivalent: TF's C++/CUDA ``GRUCell`` + ``dynamic_rnn`` runtime
loop (SURVEY.md §2.2); mandated TPU-native replacement: "fused Pallas
GRU-scan kernel (time-loop inside the kernel, batch/hidden tiled to MXU/VPU)"
[B:5]. Cell math is identical to ``ops.gru`` (cuDNN-style, linear-before-
reset, masked identity steps, AUGRU gate scale).

The design is driven by two TPU facts measured on this chip:

1. **HBM tiling makes streams expensive**: every [.., <=128]-minor f32
   array burns a full 512-byte tiled row per (example, step). So the kernel
   touches the minimum stream set — forward reads x [B,T,d_in] and writes
   h_seq [B,T,d_m] + a tiny per-chunk boundary-state array, nothing else:
   the input projection runs in-kernel, and gate activations are recomputed
   (bit-exactly) in the backward instead of being saved. mask/scale ride as
   2-D [T, B] arrays whose (K, bt) blocks are dense tiles: 4 bytes/step
   instead of a padded 512-byte row.

2. **In-kernel relayouts (reshape/transpose of padded tiles) are slow**:
   the whole recurrence is expressed with NO reshapes — one fused matmul
   pair per step against 128-lane-packed weights:

       Wx4 [d_in, 4dm] = [wx_r | wx_z | wx_c |  0  ]
       Wh4 [d_m, 4dm]  = [wh_r | wh_z |  0   | wh_c]
       pre = x_t @ Wx4 + h @ Wh4 + b4          (4dm = 128 when d_m = 32)
       r = sigmoid(pre_0); z = sigmoid(pre_1); c = tanh(pre_2 + r * pre_3)

   splitting the candidate's x- and h-contributions into separate lane
   blocks so the linear-before-reset gating needs no extra matmul.

Grid = (B/bt, T/K): TPU grids iterate row-major (time fastest), so each
batch tile scans its whole sequence with the hidden state resident in a
VMEM scratch accumulator; K steps run per grid iteration; Pallas
double-buffers the chunk DMAs; the packed weights stay in VMEM for the
whole scan (their block index never changes).

BACKWARD scans chunks in reverse (reversed index maps), reads x, h_seq,
dh_seq and the boundary states, writes dx and the dense [T, B] dscale
stream (the AUGRU attention gradient DIEN needs [B:10]), and accumulates
dWx4/db4/dWh4 in VMEM scratch, emitting one partial per batch tile (summed
and unpacked outside). Wired with jax.custom_vjp.

Numerics: f32 by default; ``dtype=bfloat16`` runs the VPU chain (gates,
carries, streams) in bf16 while the MXU still accumulates f32 and the
weight-gradient accumulators stay f32 — measured +13% forward at ~1%
relative drift vs the f32 oracle (the scan is VPU-throughput-bound at
d_m=32). Gradients of the packed zero blocks are discarded, which is
exactly the unpacked parametrization's gradient.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru import GRUParams

_INTERPRET = False  # flipped by tests on CPU

UNROLL = 8  # time steps per grid iteration
MAX_BT_F32 = 256   # batch-tile caps: ~4 double-buffered 1MB streams per
MAX_BT_BF16 = 512  # 256-row f32 tile; bf16 halves stream bytes so a 512-row
#                    tile fits the 16MB scoped-VMEM budget and measured -6%
#                    on the layer-1 fwd+bwd (3.19 -> 3.01 ms). K=16 unroll
#                    measured worse (4.29 ms) and OOMs VMEM at bt=512.


def _bt_cap(dtype) -> int:
    return MAX_BT_BF16 if jnp.dtype(dtype) == jnp.bfloat16 else MAX_BT_F32


def _block_b(B: int, cap: int) -> int:
    """Largest power-of-two batch tile <= cap dividing B."""
    bt = 1
    while bt * 2 <= min(B, cap) and B % (bt * 2) == 0:
        bt *= 2
    return bt


def _pack_weights(params: GRUParams, dtype=jnp.float32):
    """(wx [d_in,3dm], wh [dm,3dm], b [3dm]) -> 4dm-lane packed operands."""
    d_m = params.wh.shape[0]
    d_in = params.wx.shape[0]
    wx4 = jnp.concatenate(
        [params.wx.astype(dtype), jnp.zeros((d_in, d_m), dtype)], axis=1)
    wh4 = jnp.concatenate(
        [params.wh[:, :2 * d_m].astype(dtype), jnp.zeros((d_m, d_m), dtype),
         params.wh[:, 2 * d_m:].astype(dtype)], axis=1)
    b4 = jnp.concatenate([params.b.astype(dtype),
                          jnp.zeros((d_m,), dtype)])
    return wx4, wh4, b4.reshape(1, -1)


def _sigmoid(x):
    """sigmoid via tanh with dtype-matched constants: Mosaic's `logistic`
    lowering broadcasts an f32 constant into bf16 vectors (compile error),
    and tanh shares the transcendental cost anyway."""
    half = jnp.asarray(0.5, x.dtype)
    return half * jnp.tanh(half * x) + half


def _pre_gates(pre, d_m):
    r = _sigmoid(pre[:, :d_m])
    z = _sigmoid(pre[:, d_m:2 * d_m])
    g_c = pre[:, 3 * d_m:]
    c = jnp.tanh(pre[:, 2 * d_m:3 * d_m] + r * g_c)
    return r, z, c, g_c


def _step_pre(x_k, h, wx4_ref, wh4_ref, b4_ref, dtype):
    """Fused per-step pre-activation; MXU accumulates f32, the VPU chain
    then runs in `dtype` (bf16 = 2x VPU element throughput)."""
    pre = (jnp.dot(x_k, wx4_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(h, wh4_ref[:], preferred_element_type=jnp.float32)
           + b4_ref[:].astype(jnp.float32))
    return pre.astype(dtype)


# --------------------------------------------------------------- forward --

def _fwd_kernel(x_ref, mask_ref, scale_ref, wx4_ref, wh4_ref, b4_ref, h0_ref,
                hseq_ref, hbound_ref, h_scr, *, d_m: int,
                has_mask: bool, has_scale: bool, dtype):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    K = x_ref.shape[0]
    # mask/scale arrive as (K, bt) dense tiles; transpose once per chunk
    # (cell steps need them as [bt, 1] sublane vectors). Statically elided
    # when the caller passed none (full sequences / plain GRU).
    mask_t = mask_ref[:].T if has_mask else None  # [bt, K]
    scale_t = scale_ref[:].T if has_scale else None

    h = h_scr[:]
    # The backward needs h_{t-1} at each chunk's first step: record the
    # incoming boundary state as a small side output.
    hbound_ref[0] = h
    for k in range(K):
        pre = _step_pre(x_ref[k], h, wx4_ref, wh4_ref, b4_ref, dtype)
        r, z, c, _ = _pre_gates(pre, d_m)
        zs = z * scale_t[:, k:k + 1] if has_scale else z
        h_cell = h + zs * (c - h)
        if has_mask:
            h = h + mask_t[:, k:k + 1] * (h_cell - h)
        else:
            h = h_cell
        hseq_ref[k] = h
    h_scr[:] = h


def _fwd_call(x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0,
              has_mask=True, has_scale=True, dtype=jnp.float32):
    """All sequence operands TIME-MAJOR: x [T,B,d_in], mask/scale [T,B],
    h0 [B,dm]. T must be a multiple of UNROLL. Leading-dim slicing keeps
    every in-kernel access a contiguous tile (no per-step relayouts)."""
    T, B, d_in = x_tm.shape
    d_m = wh4.shape[0]
    bt = _block_b(B, _bt_cap(dtype))
    K = UNROLL
    grid = (B // bt, T // K)
    kernel = functools.partial(_fwd_kernel, d_m=d_m,
                               has_mask=has_mask, has_scale=has_scale,
                               dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, bt, d_in), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt), lambda i, t: (t, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt), lambda i, t: (t, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, 4 * d_m), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_m, 4 * d_m), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * d_m), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d_m), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, bt, d_m), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d_m), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, d_m), dtype),
            jax.ShapeDtypeStruct((T // K, B, d_m), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bt, d_m), dtype)],
        interpret=_INTERPRET,
    )(x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0)


# -------------------------------------------------------------- backward --

def _bwd_kernel(x_ref, hseq_ref, hbound_ref, dhseq_ref, mask_ref,
                scale_ref, wx4_ref, wh4_ref, b4_ref,
                dx_ref, dscale_ref, dh0_ref, dwx_tile_ref, db_tile_ref,
                dwh_tile_ref,
                dh_scr, dwx_scr, db_scr, dwh_scr,
                *, d_m: int, n_chunks: int, has_mask: bool, has_scale: bool,
                dtype):
    tr = pl.program_id(1)  # reverse chunk counter; chunk = n_chunks-1-tr

    @pl.when(tr == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        db_scr[:] = jnp.zeros_like(db_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    K = x_ref.shape[0]
    mask_t = mask_ref[:].T if has_mask else None  # [bt, K]
    scale_t = scale_ref[:].T if has_scale else None
    da_cols = []

    dh = dh_scr[:]
    dwx = dwx_scr[:]
    db = db_scr[:]
    dwh = dwh_scr[:]
    for k in reversed(range(K)):
        h_prev = hseq_ref[k - 1] if k > 0 else hbound_ref[0]
        x_k = x_ref[k]
        # Bit-exact recomputation of the forward gates.
        pre = _step_pre(x_k, h_prev, wx4_ref, wh4_ref, b4_ref, dtype)
        r, z, c, g_c = _pre_gates(pre, d_m)

        gtot = (dhseq_ref[k] + dh).astype(dtype)
        if has_mask:
            gcell = gtot * mask_t[:, k:k + 1]
        else:
            gcell = gtot
        if has_scale:
            a = scale_t[:, k:k + 1]
            zs = z * a
        else:
            zs = z
        dzs = gcell * (c - h_prev)
        dc = gcell * zs * (1.0 - c * c)
        dz = (dzs * a if has_scale else dzs) * z * (1.0 - z)
        if has_scale:
            da_cols.append(jnp.sum(dzs * z, axis=-1, keepdims=True))
        dr = dc * g_c * r * (1.0 - r)
        # dpre blocks: r-pre, z-pre, xp_c (direct), g_c (scaled by r).
        dpre = jnp.concatenate([dr, dz, dc, dc * r], axis=-1)
        dh = ((gcell - gcell * zs
               + (gtot - gcell if has_mask else 0.0)).astype(jnp.float32)
              + jnp.dot(dpre, wh4_ref[:].T,
                        preferred_element_type=jnp.float32))
        dx_ref[k] = jnp.dot(dpre, wx4_ref[:].T,
                            preferred_element_type=jnp.float32).astype(dtype)
        dwx += jnp.dot(x_k.T, dpre, preferred_element_type=jnp.float32)
        dwh += jnp.dot(h_prev.T, dpre, preferred_element_type=jnp.float32)
        db += jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)

    dh_scr[:] = dh
    dwx_scr[:] = dwx
    db_scr[:] = db
    dwh_scr[:] = dwh
    # da columns were produced k=K-1..0; restore order and store as (K, bt).
    if has_scale:
        dscale_ref[:] = jnp.concatenate(da_cols[::-1],
                                        axis=-1).T.astype(dtype)
    else:
        dscale_ref[:] = jnp.zeros_like(dscale_ref)

    @pl.when(tr == n_chunks - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dwx_tile_ref[0] = dwx_scr[:]
        db_tile_ref[0] = db_scr[:]
        dwh_tile_ref[0] = dwh_scr[:]


def _bwd_call(x_tm, mask_tm, scale_tm, wx4, wh4, b4, hseq_tm, hbound,
              dhseq_tm, has_mask=True, has_scale=True, dtype=jnp.float32):
    T, B, d_in = x_tm.shape
    d_m = wh4.shape[0]
    bt = _block_b(B, _bt_cap(dtype))
    K = UNROLL
    n_chunks = T // K
    grid = (B // bt, n_chunks)
    n_btiles = B // bt
    kernel = functools.partial(_bwd_kernel, d_m=d_m, n_chunks=n_chunks,
                               has_mask=has_mask, has_scale=has_scale,
                               dtype=dtype)
    rev3 = lambda i, t: (n_chunks - 1 - t, i, 0)
    revb = lambda i, t: (n_chunks - 1 - t, i, 0)
    rev2 = lambda i, t: (n_chunks - 1 - t, i)
    const = lambda i, t: (0, 0)
    dx, dscale, dh0, dwx_tiles, db_tiles, dwh_tiles = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, bt, d_in), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt, d_m), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d_m), revb, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt, d_m), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, 4 * d_m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_m, 4 * d_m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * d_m), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, bt, d_in), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bt), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d_m), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, 4 * d_m), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * d_m), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_m, 4 * d_m), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, d_in), dtype),
            jax.ShapeDtypeStruct((T, B), dtype),
            jax.ShapeDtypeStruct((B, d_m), jnp.float32),  # dh0 (f32 carry)
            jax.ShapeDtypeStruct((n_btiles, d_in, 4 * d_m), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, 1, 4 * d_m), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, d_m, 4 * d_m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, d_m), jnp.float32),  # dh carry stays f32
            pltpu.VMEM((d_in, 4 * d_m), jnp.float32),
            pltpu.VMEM((1, 4 * d_m), jnp.float32),
            pltpu.VMEM((d_m, 4 * d_m), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x_tm, hseq_tm, hbound, dhseq_tm, mask_tm, scale_tm, wx4, wh4, b4)
    return (dx, dscale, dh0, jnp.sum(dwx_tiles, 0), jnp.sum(db_tiles, 0),
            jnp.sum(dwh_tiles, 0))


# ------------------------------------------------------------ custom vjp --

def _pad_args(x_tm, mask_tm, scale_tm):
    """Pad T to a multiple of UNROLL (masked identity steps)."""
    T = x_tm.shape[0]
    T_pad = -(-T // UNROLL) * UNROLL
    if T_pad != T:
        x_tm = jnp.pad(x_tm, ((0, T_pad - T), (0, 0), (0, 0)))
        mask_tm = jnp.pad(mask_tm, ((0, T_pad - T), (0, 0)))
        scale_tm = jnp.pad(scale_tm, ((0, T_pad - T), (0, 0)),
                           constant_values=1.0)
    return x_tm, mask_tm, scale_tm


@functools.lru_cache(maxsize=None)
def _make_core(has_mask: bool, has_scale: bool, dtype_name: str):
    """custom_vjp specialization for the static mask/scale/dtype flags."""
    dtype = jnp.dtype(dtype_name)

    def _fwd(x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0):
        T = x_tm.shape[0]
        x_, mask_, scale_ = _pad_args(x_tm, mask_tm, scale_tm)
        hseq, hbound = _fwd_call(x_, mask_, scale_, wx4, wh4, b4, h0,
                                 has_mask, has_scale, dtype)
        return hseq[:T], (x_, mask_, scale_, wx4, wh4, b4, hseq, hbound, T)

    def _bwd(res, dhseq):
        x_, mask_, scale_, wx4, wh4, b4, hseq, hbound, T = res
        Tp = x_.shape[0]
        dhseq_p = jnp.pad(dhseq, ((0, Tp - T), (0, 0), (0, 0)))
        dx, dscale, dh0, dwx4, db4, dwh4 = _bwd_call(
            x_, mask_, scale_, wx4, wh4, b4, hseq, hbound, dhseq_p,
            has_mask, has_scale, dtype)
        # Zero the packed zero-blocks' gradients (those weights don't exist).
        d_m = wh4.shape[0]
        dwx4 = dwx4.at[:, 3 * d_m:].set(0.0)
        dwh4 = dwh4.at[:, 2 * d_m:3 * d_m].set(0.0)
        db4 = db4.at[:, 3 * d_m:].set(0.0)  # [1, 4dm], matching b4
        return (dx[:T], None, dscale[:T], dwx4.astype(wx4.dtype),
                dwh4.astype(wh4.dtype), db4.astype(b4.dtype),
                dh0.astype(dtype))

    @jax.custom_vjp
    def core(x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0):
        """TIME-MAJOR scan: x [T,B,d_in], mask/scale [T,B], packed weights
        (_pack_weights), h0 [B,dm] -> h_seq [T,B,dm]."""
        return _fwd(x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0)[0]

    core.defvjp(_fwd, _bwd)
    return core


def gru_scan_core(x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0,
                  has_mask=True, has_scale=True, dtype=jnp.float32):
    return _make_core(has_mask, has_scale, jnp.dtype(dtype).name)(
        x_tm, mask_tm, scale_tm, wx4, wh4, b4, h0)


# ----------------------------------------------- strided-output variant --
#
# HPMN layer l+1 consumes only every period-th output of layer l
# (models/hpmn.py stride sampling), yet the standard kernel writes the full
# [T,B,dm] h_seq stream and re-reads it in the backward. This variant
# (VERDICT r1 #5, measured accept: fwd 1.95 -> 1.48 ms, fwd+bwd 4.17 ->
# 3.75 ms on the XLong layer-1 shape, bit-exact) emits only the
# T//period strided rows + per-chunk boundary states; the backward
# recomputes the in-chunk states from the boundaries (a forward sub-sweep
# into VMEM scratch) instead of reading h_seq. Full-mask fast path only
# (no mask/gate-scale): the hierarchical encoder falls back to the dense
# kernel when padding masks are present.
#
# Chunk size K = smallest multiple of `period` >= UNROLL, so each chunk
# contains exactly K/period firing positions (static block shapes). T is
# padded up to a K multiple; pad steps are suppressed to identity in the
# LAST chunk (h_T correctness) and carry zero cotangent in the backward.


def _stride_chunk(period: int) -> int:
    k = period
    while k < UNROLL:
        k += period
    return k


def _fwd_stride_kernel(x_ref, wx4_ref, wh4_ref, b4_ref, h0_ref,
                       hs_ref, hbound_ref, hT_ref, h_scr,
                       *, d_m: int, K: int, period: int, n_chunks: int,
                       pad: int, dtype):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    hbound_ref[0] = h
    if pad:
        in_last = t == n_chunks - 1
    for k in range(K):
        pre = _step_pre(x_ref[k], h, wx4_ref, wh4_ref, b4_ref, dtype)
        r, z, c, _ = _pre_gates(pre, d_m)
        h_new = h + z * (c - h)
        if pad and k >= K - pad:
            h = jnp.where(in_last, h, h_new)  # identity on pad steps
        else:
            h = h_new
        if (k + 1) % period == 0:
            hs_ref[(k + 1) // period - 1] = h
    h_scr[:] = h

    @pl.when(t == n_chunks - 1)
    def _():
        hT_ref[:] = h_scr[:]


def _bwd_stride_kernel(x_ref, hbound_ref, dhs_ref, dhT_ref, wx4_ref,
                       wh4_ref, b4_ref,
                       dx_ref, dh0_ref, dwx_tile_ref, db_tile_ref,
                       dwh_tile_ref,
                       dh_scr, h_scr, dwx_scr, db_scr, dwh_scr,
                       *, d_m: int, K: int, period: int, n_chunks: int,
                       pad: int, dtype):
    tr = pl.program_id(1)  # reverse chunk counter

    @pl.when(tr == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        db_scr[:] = jnp.zeros_like(db_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    in_last = tr == 0  # chunk n_chunks-1 (grid reversed)
    # Forward sub-sweep: recompute the K in-chunk h states from the chunk's
    # boundary (bit-exact replay of the forward's dtype chain). Pad steps
    # are identity in the last chunk, matching the forward; their garbage
    # gate values are harmless because their cotangent is zero.
    h = hbound_ref[0]
    for k in range(K):
        h_scr[k] = h
        pre = _step_pre(x_ref[k], h, wx4_ref, wh4_ref, b4_ref, dtype)
        r, z, c, _ = _pre_gates(pre, d_m)
        h_new = h + z * (c - h)
        if pad and k >= K - pad:
            h = jnp.where(in_last, h, h_new)
        else:
            h = h_new

    dh = dh_scr[:]
    dwx = dwx_scr[:]
    db = db_scr[:]
    dwh = dwh_scr[:]
    # The true final step T-1 sits at k = K-pad-1 of the last chunk; h_T's
    # cotangent enters there.
    k_last = K - pad - 1
    for k in reversed(range(K)):
        h_prev = h_scr[k]
        x_k = x_ref[k]
        pre = _step_pre(x_k, h_prev, wx4_ref, wh4_ref, b4_ref, dtype)
        r, z, c, g_c = _pre_gates(pre, d_m)
        gcell_f32 = dh
        if (k + 1) % period == 0:
            gcell_f32 = gcell_f32 + dhs_ref[(k + 1) // period - 1
                                            ].astype(jnp.float32)
        if k == k_last:
            inj = jnp.where(in_last, 1.0, 0.0).astype(jnp.float32)
            gcell_f32 = gcell_f32 + inj * dhT_ref[:].astype(jnp.float32)
        gcell = gcell_f32.astype(dtype)
        if pad and k >= K - pad:
            # Pad steps are identity in the last chunk: cotangent passes
            # through untouched there; elsewhere they are regular steps.
            pass_through = jnp.where(in_last, 1.0, 0.0).astype(jnp.float32)
        dzs = gcell * (c - h_prev)
        dc = gcell * z * (1.0 - c * c)
        dz = dzs * z * (1.0 - z)
        dr = dc * g_c * r * (1.0 - r)
        dpre = jnp.concatenate([dr, dz, dc, dc * r], axis=-1)
        dh_step = ((gcell - gcell * z).astype(jnp.float32)
                   + jnp.dot(dpre, wh4_ref[:].T,
                             preferred_element_type=jnp.float32))
        dx_step = jnp.dot(dpre, wx4_ref[:].T,
                          preferred_element_type=jnp.float32)
        if pad and k >= K - pad:
            dh = pass_through * gcell_f32 + (1.0 - pass_through) * dh_step
            dx_ref[k] = ((1.0 - pass_through) * dx_step).astype(dtype)
            keep = 1.0 - pass_through
            dwx += keep * jnp.dot(x_k.T, dpre,
                                  preferred_element_type=jnp.float32)
            dwh += keep * jnp.dot(h_prev.T, dpre,
                                  preferred_element_type=jnp.float32)
            db += keep * jnp.sum(dpre.astype(jnp.float32), axis=0,
                                 keepdims=True)
        else:
            dh = dh_step
            dx_ref[k] = dx_step.astype(dtype)
            dwx += jnp.dot(x_k.T, dpre, preferred_element_type=jnp.float32)
            dwh += jnp.dot(h_prev.T, dpre,
                           preferred_element_type=jnp.float32)
            db += jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)

    dh_scr[:] = dh
    dwx_scr[:] = dwx
    db_scr[:] = db
    dwh_scr[:] = dwh

    @pl.when(tr == n_chunks - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dwx_tile_ref[0] = dwx_scr[:]
        db_tile_ref[0] = db_scr[:]
        dwh_tile_ref[0] = dwh_scr[:]


def _bwd_stride_call(x_tm, hbound, dhs, dhT, wx4, wh4, b4, period: int,
                     pad: int, dtype):
    Tp, B, d_in = x_tm.shape
    d_m = wh4.shape[0]
    bt = _block_b(B, _bt_cap(dtype))
    K = _stride_chunk(period)
    n_chunks = Tp // K
    S = K // period
    n_btiles = B // bt
    kernel = functools.partial(
        _bwd_stride_kernel, d_m=d_m, K=K, period=period, n_chunks=n_chunks,
        pad=pad, dtype=dtype)
    rev3 = lambda i, t: (n_chunks - 1 - t, i, 0)
    const = lambda i, t: (0, 0)
    dx, dh0, dwx_tiles, db_tiles, dwh_tiles = pl.pallas_call(
        kernel,
        grid=(B // bt, n_chunks),
        in_specs=[
            pl.BlockSpec((K, bt, d_in), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d_m), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, bt, d_m), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d_m), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, 4 * d_m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_m, 4 * d_m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * d_m), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, bt, d_in), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d_m), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, 4 * d_m), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * d_m), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_m, 4 * d_m), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, d_in), dtype),
            jax.ShapeDtypeStruct((B, d_m), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, d_in, 4 * d_m), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, 1, 4 * d_m), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, d_m, 4 * d_m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, d_m), jnp.float32),  # dh carry stays f32
            pltpu.VMEM((K, bt, d_m), dtype),     # recomputed in-chunk h
            pltpu.VMEM((d_in, 4 * d_m), jnp.float32),
            pltpu.VMEM((1, 4 * d_m), jnp.float32),
            pltpu.VMEM((d_m, 4 * d_m), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x_tm, hbound, dhs, dhT, wx4, wh4, b4)
    return (dx, dh0, jnp.sum(dwx_tiles, 0), jnp.sum(db_tiles, 0),
            jnp.sum(dwh_tiles, 0))


@functools.lru_cache(maxsize=None)
def _make_stride_core(period: int, dtype_name: str):
    """custom_vjp specialization of the strided-output scan."""
    dtype = jnp.dtype(dtype_name)
    K = _stride_chunk(period)

    def _fwd(x_tm, wx4, wh4, b4, h0):
        T = x_tm.shape[0]
        Tp = -(-T // K) * K
        pad = Tp - T
        x_ = jnp.pad(x_tm, ((0, pad), (0, 0), (0, 0))) if pad else x_tm
        call = functools.partial(
            _fwd_stride_kernel_entry, period=period, pad=pad, dtype=dtype)
        hs, hbound, hT = call(x_, wx4, wh4, b4, h0)
        return (hs[:T // period], hT), (x_, wx4, wh4, b4, hbound, T, pad)

    def _bwd(res, cts):
        x_, wx4, wh4, b4, hbound, T, pad = res
        dhs, dhT = cts
        S_pad = x_.shape[0] // period
        if S_pad != dhs.shape[0]:
            dhs = jnp.pad(dhs, ((0, S_pad - dhs.shape[0]), (0, 0), (0, 0)))
        dx, dh0, dwx4, db4, dwh4 = _bwd_stride_call(
            x_, hbound, dhs.astype(dtype), dhT.astype(dtype),
            wx4, wh4, b4, period, pad, dtype)
        d_m = wh4.shape[0]
        dwx4 = dwx4.at[:, 3 * d_m:].set(0.0)
        dwh4 = dwh4.at[:, 2 * d_m:3 * d_m].set(0.0)
        db4 = db4.at[:, 3 * d_m:].set(0.0)
        return (dx[:T], dwx4.astype(wx4.dtype), dwh4.astype(wh4.dtype),
                db4.astype(b4.dtype), dh0.astype(dtype))

    @jax.custom_vjp
    def core(x_tm, wx4, wh4, b4, h0):
        """x [T,B,d_in] (full sequences, no mask) -> (h_stride
        [T//period, B, dm] == h_seq[period-1::period], h_T [B, dm])."""
        return _fwd(x_tm, wx4, wh4, b4, h0)[0]

    core.defvjp(_fwd, _bwd)
    return core


def _fwd_stride_kernel_entry(x_, wx4, wh4, b4, h0, *, period, pad, dtype):
    """Pad-aware dispatch to the forward pallas_call (kept out of
    _fwd_stride_call so the pad constant reaches the kernel)."""
    Tp, B, d_in = x_.shape
    d_m = wh4.shape[0]
    bt = _block_b(B, _bt_cap(dtype))
    K = _stride_chunk(period)
    n_chunks = Tp // K
    S = K // period
    kernel = functools.partial(
        _fwd_stride_kernel, d_m=d_m, K=K, period=period, n_chunks=n_chunks,
        pad=pad, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // bt, n_chunks),
        in_specs=[
            pl.BlockSpec((K, bt, d_in), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, 4 * d_m), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_m, 4 * d_m), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * d_m), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d_m), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, bt, d_m), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d_m), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d_m), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp // period, B, d_m), dtype),
            jax.ShapeDtypeStruct((n_chunks, B, d_m), dtype),
            jax.ShapeDtypeStruct((B, d_m), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bt, d_m), dtype)],
        interpret=_INTERPRET,
    )(x_, wx4, wh4, b4, h0)


def pallas_gru_stride_tm(params: GRUParams, x_tm: jax.Array, period: int,
                         dtype=jnp.float32):
    """Strided-output TIME-MAJOR scan (full-mask fast path): emits only the
    rows the next HPMN layer consumes. x_tm [T,B,d_in] ->
    (h_stride [T//period, B, dm], h_T [B, dm]); h_stride ==
    pallas_gru_sequence_tm(...)[0][period-1::period] bit-exactly."""
    T, B, _ = x_tm.shape
    d_m = params.wh.shape[0]
    dtype = jnp.dtype(dtype)
    if period <= 1:
        hseq, hT = pallas_gru_sequence_tm(params, x_tm, None, None,
                                          dtype=dtype)
        return hseq, hT
    wx4, wh4, b4 = _pack_weights(params, dtype)
    h0 = jnp.zeros((B, d_m), dtype)
    return _make_stride_core(period, dtype.name)(
        x_tm.astype(dtype), wx4, wh4, b4, h0)


# ------------------------------------------------------------ public API --

def pallas_gru_sequence_tm(params: GRUParams, x_tm: jax.Array,
                           mask_tm: Optional[jax.Array] = None,
                           gate_scale_tm: Optional[jax.Array] = None,
                           h0: Optional[jax.Array] = None,
                           dtype=jnp.float32,
                           ) -> Tuple[jax.Array, jax.Array]:
    """TIME-MAJOR entry point (the fast path: models gather embeddings
    straight into [T,B,d] by transposing the int32 id arrays, so no
    activation transposes are ever materialized): x_tm [T,B,d_in] ->
    (h_seq [T,B,dm], h_T [B,dm])."""
    T, B, _ = x_tm.shape
    d_m = params.wh.shape[0]
    dtype = jnp.dtype(dtype)
    wx4, wh4, b4 = _pack_weights(params, dtype)
    has_mask = mask_tm is not None
    has_scale = gate_scale_tm is not None
    ones = jnp.ones((T, B), dtype)
    mask_tm = ones if mask_tm is None else mask_tm.astype(dtype)
    scale_tm = (ones if gate_scale_tm is None
                else gate_scale_tm.astype(dtype))
    h0 = jnp.zeros((B, d_m), dtype) if h0 is None else h0.astype(dtype)
    hseq = gru_scan_core(x_tm.astype(dtype), mask_tm, scale_tm,
                         wx4, wh4, b4, h0, has_mask, has_scale, dtype)
    return hseq, hseq[-1]


def pallas_gru_sequence(params: GRUParams, x: jax.Array,
                        mask: Optional[jax.Array] = None,
                        gate_scale: Optional[jax.Array] = None,
                        h0: Optional[jax.Array] = None,
                        ) -> Tuple[jax.Array, jax.Array]:
    """Batch-major drop-in replacement for ``ops.gru.gru_sequence``:
    x [B,T,d_in] -> (h_seq [B,T,dm], h_T [B,dm]). Pays two activation
    transposes; prefer the _tm entry point on the hot path."""
    hseq_tm, h_T = pallas_gru_sequence_tm(
        params, jnp.moveaxis(x, 0, 1),
        None if mask is None else mask.T,
        None if gate_scale is None else gate_scale.T, h0)
    return jnp.moveaxis(hseq_tm, 0, 1), h_T

"""Roofline / speed-of-light report for the hot ops (SURVEY.md §7 M6,
BASELINE.json:5 "speed-of-light" bar).

Calibrates the chip's ACHIEVED peaks (a big bf16 matmul for FLOP/s, a big
streaming multiply for HBM GB/s), then measures each hot op of the flagship
XLong step and reports its achieved TFLOP/s / GB/s as a fraction of those
peaks plus the resource that binds it. The sequential GRU scan is
latency/VPU-bound by construction (d_m=32: each of the T dependent steps is
a tiny matmul pair + a VPU gate chain — ARCHITECTURE.md §3), so its
roofline fractions are expected to be low; the per-grid-step latency row is
the honest figure of merit there.

Measurement protocol (the tunnel traps, CLAUDE.md + ARCHITECTURE.md §8):
each sample fuses k dependence-chained iterations of the op into ONE
dispatch (lax.scan) and the op time is the k-vs-2k dispatch DIFFERENCE over
k — the 3-5 ms per-dispatch relay overhead cancels exactly. Large operands
live on device ONCE and travel as jit ARGUMENTS (closures embed them in the
remote-compile request: HTTP 413); per-dispatch distinctness comes from a
tiny seed vector threaded into the math, because the relay dedups
byte-identical execution requests. Ends with a scalar float() pull
(block_until_ready lies here).

Usage:  python tools/roofline.py [--json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, T, D_IN, D_M = 512, 1000, 32, 32  # flagship XLong shapes
V_ITEM, D_EMB = 50000, 16
N_ROWS = B * T  # cotangent rows per step
K = 8  # fused iterations per dispatch

_seed_counter = iter(range(10 ** 6))


def measure(step, carry_init, base, k=K, reps=3):
    """Per-iteration seconds of ``carry = step(carry, base, seed_i)`` with
    dispatch overhead cancelled: one dispatch scans k chained iterations,
    one scans 2k; return (t_2k - t_k) / k. ``step`` must thread both the
    carry (defeats DCE/reordering) and the seed (defeats relay dedup)."""
    def run(carry, base, seeds):
        out = jax.lax.scan(lambda c, s: (step(c, base, s), 0.0), carry,
                           seeds)[0]
        return jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32)

    jrun = jax.jit(run)

    def once(kk):
        s0 = 1000.0 * next(_seed_counter)
        seeds = jnp.arange(kk, dtype=jnp.float32) + s0
        return float(jrun(carry_init, base, seeds))

    def timed(kk):
        once(kk), once(kk)  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            once(kk)
        return (time.time() - t0) / reps

    t1, t2 = timed(k), timed(2 * k)
    return max(t2 - t1, 1e-9) / k


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from hpmn_tpu.ops.gru import gru_init
    from hpmn_tpu.ops.pallas_gru import (UNROLL, _bt_cap,
                                         pallas_gru_sequence_tm)

    rng = np.random.default_rng(0)
    rows = []

    def add(name, t_s, flops, bytes_, bound, note=""):
        rows.append({"op": name, "ms": t_s * 1e3, "flops": flops,
                     "bytes": bytes_, "bound": bound, "note": note})

    # ---- calibration 1: MXU peak via chained 4096^3 bf16 matmuls --------
    n = 4096
    x_mm = jnp.asarray(rng.standard_normal((n, n)) / n, jnp.bfloat16)
    c0 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    t_mm = measure(lambda c, b, s: c @ b + s.astype(jnp.bfloat16) * 1e-8,
                   c0, x_mm)
    peak_flops = 2 * n ** 3 / t_mm
    add("mxu_calibration_4096^3", t_mm, 2 * n ** 3, 3 * n * n * 2, "MXU",
        "defines 100% peak FLOP/s")

    # ---- calibration 2: HBM peak via chained 256MB multiplies -----------
    m = 64 * 1024 * 1024
    big = jnp.asarray(rng.standard_normal(m), jnp.float32)
    t_cp = measure(lambda c, b, s: c * (1.000001 + s * 1e-12), big,
                   jnp.zeros(()))
    peak_bw = 2 * 4 * m / t_cp
    add("hbm_calibration_copy", t_cp, 0.0, 2 * 4 * m, "HBM stream",
        "defines 100% peak GB/s — an ACHIEVED copy bound, ~2x below the "
        "v5e datasheet (~819 GB/s), so fused ops that overlap reads/"
        "writes or hold operands VMEM-resident can legitimately exceed "
        "100% on this column (e.g. bst_attn_target_query, whose fwd+bwd "
        "re-reads of k,v stay in VMEM)")

    # ---- layer-1 GRU scan (Pallas bf16), forward -----------------------
    params = gru_init(jax.random.key(0), D_IN, D_M)
    x_tm = jnp.asarray(rng.standard_normal((T, B, D_IN)), jnp.bfloat16)

    def scan_fwd(c, b, s):
        # chain + seed travel through h0 (tiny), so x is read pure from HBM
        h0 = jnp.broadcast_to(c, (B, D_M)) * 0.9 + s.astype(jnp.bfloat16) * 1e-6
        return pallas_gru_sequence_tm(params, b, h0=h0,
                                      dtype=jnp.bfloat16)[0][-1, 0, :]

    t = measure(scan_fwd, jnp.zeros((D_M,), jnp.bfloat16), x_tm, k=4)
    # matmul FLOPs only: per step/example one [*,d_in]x[d_in,4dm] and one
    # [*,dm]x[dm,4dm] lane-packed pair (the VPU gate chain is what actually
    # binds; it does not count as MXU FLOPs).
    flops = T * B * 2 * (D_IN + D_M) * 4 * D_M
    bytes_ = T * B * (D_IN * 2 + D_M * 2)  # read x (bf16) + write h_seq
    bt = min(_bt_cap(jnp.bfloat16), B)
    n_steps = (B // bt) * T  # sequential TIME steps across batch tiles
    n_grid = (B // bt) * (T // UNROLL)  # Pallas grid iterations (8 steps ea.)
    add("gru_scan_fwd", t, flops, bytes_, "latency/VPU",
        f"{t / n_steps * 1e6:.2f} us/time-step, "
        f"{t / n_grid * 1e6:.2f} us/grid-iter ({n_steps} sequential steps "
        f"in {n_grid} grid iterations; a dependence chain has no "
        "throughput roofline)")

    # ---- layer-1 GRU scan, fwd+bwd --------------------------------------
    def loss(x, h0):
        return jnp.sum(pallas_gru_sequence_tm(
            params, x, h0=h0, dtype=jnp.bfloat16)[0].astype(jnp.float32))

    gfn = jax.grad(loss, argnums=0)

    def scan_grad(c, b, s):
        h0 = jnp.broadcast_to(c, (B, D_M)) * 0.9 + s.astype(jnp.bfloat16) * 1e-6
        return gfn(b, h0)[0, 0, :D_M]

    t = measure(scan_grad, jnp.zeros((D_M,), jnp.bfloat16), x_tm, k=4)
    add("gru_scan_fwd+bwd", t, 3 * flops, 3 * bytes_, "latency/VPU",
        "bwd recomputes gates in-kernel (one extra stream each way)")

    # ---- embedding gather (item-table rows for one step) ----------------
    table = jnp.asarray(rng.standard_normal((V_ITEM, D_EMB)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V_ITEM, N_ROWS), jnp.int32)

    def gather(c, b, s):
        t_, i_ = b
        r = (i_ + c + s.astype(jnp.int32)) % V_ITEM
        return t_[r].astype(jnp.bfloat16).sum().astype(jnp.int32) % 7

    t = measure(gather, jnp.int32(0), (table, ids))
    add("emb_gather_cast", t, 0.0, N_ROWS * (D_EMB * 4 + D_EMB * 2),
        "HBM gather",
        "useful bytes; each 64B f32 row occupies a 512B HBM tile, so "
        "physical traffic is up to 8x the read term")

    # ---- embedding gradient scatter-add (the step's floor) --------------
    cot = jnp.asarray(rng.standard_normal((N_ROWS, D_EMB)) * 1e-3,
                      jnp.float32)

    def scatter(acc, b, s):
        i_, c_ = b
        return acc.at[(i_ + s.astype(jnp.int32)) % V_ITEM].add(c_)

    t = measure(scatter, jnp.zeros((V_ITEM, D_EMB), jnp.float32),
                (ids, cot), k=4)
    add("emb_grad_scatter", t, 0.0,
        N_ROWS * D_EMB * 4 + 2 * V_ITEM * D_EMB * 4, "sort throughput",
        "XLA lowers to sort+segment; measured platform floor "
        "(ARCHITECTURE.md §4: 8 routes tried, none beat it)")

    # ---- BST attention (XLong lifelong shapes) ---------------------------
    # VERDICT r2 weak #1: the newest family's hot op gets the same
    # speed-of-light accounting as the GRU scan. Shapes: xlong_bst config
    # (shipped B=256, H=2, S=1001, dh=16). The PRODUCTION final block
    # computes only the target-position query ([B,H,1,S] scores — O(S));
    # the chunked full-query op remains the inner-block path for
    # bst_blocks > 1.
    from hpmn_tpu.models.extra_baselines import (_chunked_attention,
                                                 _dense_attention)
    Ba, H, S, dh, chunk = 256, 2, 1001, 16, 128
    qkv = jnp.asarray(rng.standard_normal((3, Ba, H, S, dh)), jnp.float32)
    kbias = jnp.zeros((Ba, S), jnp.float32)

    def tq_loss(q1, k_, v_):
        return jnp.sum(_dense_attention(q1, k_, v_, kbias))

    gtq = jax.grad(tq_loss, argnums=(0, 1, 2))

    def tq_grad(c, b, s):
        q1 = b[0][:, :, -1:, :] + c * 1e-6 + s * 1e-9
        return gtq(q1, b[1], b[2])[1][0, 0, 0, :1]

    t = measure(tq_grad, jnp.zeros((1,), jnp.float32), qkv, k=4)
    tq_flops = 3 * 4 * Ba * H * 1 * S * dh  # fwd+bwd, one query row
    tq_bytes = 3 * (2 * Ba * H * S * dh * 4 + Ba * H * S * 4)
    add("bst_attn_target_query", t, tq_flops, tq_bytes, "HBM stream",
        "the production final-block op (fwd+bwd): reads k,v once; "
        "O(S) not O(S^2)")

    def attn_fwd(c, b, s):
        q = b[0] + c * 1e-6 + s * 1e-9  # thread chain+seed through q
        return _chunked_attention(q, b[1], b[2], kbias, chunk)[0, 0, 0, :1]

    t = measure(attn_fwd, jnp.zeros((1,), jnp.float32), qkv, k=4)
    attn_flops = 4 * Ba * H * S * S * dh  # qk^T + pv, 2 MACs each
    attn_bytes = 4 * Ba * H * S * dh * 4  # read q,k,v + write out (useful)
    add("bst_attn_chunk_fwd", t, attn_flops, attn_bytes, "HBM carry streams",
        "XLA online-softmax key-chunk scan: the S-sized (m,l,acc) carry "
        "re-streams HBM every chunk iteration; useful-bytes GB/s "
        "understates physical traffic by ~2x nk")

    def attn_loss(q, k_, v_):
        return jnp.sum(_chunked_attention(q, k_, v_, kbias, chunk))

    gattn = jax.grad(attn_loss, argnums=(0, 1, 2))

    def attn_grad(c, b, s):
        q = b[0] + c * 1e-6 + s * 1e-9
        return gattn(q, b[1], b[2])[0][0, 0, 0, :1]

    t = measure(attn_grad, jnp.zeros((1,), jnp.float32), qkv, k=4)
    add("bst_attn_chunk_fwd+bwd", t, 3 * attn_flops, 3 * attn_bytes,
        "HBM carry streams", "reverse scan saves/re-reads per-chunk state")

    # ---- report ----------------------------------------------------------
    for r in rows:
        t_s = r["ms"] / 1e3
        r["tflops"] = r["flops"] / t_s / 1e12
        r["gbps"] = r["bytes"] / t_s / 1e9
        r["pct_peak_flops"] = 100 * r["flops"] / t_s / peak_flops
        r["pct_peak_bw"] = 100 * r["bytes"] / t_s / peak_bw
    peaks = {"peak_tflops_bf16": peak_flops / 1e12,
             "peak_hbm_gbps": peak_bw / 1e9}
    if args.json:
        print(json.dumps({"peaks": peaks, "rows": rows}))
        return
    print(f"calibrated peaks: {peaks['peak_tflops_bf16']:.1f} bf16 TFLOP/s, "
          f"{peaks['peak_hbm_gbps']:.0f} GB/s HBM (dispatch overhead "
          "cancelled by k-vs-2k differencing)")
    print(f"{'op':26s} {'ms':>8s} {'TFLOP/s':>8s} {'GB/s':>7s} "
          f"{'%FLOPs':>7s} {'%BW':>6s}  bound")
    for r in rows:
        print(f"{r['op']:26s} {r['ms']:8.3f} {r['tflops']:8.2f} "
              f"{r['gbps']:7.1f} {r['pct_peak_flops']:7.2f} "
              f"{r['pct_peak_bw']:6.1f}  {r['bound']}")
        if r["note"]:
            print(f"{'':26s} └ {r['note']}")


if __name__ == "__main__":
    main()

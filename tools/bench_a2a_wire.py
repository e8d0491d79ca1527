"""Measure the embedding exchange's collective traffic from compiled HLO.

On-chip interconnect counters are not reachable through this machine's
tunnel, so the wire volume is measured where it is exact and
hardware-independent: compile each lookup mode for an 8-device
(2 data x 4 model) mesh and sum the per-device bytes flowing through every
collective op in the optimized HLO (all-to-all / all-gather / all-reduce /
reduce-scatter / collective-permute). SPMD-compiled shapes are already
per-device, so operand bytes == what one shard puts on the wire per call
(ring all-reduce moves ~2x its operand; noted in the table).

Derivation this verifies (ARCHITECTURE §5): for a per-data-replica batch of
N ids, d-float rows, S model shards, capacity factor f:

  psum             per-shard wire ~ 2*N*d   (ring all-reduce on [N, d])
  a2a (replicated) buckets 2*f*(N/S)*d ... but the re-replicating
                   all_gather moves (S-1)/S*N*d — same order as psum
  a2a + batch_over_model  2*f*(N/S)*d  — the real bucketed exchange:
                   queries ride as int32 ids (1/d of row bytes), answers
                   and cotangents as [S, C, d] buckets, no all_gather

Usage: python tools/bench_a2a_wire.py [--batch 512] [--seq 100] [--emb 16]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from hpmn_tpu.configs import get_config  # noqa: E402
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays  # noqa: E402
from hpmn_tpu.parallel import (init_sharded_model, make_mesh,  # noqa: E402
                               make_shardmap_steps, pad_vocab,
                               param_shardings, shard_batch)

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}
_COLL = ("all-to-all", "all-gather", "all-reduce", "reduce-scatter",
         "collective-permute")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _bytes_of_shapes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"%?[\w.\-]+ = (.*?) (all-to-all|all-gather|all-reduce|reduce-scatter|"
    r"collective-permute)")
_COMP_RE = re.compile(r"^(?:ENTRY )?%?([\w.\-]+) \(.*\) -> .* \{")
_BRANCH_RE = re.compile(r"branch_computations=\{([^}]*)\}")


def _split_computations(hlo: str) -> dict:
    comps, name, buf = {}, None, []
    for line in hlo.splitlines():
        m = _COMP_RE.match(line.strip())
        if m:
            name, buf = m.group(1), []
        elif line.strip() == "}" and name is not None:
            comps[name] = buf
            name = None
        elif name is not None:
            buf.append(line.strip())
    return comps


def collective_bytes(hlo: str) -> dict:
    """Per-device operand bytes through each collective kind, from the
    optimized HLO. The overflow-fallback `cond` branch is compiled into the
    module but never executes when capacity holds; conditionals are parsed
    and only the runtime-live branch counted (live = the branch containing
    the all-to-all exchange, else the cheaper one), with the dead branches'
    bytes reported separately as `fallback`. The RESULT shape of each
    collective is counted once — for these ops result bytes == operand
    bytes moved per device per call. (Collectives inside while bodies would
    be undercounted — none of the measured configs put collectives in
    loops at k=1.)"""
    comps = _split_computations(hlo)

    def comp_stats(lines):
        st = {k: 0 for k in _COLL}
        st["calls"] = 0
        for s in lines:
            m = _INSTR_RE.match(s)
            if not m or "-done" in s.split("(")[0]:
                continue
            st[m.group(2)] += _bytes_of_shapes(m.group(1))
            st["calls"] += 1
        return st

    stats = {n: comp_stats(ls) for n, ls in comps.items()}
    dead = set()
    fallback_bytes = 0
    for lines in comps.values():
        for s in lines:
            if " conditional(" not in s:
                continue
            b = _BRANCH_RE.search(s)
            if not b:
                continue
            names = [x.strip().lstrip("%") for x in b.group(1).split(",")]
            known = [n for n in names if n in stats]
            if len(known) < 2:
                continue
            with_a2a = [n for n in known if stats[n]["all-to-all"] > 0]
            live = (with_a2a[0] if len(with_a2a) == 1 else
                    min(known, key=lambda n: sum(stats[n][k]
                                                 for k in _COLL)))
            for n in known:
                if n != live:
                    dead.add(n)
                    fallback_bytes += sum(stats[n][k] for k in _COLL)
    out = {k: 0 for k in _COLL}
    out["calls"] = 0
    for n, st in stats.items():
        if n in dead:
            continue
        for k in _COLL:
            out[k] += st[k]
        out["calls"] += st["calls"]
    out["fallback"] = fallback_bytes
    return out


def measure(mode: str, batch_over_model: bool, batch_size: int, seq: int,
            emb_dim: int, cap_factor: float) -> dict:
    mesh = make_mesh(model_parallel=4, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    cfg.model.emb_dim = emb_dim
    cfg.train.batch_size = batch_size
    cfg.train.steps_per_dispatch = 1
    cfg.mesh.embedding_mode = mode
    cfg.mesh.batch_over_model = batch_over_model
    cfg.mesh.a2a_capacity_factor = cap_factor
    n_items, n_cats = pad_vocab(50000, 4), pad_vocab(800, 4)
    batch = to_device_arrays(
        dummy_batch(batch_size, seq, n_items, n_cats, seed=0))
    tx = optax.sgd(1e-2)
    params = init_sharded_model(jax.random.key(0), cfg, n_items, n_cats,
                                mesh)
    opt = jax.device_put(tx.init(params),
                         param_shardings(mesh, tx.init(params)))
    step = make_shardmap_steps(cfg, tx, mesh)[0](params, opt)
    over = ("data", "model") if batch_over_model else ("data",)
    sbatch = shard_batch(mesh, batch, over=over)
    hlo = step.lower(params, opt, sbatch).compile().as_text()
    return collective_bytes(hlo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq", type=int, default=100)
    ap.add_argument("--emb", type=int, default=16)
    ap.add_argument("--cap_factor", type=float, default=2.0)
    args = ap.parse_args()

    # Per-data-replica id count (item+cat seq ids + targets), d floats/row.
    n_ids = (args.batch // 2) * (args.seq + 1) * 2
    print(f"shape: B={args.batch} (2 data shards), T={args.seq}, "
          f"d={args.emb}, S=4 model shards; per-data-replica ids "
          f"N={n_ids}; N*d*4B = {n_ids * args.emb * 4 / 1e6:.1f} MB")
    modes = [("psum", False), ("a2a", False), ("a2a", True)]
    # Bytes a device physically SENDS per operand byte, ring algorithms,
    # S=4 model shards: all-reduce 2(S-1)/S, all-gather/all-to-all/
    # reduce-scatter (S-1)/S (own block stays), permute 1.
    Sm = 4
    wire_f = {"all-reduce": 2 * (Sm - 1) / Sm, "all-gather": (Sm - 1) / Sm,
              "all-to-all": (Sm - 1) / Sm, "reduce-scatter": (Sm - 1) / Sm,
              "collective-permute": 1.0}
    rows = []
    for mode, bom in modes:
        r = measure(mode, bom, args.batch, args.seq, args.emb,
                    args.cap_factor)
        name = f"{mode}{'+batch_over_model' if bom else ''}"
        total = sum(r[k] for k in _COLL)
        wire = sum(r[k] * wire_f[k] for k in _COLL)
        rows.append((name, r, total, wire))
        parts = ", ".join(f"{k}={r[k] / 1e6:.2f}MB" for k in _COLL if r[k])
        print(f"{name:24s} collective operand bytes/device/step: "
              f"{total / 1e6:8.2f} MB, ring-wire sent {wire / 1e6:8.2f} MB"
              f"  ({r['calls']} ops: {parts}; overflow-fallback branch, "
              f"normally dead: {r['fallback'] / 1e6:.2f}MB)")
    base = rows[0][3]
    for name, _, _, wire in rows[1:]:
        print(f"{name:24s} ring-wire vs psum: {wire / base:.3f}x")


if __name__ == "__main__":
    main()

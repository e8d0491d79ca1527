"""Benchmark: HPMN full-hierarchy training throughput on XLong shapes.

Metric (BASELINE.json:2,9): examples/s/chip, length-1000 lifelong sequences,
full train step (fwd + bwd + Adam) on synthetic XLong-schema data.

``vs_baseline`` is measured against the reference's computational structure
— the masked single-scan over T carrying all L slots (what the TF-1.x
while_loop graph computes, SURVEY.md §3.3) — run on the same chip in the
same process. The speedup is the product of the hierarchical scan
decomposition (layer l does T/period^l steps instead of T, [B:5]) and the
fused Pallas kernels; the faster of the Pallas / XLA hierarchical paths is
reported as the headline value (both are printed on stderr).

Distinct input batches are cycled to defeat request-level caching in the
execution tunnel (identical dispatches measured impossibly fast).

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import numpy as np
import optax


def _make_batches(cfg, spec, n_batches, batch_size):
    from hpmn_tpu.data.schema import batch_from_numpy, to_device_arrays
    from hpmn_tpu.data.synthetic import make_ctr_dataset

    arrays = make_ctr_dataset(spec, n_batches * batch_size, seed=0,
                              min_len_frac=1.0)  # full-length sequences
    arrays["seq_mask"][:] = 1.0
    return [
        to_device_arrays(batch_from_numpy(
            arrays, np.arange(i * batch_size, (i + 1) * batch_size)))
        for i in range(n_batches)
    ]


def _bench_train_step(cfg, params, batches, n_dispatch=3, warmup=2, k=32):
    """Times the production driver path: ``make_multistep_train`` with
    ``train.steps_per_dispatch = k`` (k fused steps per dispatch via
    lax.scan — what `train.py` runs when the config sets it). Measures
    n_dispatch * k steps; both the oracle baseline and the headline go
    through the same harness so the ratio stays structural."""
    import jax.numpy as jnp

    from hpmn_tpu.train.train import make_multistep_train

    tx = optax.adam(cfg.train.lr)
    opt_state = tx.init(params)
    cfg.train.steps_per_dispatch = k
    step = make_multistep_train(cfg, tx)
    stacks = [jax.tree.map(lambda *xs: jnp.stack(xs), *[
        batches[(i + j) % len(batches)] for j in range(k)])
        for i in range(len(batches))]
    for i in range(warmup):
        params, opt_state, m = step(params, opt_state, stacks[i % len(stacks)])
    # NB: jax.block_until_ready does NOT reliably synchronize through the
    # axon execution tunnel (it returns at dispatch, yielding impossibly
    # fast timings); a scalar device->host pull is a real synchronization.
    float(m["loss"])
    t0 = time.time()
    for i in range(n_dispatch):
        params, opt_state, m = step(params, opt_state, stacks[i % len(stacks)])
    float(m["loss"])
    dt = (time.time() - t0) / (n_dispatch * k)
    return batches[0].batch_size / dt


def _probe_backend(timeout_s: int = 600) -> None:
    """Fail loudly if device init hangs: the tunneled-TPU grant can wedge
    (observed 2026-08-18: every process stuck in backend init after a
    killed mid-dispatch run). A subprocess probe with a deadline turns a
    silent multi-hour hang into one diagnosable JSON error line."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            check=True, capture_output=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "examples_per_s_per_chip", "value": None,
            "unit": "examples/s/chip", "vs_baseline": None,
            "error": f"device backend init exceeded {timeout_s}s "
                     "(TPU tunnel unreachable)"}))
        sys.exit(1)
    except subprocess.CalledProcessError:
        pass  # probe env oddity; let the real init try below


def _run_gate() -> None:
    """--gate: run the on-chip compiled-numerics gate (tools/verify_onchip.py)
    and the reduced quality gate (tools/quality_gate.py — one model per
    tier on the planted long-range task, VERDICT r4 next #5) before
    benchmarking; fail LOUDLY if the Pallas kernels drifted from the XLA
    anchor or the tier AUCs fell through their floors — a regression must
    produce a red artifact, not a quietly-faster number."""
    import subprocess

    def run_leg(script, label, timeout):
        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), "tools", script)],
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            # A wedged gate must still honor the one-JSON-line contract.
            print(json.dumps({
                "metric": "xlong_hpmn_train_examples_per_sec_per_chip",
                "value": None, "unit": "examples/s/chip",
                "vs_baseline": None,
                "error": f"{label} TIMED OUT after {timeout}s "
                         f"(tools/{script} hung — tunnel wedged?)"}))
            sys.exit(1)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            print(json.dumps({
                "metric": "xlong_hpmn_train_examples_per_sec_per_chip",
                "value": None, "unit": "examples/s/chip",
                "vs_baseline": None,
                "error": f"{label} FAILED (tools/{script})",
                "gate": (r.stdout or "").strip()[-2000:]}))
            sys.exit(1)
        print(f"# {label} passed: {(r.stdout or '').strip()[-500:]}",
              file=sys.stderr)

    run_leg("verify_onchip.py", "on-chip numerics gate", 3600)
    run_leg("quality_gate.py", "quality gate", 3600)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", action="store_true",
                    help="run tools/verify_onchip.py first; fail loudly")
    args = ap.parse_args()
    _probe_backend()
    if args.gate:
        _run_gate()
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.synthetic import XLONG
    from hpmn_tpu.models import init_model

    cfg = get_config("xlong_hpmn")
    batch_size = 512
    cfg.train.batch_size = batch_size
    # The driver config's FULL objective, incl. l2_weight: measured free
    # (+-0.4 ms noise, tools/bench_breakdown.py) — the headline is the
    # throughput of the config users actually train (VERDICT r1 weak #2).
    batches = _make_batches(cfg, XLONG, 4, batch_size)
    params = init_model(jax.random.key(0), cfg, XLONG.n_items, XLONG.n_cats)

    results = {}
    # Reference-structure baseline: masked single scan (oracle).
    cfg.model.use_hierarchical_scan = False
    cfg.model.use_pallas = False
    results["oracle_masked_scan"] = _bench_train_step(cfg, params, batches,
                                                      n_dispatch=3)
    # Headline: hierarchical scans + fused Pallas kernels, bf16 VPU chain
    # (full sequences: mask statically elided; MXU accumulates f32).
    cfg.model.use_hierarchical_scan = True
    cfg.model.use_pallas = True
    cfg.model.assume_full_mask = True
    cfg.model.scan_dtype = "bfloat16"
    results["hierarchical_pallas_bf16"] = _bench_train_step(cfg, params,
                                                            batches)
    # Print the driver's JSON line as soon as the required measurements
    # exist (compiles over the execution tunnel are slow; a timeout later
    # must not lose the result).
    best = results["hierarchical_pallas_bf16"]
    print(json.dumps({
        "metric": "xlong_hpmn_train_examples_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(best / results["oracle_masked_scan"], 3),
    }), flush=True)

    # Extra detail (stderr): f32 Pallas and plain-XLA hierarchical paths.
    cfg.model.scan_dtype = "float32"
    results["hierarchical_pallas_f32"] = _bench_train_step(cfg, params,
                                                           batches)
    cfg.model.use_pallas = False
    results["hierarchical_xla"] = _bench_train_step(cfg, params, batches)
    for k, v in results.items():
        print(f"# {k}: {v:,.0f} examples/s/chip", file=sys.stderr)


if __name__ == "__main__":
    main()

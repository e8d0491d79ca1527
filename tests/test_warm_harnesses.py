"""Keep the environment-blocked measurement harnesses warm (VERDICT r4
next #8): the 1->N-host scaling bench must stay runnable against the
current stack so the day real multi-chip hardware appears, the measurement
is a command, not a migration. (The real-data loaders' warm test lives in
tests/test_data.py::test_real_data_end_to_end.)"""

import json
import os
import subprocess
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "bench_scaling.py")


def _run(args):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, _TOOL, "--force_cpu",
                        "--per_device_batch", "4", "--steps", "2"] + args,
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.heavy
def test_bench_scaling_dp_harness_runs():
    out = _run(["--sizes", "1,2"])
    assert out["metric"] == "dp_weak_scaling"
    assert set(out["sizes"]) == {"1", "2"}
    for row in out["sizes"].values():
        assert row["examples_per_sec"] > 0


@pytest.mark.heavy
def test_bench_scaling_tp_bom_leg_runs():
    """The shipped TP layout (a2a + batch_over_model, the r5 default) rides
    the same harness."""
    out = _run(["--sizes", "2", "--model_parallel", "2"])
    assert out["embedding_mode"] == "a2a"
    assert out["batch_over_model"] is True
    assert out["sizes"]["2"]["examples_per_sec"] > 0


@pytest.mark.heavy
def test_bench_eval_multihost_harness_runs():
    """The multi-host eval-throughput bench (tools/bench_eval.py
    --processes N — the measurement for VERDICT r4 next #1) spawns real
    OS processes under jax.distributed and must stay green against the
    current stack; identical metrics across k are asserted inside
    evaluate() equality tests, here we check the harness itself."""
    tool = os.path.join(os.path.dirname(_TOOL), "bench_eval.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, tool, "--processes", "2", "--config", "amazon_hpmn",
         "--ks", "1,2", "--n_examples", "4000", "--repeats", "1"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    out = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert out["processes"] == 2
    assert out["k1_ex_per_sec"] > 0 and out["k2_ex_per_sec"] > 0

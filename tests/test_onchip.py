"""Opt-in on-chip gates (real TPU, compiled kernels — not interpret mode).

The CPU suite forces the fake-device platform (conftest.py), so these run
the gates in a SUBPROCESS with the machine's real backend. Opt in with

    HPMN_TPU_TESTS=1 python -m pytest tests/test_onchip.py -m tpu -q

(kept out of default runs: each gate costs minutes of chip time and the
suite must stay runnable on CPU-only machines).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

requires_tpu = pytest.mark.skipif(
    os.environ.get("HPMN_TPU_TESTS") != "1",
    reason="set HPMN_TPU_TESTS=1 to run on-chip gates (uses the real TPU)")


@pytest.mark.tpu
@pytest.mark.heavy
@requires_tpu
def test_onchip_kernel_numerics_gate():
    """tools/verify_onchip.py passes on the real backend (Pallas compiled
    noise <= 2x XLA's own, truth-anchored — see the tool's docstring)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the machine's real backend win
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_onchip.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["pass"], result
    assert result["platform"] != "cpu"  # the point is the real chip

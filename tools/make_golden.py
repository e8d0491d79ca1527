"""Regenerate the golden fixed-seed metrics for the regression test
(tests/test_train.py::test_golden_fixed_seed_trajectory). Run on CPU so the
numbers are hardware-independent:

    python tools/make_golden.py
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from tests.test_train import GOLDEN_PATH, _small_cfg
    from hpmn_tpu.train.train import train

    cfg = _small_cfg()
    res = train(cfg, log=print)
    got = {"best_val_auc": res["best_val_auc"],
           "test_auc": res["test"]["auc"],
           "test_log_loss": res["test"]["log_loss"]}
    with open(GOLDEN_PATH, "w") as f:
        json.dump(got, f, indent=2)
    print(f"wrote {GOLDEN_PATH}: {got}")


if __name__ == "__main__":
    main()

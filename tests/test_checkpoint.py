"""Checkpoint round-trip: orbax save/restore mid-run resumes identically
(SURVEY.md §4 item 6, §5.4)."""

import chex
import jax
import numpy as np
import optax
import pytest

from hpmn_tpu.configs import get_config
from hpmn_tpu.data import DataLoader, make_ctr_dataset
from hpmn_tpu.data.synthetic import DatasetSpec
from hpmn_tpu.models import init_model
from hpmn_tpu.train.checkpoint import CheckpointManager
from hpmn_tpu.train.train import make_train_step

SPEC = DatasetSpec("tiny", seq_len=12, n_items=150, n_cats=15, n_users=40)


def _run_steps(step_fn, params, opt_state, loader, n):
    it = iter(loader)
    for _ in range(n):
        params, opt_state, m = step_fn(params, opt_state, next(it))
    return params, opt_state, m


@pytest.fixture
def setup():
    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    arrays = make_ctr_dataset(SPEC, 200, seed=3)
    params = init_model(jax.random.key(0), cfg, SPEC.n_items, SPEC.n_cats)
    tx = optax.adam(1e-3)
    return cfg, arrays, params, tx


def test_save_restore_resumes_identically(setup, tmp_path):
    cfg, arrays, params, tx = setup
    step_fn = make_train_step(cfg, tx)

    # Uninterrupted run: 6 steps.
    loader_a = DataLoader(arrays, batch_size=16, seed=5)
    pa, oa, _ = _run_steps(step_fn, params, tx.init(params), loader_a, 6)

    # Interrupted run: 3 steps, checkpoint, "crash", restore, 3 more.
    loader_b = DataLoader(arrays, batch_size=16, seed=5)
    pb, ob, _ = _run_steps(step_fn, params, tx.init(params), loader_b, 3)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep_best_k=2)
    mngr.save(3, pb, ob, loader_b.state_dict(), {"val_auc": 0.5})
    mngr.close()

    mngr2 = CheckpointManager(str(tmp_path / "ckpt"), keep_best_k=2)
    template = {"params": params, "opt_state": tx.init(params),
                "loader": loader_b.state_dict(), "step": 0}
    restored = mngr2.restore(template=template)
    assert restored["step"] == 3
    loader_c = DataLoader(arrays, batch_size=16, seed=5)
    loader_c.load_state_dict(restored["loader"])
    pc, oc, _ = _run_steps(step_fn, restored["params"],
                           restored["opt_state"], loader_c, 3)
    chex.assert_trees_all_close(jax.device_get(pa), jax.device_get(pc),
                                atol=1e-6)
    mngr2.close()


def test_restore_legacy_loader_state(setup, tmp_path):
    """Checkpoints written before the loader state gained 'global_batch'
    (a 3-key loader dict) must still restore: orbax rejects the structure
    mismatch, and CheckpointManager retries with the legacy shape;
    DataLoader.load_state_dict defaults the missing field."""
    cfg, arrays, params, tx = setup
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    legacy_loader = {"epoch": 1, "step": 4, "seed": 5}  # pre-upgrade shape
    mngr.save(3, params, tx.init(params), legacy_loader, {"val_auc": 0.5})
    mngr.close()

    loader = DataLoader(arrays, batch_size=16, seed=0)
    mngr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored = mngr2.restore(template={
        "params": params, "opt_state": tx.init(params),
        "loader": loader.state_dict(), "step": 0})
    mngr2.close()
    assert restored["step"] == 3
    loader.load_state_dict(restored["loader"])
    assert (loader.epoch, loader.step, loader.seed) == (1, 4, 5)


def test_async_checkpoint_snapshot_isolation(setup, tmp_path):
    """async_checkpointing=True: save() returns before the disk write
    commits, yet the snapshot reflects the state AT save time — mutating
    params right after save must not corrupt it (orbax copies device
    buffers to host synchronously), and restore barriers on the write."""
    cfg, arrays, params, tx = setup
    step_fn = make_train_step(cfg, tx)
    loader = DataLoader(arrays, batch_size=16, seed=5)
    p3, o3, _ = _run_steps(step_fn, params, tx.init(params), loader, 3)

    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep_best_k=2,
                             async_checkpointing=True)
    mngr.save(3, p3, o3, loader.state_dict(), {"val_auc": 0.5})
    # keep training immediately — the in-flight write must not observe it
    p6, o6, _ = _run_steps(step_fn, p3, o3, loader, 3)

    template = {"params": params, "opt_state": tx.init(params),
                "loader": loader.state_dict(), "step": 0}
    restored = mngr.restore(template=template)
    assert restored["step"] == 3
    chex.assert_trees_all_close(jax.device_get(restored["params"]),
                                jax.device_get(p3), atol=0)
    mngr.save(6, p6, o6, loader.state_dict(), {"val_auc": 0.6})
    mngr.close()  # barriers on the in-flight write

    mngr2 = CheckpointManager(str(tmp_path / "ckpt"), keep_best_k=2)
    assert mngr2.latest_step() == 6
    assert mngr2.best_step() == 6
    mngr2.close()


@pytest.mark.heavy
def test_train_resume_continues_from_restored_step(tmp_path, monkeypatch):
    """A preempted run must resume AT the restored step, not restart the
    whole budget (and not re-save at already-used step numbers, which orbax
    silently skips)."""
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.train.train import train

    cfg = get_config("amazon_hpmn")
    cfg.n_examples = 400
    cfg.model.hpmn_layers = 1
    cfg.train.batch_size = 16
    cfg.train.steps_per_dispatch = 1  # step-exact resume (config ships k=64)
    cfg.eval_steps_per_dispatch = 1  # pin (config ships auto)
    cfg.train.max_steps = 6
    cfg.train.eval_every = 3
    cfg.train.log_every = 1000
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    logs = []
    train(cfg, log=logs.append)

    # "Preempted" restart with a LARGER budget: must resume at 6, train only
    # the remaining 6 steps, and its evals continue past the old ones.
    cfg2 = get_config("amazon_hpmn")
    cfg2.n_examples = 400
    cfg2.model.hpmn_layers = 1
    cfg2.train.batch_size = 16
    cfg2.train.steps_per_dispatch = 1  # step-exact resume (config ships k=64)
    cfg2.train.max_steps = 12
    cfg2.train.eval_every = 3
    cfg2.train.log_every = 1000
    cfg2.train.ckpt_dir = str(tmp_path / "ckpt")
    logs2 = []
    res = train(cfg2, log=logs2.append)
    # Resumes from the newest SAVED checkpoint (saves happen on best-val
    # improvement, so the resume step is 3 or 6 depending on the step-6
    # eval), and continues from there rather than restarting at 0.
    resumed = [int(s.rsplit(" ", 1)[1]) for s in logs2 if "resumed" in s]
    assert resumed and resumed[0] in (3, 6), logs2[:3]
    steps = [h["step"] for h in res["history"]]
    expected = [s for s in (6, 9, 12) if s > resumed[0]]
    assert steps == expected, (steps, resumed)


def test_resume_with_ema_opt_state(tmp_path):
    """EMA enabled: the EmaState inside the opt state must round-trip
    through orbax save/restore (resume template built from the same tx),
    and the resumed run's evals keep using the restored shadow."""
    import numpy as np

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.train.train import train

    def cfg_for(max_steps):
        cfg = get_config("amazon_hpmn")
        cfg.n_examples = 400
        cfg.model.hpmn_layers = 1
        cfg.train.batch_size = 16
        cfg.train.max_steps = max_steps
        cfg.train.eval_every = 3
        cfg.train.log_every = 1000
        cfg.train.ema_decay = 0.9
        cfg.eval_steps_per_dispatch = 1  # pin (config ships auto)
        cfg.train.ckpt_dir = str(tmp_path / "ckpt")
        return cfg

    train(cfg_for(6), log=lambda s: None)
    logs = []
    res = train(cfg_for(12), log=logs.append)
    assert any("resumed" in s for s in logs), logs[:3]
    assert res["ema_params"] is not None
    assert np.isfinite(res["test"]["log_loss"])


def test_best_k_by_val_auc(setup, tmp_path):
    cfg, arrays, params, tx = setup
    opt = tx.init(params)
    loader = DataLoader(arrays, batch_size=16, seed=5)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep_best_k=2)
    for step, auc in [(1, 0.6), (2, 0.8), (3, 0.55), (4, 0.7)]:
        mngr.save(step, params, opt, loader.state_dict(), {"val_auc": auc})
    assert mngr.best_step() == 2
    mngr.close()


@pytest.mark.slow
def test_sigkill_mid_run_resumes_to_identical_result(tmp_path):
    """Preemption tolerance as the OS sees it (SURVEY.md §5.3): SIGKILL the
    training CLI between checkpoints, relaunch the same command, and the
    resumed run must land on the SAME final TEST metrics as an
    uninterrupted run — the checkpoint carries params + Adam state + the
    loader position, and replayed steps are deterministic."""
    import os
    import signal
    import subprocess
    import sys as _sys
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Force the subprocesses onto CPU: drop the axon sitecustomize from
    # PYTHONPATH (it force-registers the tunneled TPU and overrides
    # JAX_PLATFORMS) — same recipe as the verify skill's CPU drives.
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}

    def cmd(ckpt):
        return [_sys.executable, "-u", "-m", "hpmn_tpu.train.train",
                "--config", "amazon_hpmn", "--set",
                "n_examples=2000", "train.batch_size=64",
                # pinned k: this test compares two INDEPENDENT runs, and
                # the shipped auto-probe (k=0) may resolve different
                # timing-derived knees for them, changing step grouping
                # (within ONE run, resume reuses the probed k via the
                # ckpt-dir sidecar — tested separately)
                "train.steps_per_dispatch=1",
                "eval_steps_per_dispatch=1",
                "train.max_steps=60", "train.eval_every=20",
                "train.log_every=1000000", "mesh.enable=False",
                f"train.ckpt_dir={ckpt}",
                "train.early_stop_patience=1000000"]

    def final_test_line(text):
        lines = [l for l in text.splitlines() if l.startswith("TEST ")]
        assert lines, text[-2000:]
        return lines[-1]

    # Uninterrupted reference run.
    a = subprocess.run(cmd(str(tmp_path / "a")), capture_output=True,
                       text=True, timeout=600, cwd=repo, env=env)
    assert a.returncode == 0, a.stderr[-2000:]
    ref = final_test_line(a.stdout)

    # Interrupted run: SIGKILL after the first checkpoint lands.
    proc = subprocess.Popen(cmd(str(tmp_path / "b")), stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, cwd=repo,
                            env=env)
    try:
        deadline = _time.time() + 300
        saw_val = False
        while _time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if "VAL auc" in line:
                saw_val = True
                break
        assert saw_val, "never reached the first eval/checkpoint"
        _time.sleep(1.0)  # mngr.save wait_until_finished has returned by now
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    # Relaunch the identical command: auto-resume from latest checkpoint.
    b2 = subprocess.run(cmd(str(tmp_path / "b")), capture_output=True,
                        text=True, timeout=600, cwd=repo, env=env)
    assert b2.returncode == 0, b2.stderr[-2000:]
    assert "resumed from step" in b2.stdout, b2.stdout[-2000:]
    assert final_test_line(b2.stdout) == ref, (final_test_line(b2.stdout),
                                               ref)


@pytest.mark.slow
def test_sigterm_graceful_checkpoint_and_resume(tmp_path):
    """Graceful preemption: SIGTERM makes the trainer checkpoint at the
    next step boundary (metrics-less, so orbax's best-k GC keeps it as
    `latest`) and exit 0 fast; the relaunched command resumes from that
    exact step — not from the last best-val improvement."""
    import os
    import signal
    import subprocess
    import sys as _sys
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    ckpt = str(tmp_path / "ckpt")
    cmd = [_sys.executable, "-u", "-m", "hpmn_tpu.train.train",
           "--config", "amazon_hpmn", "--set",
           "n_examples=2000", "train.batch_size=64",
           "train.max_steps=4000", "train.eval_every=1000",
           "train.log_every=5", "mesh.enable=False",
           f"train.ckpt_dir={ckpt}",
           "train.early_stop_patience=1000000"]

    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, cwd=repo,
                            env=env)
    try:
        deadline = _time.time() + 300
        saw_progress = False
        while _time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            # past the first eval AND into ordinary steps (loss lines)
            if line.startswith("step") and "loss" in line \
                    and "step 5 " not in line:
                saw_progress = True
                break
        assert saw_progress, "trainer never reached steady-state steps"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
        assert proc.returncode == 0, out[-2000:]
        assert "SIGTERM: checkpoint saved at step" in out, out[-2000:]
        saved_step = int(out.rsplit("saved at step ", 1)[1].split(";")[0])
        # graceful exit skips the final test eval (fast shutdown)
        assert "TEST " not in out
    finally:
        if proc.poll() is None:
            proc.kill()

    resumed = subprocess.run(
        cmd[:-1] + [cmd[-1], "train.max_steps=%d" % (saved_step + 10)],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert f"resumed from step {saved_step}" in resumed.stdout, \
        resumed.stdout[-2000:]
    assert "TEST " in resumed.stdout


def test_preemption_snapshot_rotation(setup, tmp_path):
    """save_preemption keeps exactly ONE metrics-less snapshot (marker-file
    rotation + orbax delete): repeated evictions must not accumulate
    snapshots, and the best metric-carrying checkpoint is never deleted."""
    import os

    cfg, arrays, params, tx = setup
    opt = tx.init(params)
    loader = DataLoader(arrays, batch_size=16, seed=5)
    d = str(tmp_path / "ckpt")
    mngr = CheckpointManager(d, keep_best_k=2)
    mngr.save(2, params, opt, loader.state_dict(), {"val_auc": 0.8})
    for step in (5, 9, 13):
        mngr.save_preemption(step, params, opt, loader.state_dict())
    assert mngr.latest_step() == 13
    assert mngr.best_step() == 2
    steps = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    assert steps == [2, 13], steps  # best kept, older preemptions rotated
    mngr.close()

    # resume prefers the preemption snapshot (latest)
    mngr2 = CheckpointManager(d, keep_best_k=2)
    restored = mngr2.restore(template={
        "params": params, "opt_state": opt,
        "loader": loader.state_dict(), "step": 0})
    assert restored["step"] == 13
    mngr2.close()

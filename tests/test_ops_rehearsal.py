"""End-to-end deployment drill (VERDICT r2 directive #9, SURVEY.md §3.5 +
§7 "done"): the FULL production pipeline as the operator runs it — raw log
-> preprocess CLI -> train CLI (--data_dir, checkpoints) -> export_bundle
(int8 tables + history bootstrap) -> hpmn-serve daemon -> client
predict/update — chained on real artifacts and real OS processes, not as
isolated pieces. docs/OPERATIONS.md §7 documents this as the drill."""

import os
import signal
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# CPU recipe for real subprocesses: JAX_PLATFORMS honored only once the
# axon sitecustomize is off PYTHONPATH (tests/test_checkpoint.py idiom).
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}


@pytest.mark.slow
def test_full_deployment_drill(tmp_path):
    from hpmn_tpu.data import process_taobao
    from hpmn_tpu.serving.client import ServingClient

    # ---- 1. raw log (UserBehavior.csv format) -> preprocess CLI ---------
    rng = np.random.default_rng(0)
    log = tmp_path / "UserBehavior.csv"
    with open(log, "w") as f:
        for u in range(100):
            for t in range(int(rng.integers(10, 18))):
                item = int(rng.integers(1, 80))
                btype = "pv" if rng.random() < 0.8 else "buy"
                f.write(f"{u},{item},{item % 9},{btype},{1500000 + t}\n")
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    process_taobao.main(["--log", str(log), "--seq_len", "300",
                         "--out", str(data_dir / "taobao.npz")])

    # ---- 2. train CLI on the preprocessed artifacts ----------------------
    ckpt = tmp_path / "ckpt"
    r = subprocess.run(
        [sys.executable, "-u", "-m", "hpmn_tpu.train.train",
         "--config", "taobao_hpmn", "--set", f"data_dir={data_dir}",
         "train.batch_size=8", "train.steps_per_dispatch=1",
         "eval_steps_per_dispatch=1",
         "train.max_steps=8", "train.eval_every=4",
         "train.log_every=1000000", "mesh.enable=False",
         f"train.ckpt_dir={ckpt}", "eval_batch_size=16"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=ENV)
    assert r.returncode == 0, r.stderr[-3000:]
    assert any(line.startswith("TEST ") for line in r.stdout.splitlines())

    # ---- 3. export a serving bundle (int8 tables + history bootstrap) ---
    from hpmn_tpu.data.preprocess import load_preprocessed
    from hpmn_tpu.data.synthetic import DatasetSpec

    arrays = load_preprocessed(str(data_dir),
                               DatasetSpec("taobao", 300, 10 ** 9, 10 ** 9,
                                           100))
    hist = tmp_path / "hist.npz"
    take = slice(0, 10)
    np.savez(hist, uids=arrays["uid"][take],
             item_seqs=arrays["item_seq"][take],
             cat_seqs=arrays["cat_seq"][take],
             masks=arrays["seq_mask"][take])
    bundle = tmp_path / "bundle"
    r = subprocess.run(
        [sys.executable, "tools/export_bundle.py", "--ckpt_dir", str(ckpt),
         "--config", "taobao_hpmn", "--out", str(bundle),
         "--histories", str(hist), "--quantize", "--force_cpu"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=ENV)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "exported step" in r.stdout, r.stdout

    # ---- 4. serve the bundle; predict + update through the client -------
    uids = np.asarray(arrays["uid"][take][:5], np.int64)
    items = np.asarray(arrays["target_item"][take][:5], np.int32)
    cats = np.asarray(arrays["target_cat"][take][:5], np.int32)
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--bundle", str(bundle),
         "--port", "0", "--force_cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=ENV)
    try:
        line = proc.stdout.readline()
        assert "serving bundle" in line, (line, proc.stderr.read())
        hostport = line.split(" on ")[1].split()[0]
        host, port = hostport.rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            s1 = cl.predict(uids, items, cats)
            assert s1.shape == (5,) and np.isfinite(s1).all()
            assert ((s1 > 0) & (s1 < 1)).all()  # sigmoid scores
            # lifelong update -> the user's next prediction moves
            cl.update(uids, items, cats)
            s2 = cl.predict(uids, items, cats)
            assert np.isfinite(s2).all()
            assert not np.allclose(s1, s2)
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_bst_deployment_drill(tmp_path):
    """The same operator chain for the NON-recurrent family: preprocess ->
    train CLI (taobao_bst) -> export_bundle (auto-routes to the history
    store) -> hpmn-serve (store kind dispatched from the bundle) ->
    client predict / update / rank. Proves the BST lifelong serving path
    end-to-end on real OS processes (VERDICT r3 missing #5)."""
    from hpmn_tpu.data import process_taobao
    from hpmn_tpu.serving.client import ServingClient

    rng = np.random.default_rng(1)
    log = tmp_path / "UserBehavior.csv"
    with open(log, "w") as f:
        for u in range(80):
            for t in range(int(rng.integers(10, 16))):
                item = int(rng.integers(1, 60))
                btype = "pv" if rng.random() < 0.8 else "buy"
                f.write(f"{u},{item},{item % 7},{btype},{1600000 + t}\n")
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    process_taobao.main(["--log", str(log), "--seq_len", "300",
                         "--out", str(data_dir / "taobao.npz")])

    ckpt = tmp_path / "ckpt"
    r = subprocess.run(
        [sys.executable, "-u", "-m", "hpmn_tpu.train.train",
         "--config", "taobao_bst", "--set", f"data_dir={data_dir}",
         "train.batch_size=8", "train.steps_per_dispatch=1",
         "eval_steps_per_dispatch=1",
         "train.max_steps=6", "train.eval_every=3",
         "train.log_every=1000000", "mesh.enable=False",
         f"train.ckpt_dir={ckpt}", "eval_batch_size=16"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=ENV)
    assert r.returncode == 0, r.stderr[-3000:]

    from hpmn_tpu.data.preprocess import load_preprocessed
    from hpmn_tpu.data.synthetic import DatasetSpec

    arrays = load_preprocessed(str(data_dir),
                               DatasetSpec("taobao", 300, 10 ** 9, 10 ** 9,
                                           80))
    hist = tmp_path / "hist.npz"
    take = slice(0, 8)
    np.savez(hist, uids=arrays["uid"][take],
             item_seqs=arrays["item_seq"][take],
             cat_seqs=arrays["cat_seq"][take],
             masks=arrays["seq_mask"][take])
    bundle = tmp_path / "bundle"
    r = subprocess.run(
        [sys.executable, "tools/export_bundle.py", "--ckpt_dir", str(ckpt),
         "--config", "taobao_bst", "--out", str(bundle),
         "--histories", str(hist), "--quantize", "--force_cpu"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=ENV)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "store=history" in r.stdout, r.stdout
    import json
    with open(bundle / "serving_config.json") as f:
        assert json.load(f)["store"] == "history"

    uids = np.asarray(arrays["uid"][take][:4], np.int64)
    items = np.asarray(arrays["target_item"][take][:4], np.int32)
    cats = np.asarray(arrays["target_cat"][take][:4], np.int32)
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--bundle", str(bundle),
         "--port", "0", "--force_cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=ENV)
    try:
        line = proc.stdout.readline()
        assert "serving bundle" in line, (line, proc.stderr.read())
        hostport = line.split(" on ")[1].split()[0]
        host, port = hostport.rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            s1 = cl.predict(uids, items, cats)
            assert s1.shape == (4,) and np.isfinite(s1).all()
            assert ((s1 > 0) & (s1 < 1)).all()
            cl.update(uids, items, cats)  # window slides -> scores move
            s2 = cl.predict(uids, items, cats)
            assert np.isfinite(s2).all()
            assert not np.allclose(s1, s2)
            ranked = cl.rank(uids[:2], [[1, 2, 3], [4, 5, 6]],
                             [[1, 2, 3], [4, 5, 6]])
            assert np.asarray(ranked).shape == (2, 3)
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_protocol_family_deployment_drill(tmp_path):
    """The operator chain for a NEWLY-O(1) protocol family (r5: the
    serving fence moved from `name == "hpmn"` to "has a target-independent
    recurrence"): preprocess -> train CLI with model.name=gru4rec ->
    export_bundle (must pick the MEMORY store by protocol membership and
    say so) -> hpmn-serve -> client predict / update / rank."""
    import json

    from hpmn_tpu.data import process_taobao
    from hpmn_tpu.serving.client import ServingClient

    rng = np.random.default_rng(2)
    log = tmp_path / "UserBehavior.csv"
    with open(log, "w") as f:
        for u in range(80):
            for t in range(int(rng.integers(10, 16))):
                item = int(rng.integers(1, 60))
                btype = "pv" if rng.random() < 0.8 else "buy"
                f.write(f"{u},{item},{item % 7},{btype},{1700000 + t}\n")
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    process_taobao.main(["--log", str(log), "--seq_len", "300",
                         "--out", str(data_dir / "taobao.npz")])

    ckpt = tmp_path / "ckpt"
    r = subprocess.run(
        [sys.executable, "-u", "-m", "hpmn_tpu.train.train",
         "--config", "taobao_hpmn", "--set", "model.name=gru4rec",
         f"data_dir={data_dir}",
         "train.batch_size=8", "train.steps_per_dispatch=1",
         "eval_steps_per_dispatch=1",
         "train.max_steps=6", "train.eval_every=3",
         "train.log_every=1000000", "mesh.enable=False",
         f"train.ckpt_dir={ckpt}", "eval_batch_size=16"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=ENV)
    assert r.returncode == 0, r.stderr[-3000:]

    from hpmn_tpu.data.preprocess import load_preprocessed
    from hpmn_tpu.data.synthetic import DatasetSpec

    arrays = load_preprocessed(str(data_dir),
                               DatasetSpec("taobao", 300, 10 ** 9, 10 ** 9,
                                           80))
    hist = tmp_path / "hist.npz"
    take = slice(0, 8)
    np.savez(hist, uids=arrays["uid"][take],
             item_seqs=arrays["item_seq"][take],
             cat_seqs=arrays["cat_seq"][take],
             masks=arrays["seq_mask"][take])
    bundle = tmp_path / "bundle"
    r = subprocess.run(
        [sys.executable, "tools/export_bundle.py", "--ckpt_dir", str(ckpt),
         "--config", "taobao_hpmn", "--set", "model.name=gru4rec",
         "--out", str(bundle), "--histories", str(hist), "--force_cpu"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=ENV)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "store=memory" in r.stdout, r.stdout  # protocol, not name
    with open(bundle / "serving_config.json") as f:
        assert json.load(f)["store"] == "memory"

    uids = np.asarray(arrays["uid"][take][:4], np.int64)
    items = np.asarray(arrays["target_item"][take][:4], np.int32)
    cats = np.asarray(arrays["target_cat"][take][:4], np.int32)
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--bundle", str(bundle),
         "--port", "0", "--force_cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=ENV)
    try:
        line = proc.stdout.readline()
        assert "serving bundle" in line, (line, proc.stderr.read())
        hostport = line.split(" on ")[1].split()[0]
        host, port = hostport.rsplit(":", 1)
        with ServingClient(host, int(port), timeout_s=120) as cl:
            s1 = cl.predict(uids, items, cats)
            assert s1.shape == (4,) and np.isfinite(s1).all()
            assert ((s1 > 0) & (s1 < 1)).all()
            cl.update(uids, items, cats)  # O(1) state update -> scores move
            s2 = cl.predict(uids, items, cats)
            assert np.isfinite(s2).all()
            assert not np.allclose(s1, s2)
            ranked = cl.rank(uids[:2], [[1, 2, 3], [4, 5, 6]],
                             [[1, 2, 3], [4, 5, 6]])
            assert np.asarray(ranked).shape == (2, 3)
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

"""Dataset preprocessing CLI tests on miniature synthetic raw dumps
(SURVEY.md §2.1 preprocessing components; real data is not downloadable in
this environment, so each CLI is driven end-to-end on a generated raw file
in its dataset's true format)."""

import json

import numpy as np

from hpmn_tpu.data import process_amazon, process_taobao, process_xlong
from hpmn_tpu.data.preprocess import load_preprocessed
from hpmn_tpu.data.synthetic import DatasetSpec


def test_amazon_cli(tmp_path):
    rng = np.random.default_rng(0)
    reviews, meta = tmp_path / "reviews.json", tmp_path / "meta.json"
    asins = [f"B{i:06d}" for i in range(40)]
    with open(meta, "w") as f:
        for a in asins:
            f.write(json.dumps({
                "asin": a,
                "categories": [["Electronics", f"Cat{hash(a) % 5}"]]}) + "\n")
    with open(reviews, "w") as f:
        for u in range(15):
            for t in range(int(rng.integers(6, 12))):
                f.write(json.dumps({
                    "reviewerID": f"U{u}",
                    "asin": asins[int(rng.integers(0, 40))],
                    "unixReviewTime": 1000 + t}) + "\n")
    out = tmp_path / "amazon.npz"
    process_amazon.main(["--reviews", str(reviews), "--meta", str(meta),
                         "--out", str(out), "--seq_len", "20"])
    spec = DatasetSpec("amazon", 20, 10 ** 9, 10 ** 9, 15)
    arrays = load_preprocessed(str(tmp_path), spec)
    assert arrays["label"].mean() == 0.5  # one pos + one neg per user
    assert arrays["item_seq"].shape[1] == 20


def test_taobao_cli(tmp_path):
    rng = np.random.default_rng(1)
    log = tmp_path / "UserBehavior.csv"
    with open(log, "w") as f:
        for u in range(12):
            for t in range(int(rng.integers(8, 15))):
                item = int(rng.integers(1, 60))
                btype = "pv" if rng.random() < 0.8 else "buy"
                f.write(f"{u},{item},{item % 7},{btype},{1500000 + t}\n")
    out = tmp_path / "taobao.npz"
    process_taobao.main(["--log", str(log), "--out", str(out),
                         "--seq_len", "30"])
    spec = DatasetSpec("taobao", 30, 10 ** 9, 10 ** 9, 12)
    arrays = load_preprocessed(str(tmp_path), spec)
    assert arrays["item_seq"].shape[1] == 30
    assert (arrays["seq_mask"].sum(1) > 0).all()


def test_xlong_cli_filters_short_histories(tmp_path):
    log = tmp_path / "xlong.csv"
    with open(log, "w") as f:
        for t in range(50):  # long user: 50 events
            f.write(f"longu,{t % 20 + 1},{t % 4},{t}\n")
        for t in range(5):  # short user: filtered out
            f.write(f"shortu,{t + 1},{t % 4},{t}\n")
    out = tmp_path / "xlong.npz"
    process_xlong.main(["--log", str(log), "--out", str(out),
                        "--seq_len", "40", "--min_events", "20"])
    spec = DatasetSpec("xlong", 40, 10 ** 9, 10 ** 9, 2)
    arrays = load_preprocessed(str(tmp_path), spec)
    assert arrays["label"].shape[0] == 2  # only the long user (pos + neg)

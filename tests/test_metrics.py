"""AUC/log-loss estimator parity with sklearn (the reference's estimator,
SURVEY.md §2.1 "Eval")."""

import numpy as np
from sklearn.metrics import log_loss as sk_log_loss
from sklearn.metrics import roc_auc_score

from hpmn_tpu.train.metrics import auc, log_loss


def test_auc_matches_sklearn():
    rng = np.random.default_rng(0)
    for n in (10, 101, 1000):
        y = rng.integers(0, 2, n)
        s = rng.normal(size=n) + y  # informative scores
        assert abs(auc(s, y) - roc_auc_score(y, s)) < 1e-12


def test_auc_with_ties_matches_sklearn():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 500)
    s = rng.integers(0, 5, 500).astype(float)  # heavy ties
    assert abs(auc(s, y) - roc_auc_score(y, s)) < 1e-12


def test_auc_degenerate():
    assert np.isnan(auc(np.array([1.0, 2.0]), np.array([1, 1])))


def test_log_loss_matches_sklearn():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 200)
    logits = rng.normal(size=200)
    probs = 1 / (1 + np.exp(-logits))
    assert abs(log_loss(logits, y) - sk_log_loss(y, probs)) < 1e-9


def test_gauc_weighted_per_user():
    """GAUC == impression-weighted mean of per-user sklearn AUCs; users
    with single-class examples are skipped; one-user GAUC == AUC."""
    from sklearn.metrics import roc_auc_score

    from hpmn_tpu.train.metrics import auc, gauc

    rng = np.random.default_rng(0)
    n = 400
    uids = rng.integers(0, 25, n)
    labels = rng.integers(0, 2, n).astype(np.float64)
    scores = rng.normal(size=n) + labels  # informative
    # manual reference
    acc = tot = 0.0
    for u in np.unique(uids):
        m = uids == u
        if 0 < labels[m].sum() < m.sum():
            acc += m.sum() * roc_auc_score(labels[m], scores[m])
            tot += m.sum()
    np.testing.assert_allclose(gauc(scores, labels, uids), acc / tot,
                               rtol=1e-12)
    # one user: gauc == auc
    one = np.zeros(n, np.int64)
    np.testing.assert_allclose(gauc(scores, labels, one),
                               auc(scores, labels), rtol=1e-12)
    # all single-class users -> nan
    assert np.isnan(gauc(scores, np.ones(n), uids))


def test_streaming_auc_matches_exact():
    """Histogram AUC == exact AUC to O(1/n_bins); chunked updates and a
    two-accumulator merge (the cross-host path) give the identical result;
    streaming log-loss is exact."""
    from hpmn_tpu.train.metrics import StreamingAUC, auc, log_loss

    rng = np.random.default_rng(3)
    n = 20000
    labels = rng.integers(0, 2, n).astype(np.float64)
    logits = rng.normal(size=n) + 0.8 * labels

    one = StreamingAUC(1 << 14)
    one.update(logits, labels)
    got = one.result()
    np.testing.assert_allclose(got["auc"], auc(logits, labels), atol=2e-3)
    np.testing.assert_allclose(got["log_loss"], log_loss(logits, labels),
                               rtol=1e-12)
    assert got["n"] == n

    # chunked + merged == single pass (bit-identical histograms)
    a, b = StreamingAUC(1 << 14), StreamingAUC(1 << 14)
    a.update(logits[: n // 3], labels[: n // 3])
    b.update(logits[n // 3:], labels[n // 3:])
    a.merge_counts(*b.state)
    np.testing.assert_array_equal(a.pos, one.pos)
    np.testing.assert_array_equal(a.neg, one.neg)
    assert a.result() == got

    # single-class stream -> nan auc
    empty = StreamingAUC(64)
    empty.update(logits, np.ones(n))
    assert np.isnan(empty.result()["auc"])


def test_streaming_gauc_matches_exact():
    """Per-user histogram GAUC == exact gauc() to O(1/n_bins); chunked
    updates with a two-accumulator merge (the cross-host path) are
    bit-identical to a single pass; the hash-capped variant bounds the
    user state and degrades gracefully (VERDICT r2 missing #4)."""
    from hpmn_tpu.train.metrics import StreamingGAUC, gauc

    rng = np.random.default_rng(7)
    n, n_users = 30000, 400
    uids = rng.integers(0, n_users, n).astype(np.int64)
    labels = rng.integers(0, 2, n).astype(np.float64)
    # per-user score bias so per-user AUCs differ from the global AUC
    logits = rng.normal(size=n) + 0.8 * labels + 0.1 * (uids % 7)

    one = StreamingGAUC(n_bins=4096)
    one.update(logits, labels, uids)
    exact = gauc(logits, labels, uids)
    np.testing.assert_allclose(one.result(), exact, atol=2e-3)

    # chunked + merged == single pass (bit-identical per-user histograms)
    a, b = StreamingGAUC(4096), StreamingGAUC(4096)
    a.update(logits[: n // 3], labels[: n // 3], uids[: n // 3])
    b.update(logits[n // 3:], labels[n // 3:], uids[n // 3:])
    a.merge_state(*b.state)
    assert a.result() == one.result()
    ka, kh = a.state
    oa, oh = one.state
    np.testing.assert_array_equal(ka, oa)
    np.testing.assert_array_equal(kh, oh)

    # hash-capped: state bounded at max_users buckets, result still a
    # within-tolerance GAUC estimate (collisions merge users)
    capped = StreamingGAUC(4096, max_users=64)
    capped.update(logits, labels, uids)
    assert len(capped.state[0]) <= 64
    assert abs(capped.result() - exact) < 0.05

    # all single-class users -> nan
    empty = StreamingGAUC(64)
    empty.update(logits, np.ones(n), uids)
    assert np.isnan(empty.result())


def test_calibration_ratio():
    """calibration = mean pCTR / observed CTR: ~1.0 when labels are sampled
    from the predicted probabilities, nan without positives; the streaming
    histogram estimator agrees to O(1/n_bins)."""
    from hpmn_tpu.train.metrics import StreamingAUC, calibration

    rng = np.random.default_rng(4)
    n = 50000
    p = rng.uniform(0.05, 0.95, n)
    y = (rng.uniform(size=n) < p).astype(np.float64)
    logits = np.log(p / (1 - p))
    c = calibration(logits, y)
    np.testing.assert_allclose(c, p.sum() / y.sum(), rtol=1e-12)
    assert 0.97 < c < 1.03  # sampled labels -> calibrated scores
    assert np.isnan(calibration(logits, np.zeros(n)))
    # a global logit bias shows up as miscalibration AUC cannot see
    assert calibration(logits + 1.0, y) > 1.2
    acc = StreamingAUC(1 << 14)
    acc.update(logits, y)
    np.testing.assert_allclose(acc.result()["calib"], c, atol=5e-3)


def test_streaming_eval_through_driver():
    """eval_streaming_bins routes evaluate() through the bounded-memory
    estimators; AUC and the per-user GAUC track the exact path, and
    gauc_bins=0 opts the GAUC state out (nan)."""
    import jax

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data import DataLoader, make_ctr_dataset
    from hpmn_tpu.data.synthetic import SPECS
    from hpmn_tpu.models import init_model
    from hpmn_tpu.train.evaluate import evaluate
    from hpmn_tpu.train.train import make_eval_step

    cfg = get_config("amazon_hpmn")
    cfg.model.hpmn_layers = 2
    spec = SPECS["amazon"]
    arrays = make_ctr_dataset(spec, 300, seed=0)
    params = init_model(jax.random.key(0), cfg, spec.n_items, spec.n_cats)
    step = make_eval_step(cfg)
    loader = DataLoader(arrays, batch_size=64, shuffle=False)
    exact = evaluate(step, params, loader)
    stream = evaluate(step, params, loader, streaming_bins=1 << 14)
    np.testing.assert_allclose(stream["auc"], exact["auc"], atol=5e-3)
    np.testing.assert_allclose(stream["gauc"], exact["gauc"], atol=5e-3)
    np.testing.assert_allclose(stream["log_loss"], exact["log_loss"],
                               rtol=1e-6)
    assert stream["n"] == exact["n"]
    no_g = evaluate(step, params, loader, streaming_bins=1 << 14,
                    gauc_bins=0)
    assert np.isnan(no_g["gauc"])

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

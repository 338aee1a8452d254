"""Metric tests on hand-crafted score matrices (SURVEY.md §4 item 3)."""

import numpy as np

from visdial_tpu.utils.metrics import ranks_from_scores, retrieval_metrics


def test_rank_basic():
    scores = np.array([[0.1, 0.9, 0.5, 0.3]])
    assert int(ranks_from_scores(scores, np.array([1]))[0]) == 1
    assert int(ranks_from_scores(scores, np.array([2]))[0]) == 2
    assert int(ranks_from_scores(scores, np.array([0]))[0]) == 4


def test_rank_ties_optimistic():
    # Tie with the max: gt is not pushed down by equal scores.
    scores = np.array([[1.0, 1.0, 0.5]])
    assert int(ranks_from_scores(scores, np.array([1]))[0]) == 1
    assert int(ranks_from_scores(scores, np.array([0]))[0]) == 1


def test_rank_batched_shapes():
    scores = np.random.default_rng(0).standard_normal((3, 5, 100))
    gt = np.zeros((3, 5), dtype=np.int64)
    r = ranks_from_scores(scores, gt)
    assert r.shape == (3, 5)
    assert (np.asarray(r) >= 1).all() and (np.asarray(r) <= 100).all()


def test_retrieval_metrics_known():
    ranks = np.array([1, 2, 5, 10, 100])
    m = retrieval_metrics(ranks)
    assert np.isclose(m["mrr"], np.mean(1.0 / ranks))
    assert np.isclose(m["r@1"], 0.2)
    assert np.isclose(m["r@5"], 0.6)
    assert np.isclose(m["r@10"], 0.8)
    assert np.isclose(m["mean_rank"], ranks.mean())
    assert m["num_examples"] == 5


def test_tie_conventions():
    import numpy as np

    from visdial_tpu.utils.metrics import ranks_from_scores

    scores = np.array([[3.0, 5.0, 5.0, 1.0, 5.0]])
    gt = np.array([1])  # tied with two others at 5.0, none higher
    assert int(ranks_from_scores(scores, gt, "optimistic")[0]) == 1
    assert int(ranks_from_scores(scores, gt, "pessimistic")[0]) == 3
    assert float(ranks_from_scores(scores, gt, "mean")[0]) == 2.0

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


# ---- v1.0 protocol additions: full rankings + NDCG ----

from visdial_tpu.utils.metrics import candidate_rankings, ndcg_scores  # noqa: E402


def test_candidate_rankings_basic_and_ties():
    scores = np.array([[0.1, 0.9, 0.5, 0.9]])
    # stable tie-break: index 1 outranks index 3 at equal score
    np.testing.assert_array_equal(
        np.asarray(candidate_rankings(scores))[0], [4, 1, 3, 2])


def test_candidate_rankings_is_permutation_and_matches_gt_rank():
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((5, 7, 20))  # continuous: no ties
    cr = np.asarray(candidate_rankings(scores))
    assert (np.sort(cr, axis=-1) == np.arange(1, 21)).all()
    gt = rng.integers(0, 20, (5, 7))
    want = np.asarray(ranks_from_scores(scores, gt))
    got = np.take_along_axis(cr, gt[..., None], axis=-1)[..., 0]
    np.testing.assert_array_equal(got, want)


def test_ndcg_hand_computed():
    rel = np.array([[0.0, 1.0, 0.0, 0.5]])
    # perfect: candidate 1 ranked first, candidate 3 second
    perfect = np.array([[3, 1, 4, 2]])
    np.testing.assert_allclose(ndcg_scores(perfect, rel), [1.0])
    # identity order: K=2, DCG = 1/log2(3); IDCG = 1/log2(2) + 0.5/log2(3)
    identity = np.array([[1, 2, 3, 4]])
    want = (1 / np.log2(3)) / (1.0 + 0.5 / np.log2(3))
    np.testing.assert_allclose(ndcg_scores(identity, rel), [want])


def test_ndcg_no_relevant_is_zero():
    np.testing.assert_array_equal(
        ndcg_scores(np.array([[1, 2, 3]]), np.zeros((1, 3))), [0.0])


def test_ndcg_matches_naive_reference():
    """Vectorized NDCG == a per-row loop transliteration of the official
    v1.0 evaluation (K = #relevant, raw-relevance gains, log2 discounts)."""
    rng = np.random.default_rng(1)
    K = 10
    rel = rng.uniform(0, 1, (8, K)) * (rng.uniform(size=(8, K)) < 0.4)
    cr = np.asarray(candidate_rankings(rng.standard_normal((8, K))))
    want = []
    for i in range(8):
        k = int((rel[i] > 0).sum())
        order = np.argsort(cr[i])          # predicted rank order
        dcg = sum(rel[i][order[j]] / np.log2(j + 2) for j in range(k))
        ideal = np.sort(rel[i])[::-1]
        idcg = sum(ideal[j] / np.log2(j + 2) for j in range(k))
        want.append(dcg / idcg if idcg > 0 else 0.0)
    np.testing.assert_allclose(ndcg_scores(cr, rel), want, atol=1e-12)


def test_retrieval_metrics_empty_ranks():
    """A split with zero rankable rounds (v1.0 test split: scoreable but
    no GT) reports empty metrics, not NaN + numpy warnings."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")     # any RuntimeWarning -> failure
        m = retrieval_metrics(np.array([], dtype=np.int32))
    assert m["num_examples"] == 0
    assert m["mrr"] == 0.0 and m["mean_rank"] == 0.0

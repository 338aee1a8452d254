"""Retrieval metrics for the VisDial protocol.

Reference: evaluate.lua computes, per dialog round, the rank of the
ground-truth answer among 100 candidate scores (descending), then reports
MRR = mean(1/rank), R@k = mean(rank <= k) for k in {1,5,10}, and mean rank.

Tie-breaking (SURVEY.md §3.2 flags this as re-verify): we define rank as
  rank(gt) = 1 + #{k : score_k > score_gt} ,
i.e. ties do NOT push the ground truth down.  This is the optimistic
convention and is the documented behavior of record for this rebuild.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ranks_from_scores(scores, gt_index, ties: str = "optimistic"):
    """Rank of the ground-truth candidate per row.

    Args:
      scores: (..., K) float — higher is better.
      gt_index: (...,) int — index of the ground-truth candidate in [0, K).
      ties: how candidates scoring EXACTLY equal to the ground truth count
        (the reference's sort-order behavior is unverifiable — SURVEY.md
        §3.2; 'optimistic' is the behavior of record, the others exist for
        parity re-verification against real reference numbers):
          'optimistic'  — ties do not push the GT down (default)
          'pessimistic' — every tie outranks the GT
          'mean'        — ties share the average of their rank range
                          (fractional ranks)

    Returns:
      (...,) ranks in [1, K]; int32, or float32 for ties='mean'.
    """
    scores = jnp.asarray(scores)
    gt_index = jnp.asarray(gt_index)
    gt_score = jnp.take_along_axis(scores, gt_index[..., None], axis=-1)
    higher = jnp.sum((scores > gt_score).astype(jnp.int32), axis=-1)
    if ties == "optimistic":
        return higher + 1
    equal = jnp.sum((scores == gt_score).astype(jnp.int32), axis=-1) - 1
    if ties == "pessimistic":
        return higher + equal + 1
    if ties == "mean":
        return higher.astype(jnp.float32) + equal.astype(jnp.float32) / 2 + 1
    raise ValueError(f"unknown ties convention {ties!r}")


def retrieval_metrics(ranks) -> dict[str, float]:
    """MRR / R@1 / R@5 / R@10 / mean rank from a flat array of ranks."""
    r = np.asarray(ranks, dtype=np.float64).reshape(-1)
    return {
        "mrr": float(np.mean(1.0 / r)),
        "r@1": float(np.mean(r <= 1)),
        "r@5": float(np.mean(r <= 5)),
        "r@10": float(np.mean(r <= 10)),
        "mean_rank": float(np.mean(r)),
        "num_examples": int(r.size),
    }

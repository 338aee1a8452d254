"""Retrieval evaluation harness.

Implements the reference protocol exactly (reference: evaluate.lua main
loop; SURVEY.md §3.2 invariants): 100 candidates per round, 10 rounds per
dialog, ground truth always among the candidates, rank from raw scores,
then MRR / R@1 / R@5 / R@10 / mean rank over every (dialog, round).
"""

from __future__ import annotations

import time

import numpy as np

import jax.numpy as jnp

from .config import Config
from .data.dataset import VisDialSplit, Vocabulary
from .data.loader import EvalLoader
from .parallel.mesh import shard_batch
from .parallel.train_step import make_disc_table_eval_fns, make_eval_fn
from .utils.metrics import ranks_from_scores, retrieval_metrics


def evaluate_split(params, data: VisDialSplit, vocab: Vocabulary,
                   cfg: Config, mesh, eval_fn=None, table_fns=None,
                   batch_size: int | None = None,
                   ties: str = "optimistic") -> dict:
    """Score all candidates over a split and compute retrieval metrics.

    Disc decoder takes the table fast path: the dedup'd option list is
    embedded once per call, then every batch is encoder-forward + a table
    gather (exact same scores as the direct path — no dropout at eval).
    Pass table_fns (from make_disc_table_eval_fns) to reuse compiled fns
    across evals; gen (or table_fns=False) uses the direct scoring path.

    Returns the metric dict plus throughput: 'evals_per_sec' counts
    100-candidate ranking evaluations (i.e. dialog rounds scored) per
    second — the eval north-star in BASELINE.json.
    """
    # An explicitly supplied eval_fn wins (callers forcing the direct path);
    # otherwise disc defaults to the table fast path.
    use_table = (cfg.decoder == "disc" and table_fns is not False
                 and (table_fns is not None or eval_fn is None))
    loader = EvalLoader(data, vocab, cfg, batch_size=batch_size)
    if use_table:
        table_fn, score_fn = table_fns or make_disc_table_eval_fns(cfg, mesh)
        table = table_fn(params, jnp.asarray(data.opt_list))
        score = lambda b: score_fn(params, table, b)
    else:
        direct_fn = eval_fn or make_eval_fn(cfg, mesh)
        score = lambda b: direct_fn(params, b)

    all_ranks = []
    t0 = time.time()
    n_rounds = 0
    for batch in loader:
        scores = score(shard_batch(batch.as_dict(), mesh))
        ranks = np.asarray(ranks_from_scores(np.asarray(scores),
                                             batch.gt_ind, ties=ties))
        keep = batch.dialog_valid.astype(bool)
        all_ranks.append(ranks[keep].reshape(-1))
        n_rounds += int(keep.sum()) * cfg.num_rounds
    elapsed = time.time() - t0
    metrics = retrieval_metrics(np.concatenate(all_ranks))
    metrics["evals_per_sec"] = n_rounds / max(elapsed, 1e-9)
    metrics["eval_seconds"] = elapsed
    return metrics

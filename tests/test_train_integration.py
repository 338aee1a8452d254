"""CPU integration tests (SURVEY.md §4 item 4) with REAL retrieval bars.

The synthetic task is separable (the answer is a deterministic function of
the question's first token — data/synthetic.py), so the in-environment
proxy for the unreachable real-data parity test is near-optimal retrieval
on it, not merely above-chance.  Measured step budgets (CPU f32, seed 0):

  * disc (lf-ques-im-hist, hidden 32 / embed 24, lr 5e-3): MRR 0.75 at
    100 steps, 0.87 at 200, 0.95 at 300 — bar 0.8 at 300 steps.
  * gen (mn-ques-hist, hidden 24 / embed 16, lr 5e-3): MRR 0.23 at 100
    steps (BELOW the ~0.26 chance for 12 options — the short-candidate
    bias of sum-log-prob scoring on an undertrained LM), then 0.60 at
    200, 0.83 at 400 — bar 0.6 at 400 steps, decisively above chance.
    This kills the failure mode where an inverted/garbage gen scorer
    passes a finite-scores-only test.
"""

import jax
import jax.numpy as jnp
import numpy as np

from visdial_tpu.data.loader import EvalLoader, TrainLoader
from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state,
    make_eval_fn,
    make_train_fn,
)
from visdial_tpu.utils.metrics import ranks_from_scores, retrieval_metrics
from tests.conftest import small_config


def _train(cfg, num_dialogs=32, steps=50, seed=0):
    split, vocab = make_synthetic_split(cfg, num_dialogs=num_dialogs, seed=seed)
    cfg = cfg.replace(vocab_size=vocab.size)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    train_fn = make_train_fn(cfg, mesh)
    state = init_train_state(cfg)
    loader = TrainLoader(split, vocab, cfg)
    losses = []
    step = 0
    with jax.default_device(jax.devices()[0]):
        while step < steps:
            for batch in loader.epoch(seed=step):
                b = shard_batch(batch.as_dict(), mesh)
                state, m = train_fn(state, b)
                losses.append(float(m["loss"]))
                step += 1
                if step >= steps:
                    break
    return cfg, split, vocab, state, losses, mesh


def _retrieval(cfg, split, vocab, state, mesh) -> dict:
    eval_fn = make_eval_fn(cfg, mesh)
    all_ranks = []
    for batch in EvalLoader(split, vocab, cfg):
        scores = eval_fn(state.params, shard_batch(batch.as_dict(), mesh))
        assert np.isfinite(np.asarray(scores)).all()
        ranks = ranks_from_scores(np.asarray(scores), batch.gt_ind)
        all_ranks.append(np.asarray(ranks)[batch.dialog_valid.astype(bool)])
    return retrieval_metrics(np.concatenate(all_ranks))


def test_lf_disc_learns_synthetic_to_near_optimal_retrieval():
    # hidden 32 / embed 24: the separable task saturates (the small_config
    # default hidden 24 plateaus at MRR ~0.78); budget 300 steps -> 0.95
    # measured, bar 0.8 (chance over 12 options is ~0.26)
    cfg = small_config(encoder="lf-ques-im-hist", decoder="disc",
                       rnn_hidden_size=32, embed_size=24,
                       learning_rate=5e-3, lr_decay_rate=1.0)
    cfg, split, vocab, state, losses, mesh = _train(cfg, steps=300)
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.5, f"loss did not decrease: {first} -> {last}"
    m = _retrieval(cfg, split, vocab, state, mesh)
    assert m["mrr"] > 0.8, m


def test_gen_decoder_learns_to_rank_above_chance():
    """A gen LM trained on the separable task must RANK the ground truth
    decisively above chance (measured 0.83 at the 400-step budget; chance
    ~0.26) — the assertion an inverted gen scorer cannot pass.  Early in
    training gen retrieval sits BELOW chance (sum-log-prob's short-
    candidate bias; the committed sweep's 60-step gen rows show the same
    signature), which is why the bar needs the full budget."""
    cfg = small_config(encoder="mn-ques-hist", decoder="gen",
                       learning_rate=5e-3, lr_decay_rate=1.0)
    cfg, split, vocab, state, losses, mesh = _train(cfg, steps=400)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    m = _retrieval(cfg, split, vocab, state, mesh)
    assert m["mrr"] > 0.6, m

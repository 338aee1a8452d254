"""CPU integration test (SURVEY.md §4 item 4): LF-disc on the synthetic
set — loss decreases over ~50 steps and retrieval beats chance; plus a gen
variant smoke."""

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


def test_lf_disc_learns_synthetic():
    cfg = small_config(encoder="lf-ques-im-hist", decoder="disc",
                       learning_rate=5e-3, lr_decay_rate=1.0)
    cfg, split, vocab, state, losses, mesh = _train(cfg, steps=60)
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.8, f"loss did not decrease: {first} -> {last}"

    eval_fn = make_eval_fn(cfg, mesh)
    all_ranks = []
    for batch in EvalLoader(split, vocab, cfg):
        scores = eval_fn(state.params, shard_batch(batch.as_dict(), mesh))
        ranks = ranks_from_scores(np.asarray(scores), batch.gt_ind)
        all_ranks.append(np.asarray(ranks)[batch.dialog_valid.astype(bool)])
    m = retrieval_metrics(np.concatenate(all_ranks))
    # chance MRR over 12 options ~ harmonic mean ~ 0.26; a learning model
    # on this separable task must clear it decisively
    assert m["mrr"] > 0.4, m


def test_gen_decoder_trains_and_evals():
    cfg = small_config(encoder="mn-ques-hist", decoder="gen",
                       learning_rate=5e-3, lr_decay_rate=1.0)
    cfg, split, vocab, state, losses, mesh = _train(cfg, steps=30)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    eval_fn = make_eval_fn(cfg, mesh)
    batch = next(iter(EvalLoader(split, vocab, cfg)))
    scores = eval_fn(state.params, shard_batch(batch.as_dict(), mesh))
    assert np.isfinite(np.asarray(scores)).all()
    r = retrieval_metrics(np.asarray(
        ranks_from_scores(np.asarray(scores), batch.gt_ind)))
    assert r["mean_rank"] <= cfg.num_options

"""Length-bucketed gen eval == direct full-width eval (the fast path must
be numerically exact, not approximate: masked scan steps contribute zero,
so scoring a row at any sufficient width is the same math)."""

import jax
import numpy as np

from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.eval_harness import _GenBucketPlan, evaluate_split
from visdial_tpu.parallel.mesh import make_mesh
from visdial_tpu.parallel.train_step import init_train_state, make_eval_fn

from conftest import small_config


def _setup():
    cfg = small_config(encoder="mn-ques-im-hist", decoder="gen",
                       batch_size=4, max_ans_len=6)
    split, vocab = make_synthetic_split(cfg, num_dialogs=10, seed=5)
    cfg = cfg.replace(vocab_size=vocab.size)
    return cfg, split, vocab


def test_bucket_plan_shapes():
    cfg, split, _ = _setup()
    plan = _GenBucketPlan(split, batch_size=4)
    assert plan.widths[-1] == split.opt_list.shape[1] + 1
    assert sorted(plan.widths) == plan.widths
    # every row fits some bucket; capacities cover the worst batch exactly
    lens = split.opt_list_len[split.opt_inds] + 1
    assert lens.max() <= plan.widths[-1]
    assert all(c % 128 == 0 for c in plan.caps)
    # assignment covers each batch's rows exactly once
    rows = plan.assign(split.opt_list_len[split.opt_inds[:4]])
    got = np.sort(np.concatenate(rows))
    np.testing.assert_array_equal(got, np.arange(lens[:4].size))


def test_bucketed_metrics_match_direct():
    cfg, split, vocab = _setup()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    params = init_train_state(cfg).params

    direct = evaluate_split(params, split, vocab, cfg, mesh,
                            eval_fn=make_eval_fn(cfg, mesh),
                            table_fns=False, gen_fns=False)
    bucketed = evaluate_split(params, split, vocab, cfg, mesh)
    for k in ("mrr", "r@1", "r@5", "r@10", "mean_rank", "num_examples"):
        np.testing.assert_allclose(bucketed[k], direct[k], rtol=1e-6,
                                   err_msg=k)


def test_bucketed_respects_round_valid():
    cfg, split, vocab = _setup()
    rv = np.ones_like(split.gt_ind)
    rv[0, 1:] = 0
    split.round_valid = rv
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    params = init_train_state(cfg).params
    m = evaluate_split(params, split, vocab, cfg, mesh)
    assert m["num_examples"] == int(rv.sum())


def test_bucketed_on_mesh_matches_single_device_direct():
    """The bucketed path's replicated-joint + replicated-index layout must
    produce single-device-direct metrics over the full 8-device mesh."""
    cfg, split, vocab = _setup()
    params = init_train_state(cfg).params
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    direct = evaluate_split(params, split, vocab, cfg, mesh1,
                            eval_fn=make_eval_fn(cfg, mesh1),
                            table_fns=False, gen_fns=False)
    mesh8 = make_mesh(data=8, model=1)   # batch must cover the data axis
    bucketed = evaluate_split(params, split, vocab, cfg, mesh8, batch_size=8)
    for k in ("mrr", "r@1", "r@5", "r@10", "mean_rank", "num_examples"):
        np.testing.assert_allclose(bucketed[k], direct[k], rtol=1e-6,
                                   err_msg=k)

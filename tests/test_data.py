"""Golden-fixture data-layer tests (SURVEY.md §4 item 1): right-alignment,
history assembly (concat vs per-round facts), answer in/out, option gather.
"""

import numpy as np
import pytest

from visdial_tpu.data.loader import (
    BatchAssembler,
    EvalLoader,
    TrainLoader,
    _with_start_end,
    right_align,
)
from visdial_tpu.data.synthetic import make_synthetic_split
from tests.conftest import small_config


def test_right_align_exact():
    seq = np.array([[3, 4, 5, 0, 0], [7, 0, 0, 0, 0], [0, 0, 0, 0, 0]],
                   dtype=np.int32)
    lens = np.array([3, 1, 0])
    out = right_align(seq, lens)
    np.testing.assert_array_equal(
        out,
        [[0, 0, 3, 4, 5], [0, 0, 0, 0, 7], [0, 0, 0, 0, 0]],
    )


def test_right_align_nd():
    rng = np.random.default_rng(0)
    seq = np.zeros((2, 3, 6), np.int32)
    lens = rng.integers(0, 7, size=(2, 3))
    for i in range(2):
        for j in range(3):
            seq[i, j, : lens[i, j]] = rng.integers(1, 9, size=lens[i, j])
    out = right_align(seq, lens)
    for i in range(2):
        for j in range(3):
            L = lens[i, j]
            np.testing.assert_array_equal(out[i, j, 6 - L :], seq[i, j, :L])
            assert (out[i, j, : 6 - L] == 0).all()


def test_with_start_end():
    toks = np.array([[5, 6, 0, 0]], np.int32)
    t_in, t_out = _with_start_end(toks, np.array([2]), start=90, end=91)
    np.testing.assert_array_equal(t_in, [[90, 5, 6, 0, 0]])
    np.testing.assert_array_equal(t_out, [[5, 6, 91, 0, 0]])


@pytest.fixture(scope="module")
def data():
    cfg = small_config(encoder="lf-ques-im-hist", decoder="disc")
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=1)
    return split, vocab, cfg.replace(vocab_size=vocab.size)


def test_hist_concat_assembly(data):
    split, vocab, cfg = data
    cfg = cfg.replace(lf_hist_incremental=False)   # legacy per-round path
    asm = BatchAssembler(split, vocab, cfg)
    b = asm.assemble(np.array([0, 1]))
    Lh = cfg.max_hist_concat_len
    assert b.hist_concat.shape == (2, cfg.num_rounds, Lh)
    # round 0 history == right-aligned caption
    cap_len = split.cap_len[0]
    expected = split.cap[0, :cap_len]
    got = b.hist_concat[0, 0]
    np.testing.assert_array_equal(got[Lh - cap_len :], expected)
    assert (got[: Lh - cap_len] == 0).all()
    # round 2 history = cap + Q0 A0 + Q1 A1 (right-aligned)
    parts = [split.cap[0, : split.cap_len[0]]]
    for r in range(2):
        parts.append(split.ques[0, r, : split.ques_len[0, r]])
        parts.append(split.ans[0, r, : split.ans_len[0, r]])
    expected = np.concatenate(parts)
    got = b.hist_concat[0, 2]
    np.testing.assert_array_equal(got[Lh - len(expected) :], expected)


def test_hist_flat_assembly(data):
    """Incremental LF history: flat concat + prefix bounds line up with the
    per-round content."""
    split, vocab, cfg = data
    asm = BatchAssembler(split, vocab, cfg)   # lf_hist_incremental default
    b = asm.assemble(np.array([0, 1]))
    assert b.hist_concat is None
    Lh = cfg.max_hist_concat_len
    assert b.hist_flat.shape == (2, Lh)
    assert b.hist_bounds.shape == (2, cfg.num_rounds)
    # round r's prefix == caption + QA_0..QA_{r-1}
    parts = [split.cap[0, : split.cap_len[0]]]
    for r in range(cfg.num_rounds):
        expected = np.concatenate(parts)
        n = b.hist_bounds[0, r]
        assert n == len(expected)
        np.testing.assert_array_equal(b.hist_flat[0, :n], expected)
        parts.append(split.ques[0, r, : split.ques_len[0, r]])
        parts.append(split.ans[0, r, : split.ans_len[0, r]])
    assert (b.hist_flat[0, b.hist_bounds[0, -1]:] == 0).all()


def test_facts_assembly(data):
    split, vocab, cfg = data
    cfg2 = cfg.replace(encoder="mn-ques-im-hist")
    asm = BatchAssembler(split, vocab, cfg2)
    b = asm.assemble(np.array([0]))
    Lf = cfg.max_fact_len
    assert b.facts.shape == (1, cfg.num_rounds, Lf)
    # slot 0 = caption
    cl = split.cap_len[0]
    np.testing.assert_array_equal(b.facts[0, 0, Lf - cl :], split.cap[0, :cl])
    # slot 2 = QA_1 (question+answer of round index 1)
    qa = np.concatenate([
        split.ques[0, 1, : split.ques_len[0, 1]],
        split.ans[0, 1, : split.ans_len[0, 1]],
    ])[:Lf]
    np.testing.assert_array_equal(b.facts[0, 2, Lf - len(qa) :], qa)


def test_option_gather_contains_gt(data):
    split, vocab, cfg = data
    asm = BatchAssembler(split, vocab, cfg)
    b = asm.assemble(np.arange(4))
    assert b.opt.shape == (4, cfg.num_rounds, cfg.num_options, cfg.max_ans_len)
    # the candidate at gt_ind must equal the reference answer tokens
    for i in range(4):
        for r in range(cfg.num_rounds):
            gt = b.gt_ind[i, r]
            np.testing.assert_array_equal(b.opt[i, r, gt], split.ans[i, r])


def test_dedup_option_assembly_is_exact(data):
    """Dedup'd train batches (Config.disc_dedup_options): gathering the
    unique rows back through opt_row must reproduce the plain expanded
    option tokens exactly; filler rows are all-pad and never referenced."""
    split, vocab, cfg = data
    asm = BatchAssembler(split, vocab, cfg)
    idx = np.arange(6)
    plain = asm.assemble(idx)
    dd = asm.assemble(idx, dedup_options=True)
    assert dd.opt is None and dd.opt_uniq is not None
    assert dd.opt_uniq.shape == (plain.opt.size // plain.opt.shape[-1],
                                 plain.opt.shape[-1])
    np.testing.assert_array_equal(dd.opt_uniq[dd.opt_row], plain.opt)
    n_uniq = np.unique(plain.opt_inds).size
    assert (dd.opt_row < n_uniq).all()
    assert (dd.opt_uniq[n_uniq:] == 0).all()      # all-pad filler
    assert n_uniq < dd.opt_uniq.shape[0]          # real duplication exists


def test_train_loader_epoch(data):
    split, vocab, cfg = data
    loader = TrainLoader(split, vocab, cfg)
    batches = list(loader.epoch(seed=0))
    assert len(batches) == split.num_dialogs // cfg.batch_size
    for b in batches:
        assert b.ques.shape[0] == cfg.batch_size
    # deterministic under the same seed
    b2 = next(iter(loader.epoch(seed=0)))
    np.testing.assert_array_equal(batches[0].ques, b2.ques)


def test_eval_loader_pads_final_batch(data):
    split, vocab, cfg = data
    cfg = cfg.replace(batch_size=5)  # 8 dialogs -> 5 + 3(padded)
    loader = EvalLoader(split, vocab, cfg)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1].ques.shape[0] == 5
    np.testing.assert_array_equal(batches[1].dialog_valid, [1, 1, 1, 0, 0])


def test_gen_batch_has_answer_io():
    cfg = small_config(encoder="lf-ques", decoder="gen")
    split, vocab = make_synthetic_split(cfg, num_dialogs=4, seed=2)
    cfg = cfg.replace(vocab_size=vocab.size)
    asm = BatchAssembler(split, vocab, cfg)
    b = asm.assemble(np.arange(2))
    assert b.ans_in.shape == (2, cfg.num_rounds, cfg.max_ans_len + 1)
    assert (b.ans_in[:, :, 0] == vocab.start).all()
    # ans_out ends with <END> at position ans_len
    for i in range(2):
        for r in range(cfg.num_rounds):
            ln = split.ans_len[i, r]
            assert b.ans_out[i, r, ln] == vocab.end

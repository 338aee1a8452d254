"""Reference h5/json artifact ingestion (SURVEY.md §3.4 — "the contract").

Authors synthetic artifacts in the reference's schema (Lua-facing h5 written
by data/prepro.py + data/prepro_img.lua), exercising both known conventions
for each index field, and asserts the ingested split is identical to the
source-of-truth VisDialSplit it was authored from.
"""

import json
import os

import h5py
import numpy as np
import pytest

from tests.conftest import small_config
from visdial_tpu.data.dataset import load_split
from visdial_tpu.data.ingest_h5 import load_reference_split, main as ingest_main
from visdial_tpu.data.synthetic import make_synthetic_split


def _write_reference_artifacts(tmpdir, split_obj, vocab, split="train", *,
                               ans_index_mode="position1", img_pos_mode="lua",
                               mode="w"):
    """VisDialSplit -> reference-schema visdial_data.h5/params.json/data_img.h5.

    mode="a" appends a second split into existing files (the reference
    artifacts hold train and val datasets side by side in one h5)."""
    data_h5 = os.path.join(tmpdir, "visdial_data.h5")
    params_json = os.path.join(tmpdir, "visdial_params.json")
    img_h5 = os.path.join(tmpdir, "data_img.h5")

    n = split_obj.num_dialogs
    with h5py.File(data_h5, mode) as h:
        h[f"ques_{split}"] = split_obj.ques
        h[f"ques_length_{split}"] = split_obj.ques_len
        h[f"ans_{split}"] = split_obj.ans
        h[f"ans_length_{split}"] = split_obj.ans_len
        h[f"cap_{split}"] = split_obj.cap
        h[f"cap_length_{split}"] = split_obj.cap_len
        h[f"opt_list_{split}"] = split_obj.opt_list
        h[f"opt_length_{split}"] = split_obj.opt_list_len
        h[f"opt_{split}"] = split_obj.opt_inds + 1  # Lua 1-based rows
        if ans_index_mode == "position1":  # GT position among K, 1-based
            h[f"ans_index_{split}"] = split_obj.gt_ind + 1
        elif ans_index_mode == "row1":  # GT row in opt_list, 1-based
            gt_rows = np.take_along_axis(
                split_obj.opt_inds, split_obj.gt_ind[..., None], axis=2)[..., 0]
            h[f"ans_index_{split}"] = gt_rows + 1
        else:
            raise ValueError(ans_index_mode)
        if img_pos_mode == "lua":
            # store features permuted; img_pos maps dialog -> feature row
            perm = np.random.default_rng(1).permutation(n)
            h[f"img_pos_{split}"] = np.argsort(perm) + 1
        elif img_pos_mode == "absent":
            perm = np.arange(n)
        else:
            raise ValueError(img_pos_mode)

    with h5py.File(img_h5, mode) as h:
        h[f"images_{split}"] = split_obj.img_feat[perm]

    # reference params.json: 1-based word2ind WITHOUT <START>/<END>
    # (the reference dataloader appends them at runtime)
    word2ind = {w: i for w, i in vocab.word2ind.items()
                if w not in ("<START>", "<END>")}
    with open(params_json, "w") as f:
        json.dump({"word2ind": word2ind,
                   "ind2word": {str(i): w for w, i in word2ind.items()}}, f)
    return data_h5, params_json, img_h5


@pytest.fixture(scope="module")
def source(tmp_path_factory):
    cfg = small_config()
    split_obj, vocab = make_synthetic_split(cfg, num_dialogs=6, seed=3)
    return cfg, split_obj, vocab


def _assert_round_trip(got, want):
    np.testing.assert_array_equal(got.ques, want.ques)
    np.testing.assert_array_equal(got.ques_len, want.ques_len)
    np.testing.assert_array_equal(got.ans, want.ans)
    np.testing.assert_array_equal(got.cap, want.cap)
    np.testing.assert_array_equal(got.opt_list, want.opt_list)
    np.testing.assert_array_equal(got.opt_list_len, want.opt_list_len)
    np.testing.assert_array_equal(got.opt_inds, want.opt_inds)
    np.testing.assert_array_equal(got.gt_ind, want.gt_ind)
    np.testing.assert_allclose(got.img_feat, want.img_feat)


@pytest.mark.parametrize("ans_index_mode", ["position1", "row1"])
@pytest.mark.parametrize("img_pos_mode", ["lua", "absent"])
def test_ingest_round_trip(source, tmp_path, ans_index_mode, img_pos_mode):
    _, split_obj, vocab = source
    paths = _write_reference_artifacts(
        str(tmp_path), split_obj, vocab,
        ans_index_mode=ans_index_mode, img_pos_mode=img_pos_mode)
    got, got_vocab = load_reference_split(*paths, "train")
    _assert_round_trip(got, split_obj)
    # START/END appended at the reference dataloader's positions
    assert got_vocab.size == vocab.size
    assert got_vocab.start == vocab.start and got_vocab.end == vocab.end


def test_load_split_falls_back_to_reference_dir(source, tmp_path):
    """train/evaluate consume a reference-artifact directory with no
    conversion step (they call dataset.load_split)."""
    _, split_obj, vocab = source
    _write_reference_artifacts(str(tmp_path), split_obj, vocab)
    got, got_vocab = load_split(str(tmp_path), "train")
    _assert_round_trip(got, split_obj)
    assert got_vocab.size == vocab.size


def test_ingest_cli_repacks_to_npz(source, tmp_path):
    _, split_obj, vocab = source
    data_h5, params_json, img_h5 = _write_reference_artifacts(
        str(tmp_path), split_obj, vocab)
    out = tmp_path / "out"
    ingest_main(["--data_h5", data_h5, "--params_json", params_json,
                 "--img_h5", img_h5, "--out_dir", str(out),
                 "--splits", "train"])
    got, got_vocab = load_split(str(out), "train")
    _assert_round_trip(got, split_obj)
    assert got_vocab.size == vocab.size


def test_ingested_split_trains(source, tmp_path):
    """End-to-end: a reference-artifact directory feeds a real train step."""
    import jax

    from visdial_tpu.data.loader import TrainLoader
    from visdial_tpu.parallel.train_step import init_train_state, train_step

    cfg, split_obj, vocab = source
    _write_reference_artifacts(str(tmp_path), split_obj, vocab)
    data, voc = load_split(str(tmp_path), "train")
    cfg = cfg.replace(encoder="mn-ques-im-hist", decoder="disc",
                      vocab_size=voc.size, batch_size=2)
    state = init_train_state(cfg)
    batch = next(iter(TrainLoader(data, voc, cfg).epoch(seed=0))).as_dict()
    state, metrics = jax.jit(
        lambda s, b: train_step(s, b, cfg, impl="xla"))(state, batch)
    assert np.isfinite(float(np.asarray(metrics["loss"])))

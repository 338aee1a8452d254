"""v1.0 protocol additions at the harness/CLI level: full candidate
rankings (challenge submission dump) and NDCG over dense annotations.

The reference repo itself predates these (v0.9-era evaluate.lua), but its
ecosystem's v1.0 protocol is the natural completion of the eval surface;
prepro/loader already carry the variable-round v1.0 shapes (round_valid).
"""

import json

import numpy as np

import jax

from conftest import small_config

from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.eval_harness import evaluate_split
from visdial_tpu.evaluate import main as evaluate_main
from visdial_tpu.parallel.mesh import make_mesh
from visdial_tpu.parallel.train_step import init_train_state
from visdial_tpu.train import main as train_main

TRAIN_ARGS = [
    "--synthetic", "16", "--encoder", "lf-ques-im", "--decoder", "disc",
    "--embed_size", "8", "--rnn_hidden_size", "16", "--img_feat_size", "16",
    "--max_ques_len", "4", "--max_ans_len", "3", "--max_cap_len", "5",
    "--num_rounds", "3", "--num_options", "5", "--batch_size", "8",
    "--dropout", "0.0", "--log_every", "100", "--max_steps", "2",
    "--save_every", "2",
]


def test_collect_rankings_consistent_with_metrics():
    """cand_ranks are per-round permutations and reproduce the MRR the
    harness computes from GT ranks (continuous scores: no ties)."""
    cfg = small_config(encoder="lf-ques-hist", decoder="disc",
                       num_options=8, batch_size=4)
    split, vocab = make_synthetic_split(cfg, num_dialogs=10, seed=3)
    cfg = cfg.replace(vocab_size=vocab.size)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    params = init_train_state(cfg).params

    metrics, cand = evaluate_split(params, split, vocab, cfg, mesh,
                                   collect_rankings=True)
    assert cand.shape == (10, cfg.num_rounds, cfg.num_options)
    assert (np.sort(cand, axis=-1) == np.arange(1, cfg.num_options + 1)).all()
    gt_rank = np.take_along_axis(cand, split.gt_ind[..., None], -1)[..., 0]
    assert np.isclose(metrics["mrr"], np.mean(1.0 / gt_rank), atol=1e-6)
    # and the non-collecting call returns identical metrics
    plain = evaluate_split(params, split, vocab, cfg, mesh)
    assert np.isclose(plain["mrr"], metrics["mrr"], atol=1e-9)


def test_evaluate_cli_save_ranks_and_ndcg(tmp_path):
    root = str(tmp_path)
    train_main(TRAIN_ARGS + ["--save_path", root, "--run_name", "run"])
    load = f"{root}/run/step_00000002"
    ranks_path = f"{root}/ranks.json"
    eval_args = ["--load_path", load, "--synthetic", "16",
                 "--save_ranks", ranks_path]
    evaluate_main(eval_args)

    with open(ranks_path) as f:
        sub = json.load(f)
    assert len(sub) == 16 * 3                       # every (dialog, round)
    for e in sub:
        assert 1 <= e["round_id"] <= 3
        assert sorted(e["ranks"]) == [1, 2, 3, 4, 5]

    # dense annotations derived from the dump: relevance 1.0 on each
    # round-1 top-ranked candidate -> plumbing must score a perfect NDCG;
    # plus one unknown image -> counted missing, not crashed on.
    by_img = {}
    for e in sub:
        if e["round_id"] == 1:
            by_img[e["image_id"]] = e["ranks"]
    dense = [{"image_id": img, "round_id": 1,
              "gt_relevance": [1.0 if r == 1 else 0.0 for r in ranks]}
             for img, ranks in list(by_img.items())[:4]]
    dense.append({"image_id": 999999999, "round_id": 1,
                  "gt_relevance": [0.0, 1.0, 0.0, 0.0, 0.0]})
    dense_path = f"{root}/dense.json"
    with open(dense_path, "w") as f:
        json.dump(dense, f)

    metrics = evaluate_main(eval_args + ["--dense_json", dense_path])
    assert metrics["ndcg_rounds"] == 4
    assert metrics["ndcg_missing"] == 1
    assert np.isclose(metrics["ndcg"], 1.0)


def test_test_split_rounds_without_gt_are_dumped_not_ranked(tmp_path):
    """v1.0 TEST-split semantics: a round with a full candidate list but no
    answer/gt_index is SCOREABLE (appears in the --save_ranks dump) without
    being RANKABLE (excluded from metrics) — on both harness paths."""
    import sys
    sys.path.insert(0, "tests")
    from test_prepro import K, R, make_visdial_json

    from visdial_tpu.data.dataset import load_split
    from visdial_tpu.data.prepro import main as prepro_main

    d = tmp_path
    make_visdial_json(d / "train.json", 6, 40, 30, seed=0)
    make_visdial_json(d / "val.json", 6, 40, 30, seed=1)
    with open(d / "val.json") as f:
        raw = json.load(f)
    # dialog 0's last round becomes a submission round: options, no gt
    turn = raw["data"]["dialogs"][0]["dialog"][R - 1]
    del turn["answer"], turn["gt_index"]
    with open(d / "val.json", "w") as f:
        json.dump(raw, f)
    prepro_main([
        "--train_json", str(d / "train.json"),
        "--val_json", str(d / "val.json"),
        "--img_feats_train", "", "--img_feats_val", "",
        "--out_dir", str(d / "out"), "--min_count", "1",
        "--max_ques_len", "8", "--max_ans_len", "5", "--max_cap_len", "8",
        "--num_rounds", str(R), "--num_options", str(K),
    ])
    val, vocab = load_split(str(d / "out"), "val")
    assert val.round_valid[0, R - 1] == 0
    assert val.round_scoreable[0, R - 1] == 1

    cfg = small_config(vocab_size=vocab.size, encoder="lf-ques-hist",
                       decoder="disc", max_ques_len=8, max_ans_len=5,
                       max_cap_len=8, num_rounds=R, num_options=K,
                       batch_size=3, img_feat_size=1)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    params = init_train_state(cfg).params
    for kw in ({}, {"resident": True}):
        metrics, cand = evaluate_split(params, val, vocab, cfg, mesh,
                                       collect_rankings=True, **kw)
        assert metrics["num_examples"] == 6 * R - 1          # gt-less excluded
        assert sorted(cand[0, R - 1]) == list(range(1, K + 1))  # but dumped


def test_ndcg_from_dense_rejects_out_of_range_round_ids():
    """round_id is 1-indexed; 0 or past-the-end ids must be counted
    missing, not wrap (negative index) onto another round's ranks."""
    from visdial_tpu.evaluate import ndcg_from_dense

    cand = np.tile(np.arange(1, 5, dtype=np.int32), (2, 3, 1))  # (N=2,R=3,K=4)
    rel = [1.0, 0.0, 0.0, 0.0]
    out = ndcg_from_dense(cand, np.array([10, 11]), [
        {"image_id": 10, "round_id": 0, "gt_relevance": rel},    # bad: 0
        {"image_id": 11, "round_id": 4, "gt_relevance": rel},    # bad: > R
    ])
    assert out["ndcg_rounds"] == 0
    assert out["ndcg_missing"] == 2


def test_v1_test_split_submission_flow_cli(tmp_path):
    """The complete v1.0 test-submission flow at the CLI: prepro
    --test_json (submission rounds: options, no gt) -> train on the
    prepro'd train split -> evaluate --split test --save_ranks."""
    import sys
    sys.path.insert(0, "tests")
    from test_prepro import K, R, make_visdial_json

    from visdial_tpu.data.prepro import main as prepro_main

    d = tmp_path
    make_visdial_json(d / "train.json", 8, 40, 30, seed=0)
    make_visdial_json(d / "val.json", 4, 40, 30, seed=1)
    make_visdial_json(d / "test.json", 5, 40, 30, seed=2)
    with open(d / "test.json") as f:
        raw = json.load(f)
    for dlg in raw["data"]["dialogs"]:      # v1.0 test shape: last round
        del dlg["dialog"][R - 1]["answer"]  # has options but no gt
        del dlg["dialog"][R - 1]["gt_index"]
    with open(d / "test.json", "w") as f:
        json.dump(raw, f)

    out_dir = str(d / "out")
    prepro_main([
        "--train_json", str(d / "train.json"),
        "--val_json", str(d / "val.json"),
        "--test_json", str(d / "test.json"),
        "--img_feats_train", "", "--img_feats_val", "",
        "--out_dir", out_dir, "--min_count", "1",
        "--max_ques_len", "8", "--max_ans_len", "5", "--max_cap_len", "8",
        "--num_rounds", str(R), "--num_options", str(K),
    ])

    train_main([
        "--data_dir", out_dir, "--encoder", "lf-ques-hist",
        "--decoder", "disc",
        "--embed_size", "8", "--rnn_hidden_size", "16",
        "--img_feat_size", "1",
        "--max_ques_len", "8", "--max_ans_len", "5", "--max_cap_len", "8",
        "--num_rounds", str(R), "--num_options", str(K),
        "--batch_size", "8", "--dropout", "0.0", "--log_every", "100",
        "--max_steps", "2", "--save_every", "2",
        "--save_path", str(d / "ckpt"), "--run_name", "run",
    ])

    ranks_path = str(d / "ranks_test.json")
    metrics = evaluate_main([
        "--load_path", str(d / "ckpt/run/step_00000002"),
        "--data_dir", out_dir, "--split", "test",
        "--save_ranks", ranks_path,
    ])
    assert metrics["num_examples"] == 5 * (R - 1)     # gt-less rounds out
    with open(ranks_path) as f:
        sub = json.load(f)
    assert len(sub) == 5 * R                          # but all dumped
    final = [e for e in sub if e["round_id"] == R]
    assert len(final) == 5
    for e in final:
        assert sorted(e["ranks"]) == list(range(1, K + 1))

"""Model-matrix sweep CLI (SURVEY.md component: README results-table
generator).  The 18-combo artifact is produced on the real chip
(`sweep_synthetic.json`); this pins the CLI mechanics — per-combo train +
eval + one JSON results table — on a 2-combo CPU smoke."""

import json

from visdial_tpu.sweep import main as sweep_main

EXTRA = ("--embed_size 8 --rnn_hidden_size 16 --img_feat_size 16 "
         "--max_ques_len 4 --max_ans_len 3 --max_cap_len 5 "
         "--num_rounds 3 --num_options 5 --batch_size 8 "
         "--dropout 0.0 --log_every 100 --eval_every 0")


def test_sweep_two_combos_writes_results_table(tmp_path):
    out = str(tmp_path / "results.json")
    results = sweep_main([
        "--encoders", "lf-ques-im,mn-ques-hist", "--decoders", "disc",
        "--synthetic", "16", "--max_steps", "2",
        "--save_path", str(tmp_path / "ckpt"), "--out", out,
        "--extra", EXTRA,
    ])
    with open(out) as f:
        table = json.load(f)
    assert set(table) == {"lf-ques-im-disc", "mn-ques-hist-disc"} == \
        set(results)
    for v in table.values():
        assert {"mrr", "r@1", "r@5", "r@10", "mean_rank"} <= set(v)
        assert 0.0 <= v["mrr"] <= 1.0

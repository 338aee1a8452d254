"""Generation CLI + results-viewer contract (SURVEY.md components #3/#4).

The generate CLI's JSON is the viewer's input (`vis/index.html` reads
data.model / data.split / dialogs[].image_id / .caption /
.rounds[].question / .gt_answer / .generated / .log_prob).  Neither side
had an automated check: a renamed field would ship a blank viewer page.
This drives the real CLI end-to-end on a tiny synthetic gen checkpoint
and asserts exactly the contract the page renders.
"""

import json

from visdial_tpu.generate import main as generate_main
from visdial_tpu.train import main as train_main

ARGS = [
    "--synthetic", "8", "--encoder", "lf-ques-im", "--decoder", "gen",
    "--embed_size", "8", "--rnn_hidden_size", "16", "--img_feat_size", "16",
    "--max_ques_len", "4", "--max_ans_len", "3", "--max_cap_len", "5",
    "--num_rounds", "3", "--num_options", "5", "--batch_size", "8",
    "--dropout", "0.0", "--lr_decay_rate", "1.0", "--log_every", "100",
    "--eval_every", "0",
]


def test_generate_cli_emits_viewer_contract(tmp_path):
    root = str(tmp_path)
    train_main(ARGS + ["--max_steps", "2", "--save_every", "2",
                       "--save_path", root, "--run_name", "g"])
    out = f"{root}/gen.json"
    # --batch_size 4 is NOT divisible by the 8-device test mesh:
    # shard_batch must degrade that batch to replicated (a real multi-chip
    # usability case, invisible on one chip)
    generate_main(["--load_path", f"{root}/g/step_00000002",
                   "--synthetic", "8", "--num_dialogs", "3",
                   "--batch_size", "4", "--out_path", out])
    with open(out) as f:
        data = json.load(f)

    assert data["model"] == "lf-ques-im-gen"
    assert isinstance(data["split"], str)
    assert len(data["dialogs"]) == 3
    for d in data["dialogs"]:
        assert {"image_id", "caption", "rounds"} <= set(d)
        assert len(d["rounds"]) == 3
        for r in d["rounds"]:
            assert {"question", "gt_answer", "generated",
                    "log_prob"} <= set(r)
            assert isinstance(r["generated"], str)
            assert isinstance(r["log_prob"], float)


def test_generate_cli_beam_and_sample_modes(tmp_path):
    """--beam_size and --sample paths produce the same contract."""
    root = str(tmp_path)
    train_main(ARGS + ["--max_steps", "2", "--save_every", "2",
                       "--save_path", root, "--run_name", "g2"])
    for extra in (["--beam_size", "2"], ["--sample", "--temperature", "0.7"]):
        out = f"{root}/gen_{extra[0][2:]}.json"
        generate_main(["--load_path", f"{root}/g2/step_00000002",
                       "--synthetic", "8", "--num_dialogs", "2",
                       "--out_path", out] + extra)
        with open(out) as f:
            data = json.load(f)
        assert len(data["dialogs"]) == 2
        for d in data["dialogs"]:
            for r in d["rounds"]:
                assert isinstance(r["generated"], str)

"""CLI-level deterministic resume: interrupting mid-epoch and resuming must
reproduce the unbroken run's parameters exactly (SURVEY.md §5 — resume is
the recovery story; the reference could not resume at all)."""

import numpy as np
import pytest

from visdial_tpu.train import main as train_main
from visdial_tpu.utils.checkpoint import load_checkpoint

from conftest import tree_allclose

ARGS = [
    "--synthetic", "24", "--encoder", "lf-ques-im", "--decoder", "disc",
    "--embed_size", "8", "--rnn_hidden_size", "16", "--img_feat_size", "16",
    "--max_ques_len", "4", "--max_ans_len", "3", "--max_cap_len", "5",
    "--num_rounds", "3", "--num_options", "5", "--batch_size", "8",
    "--dropout", "0.0", "--lr_decay_rate", "1.0", "--log_every", "100",
    "--prng_impl", "threefry2x32",
]
# 24 dialogs / batch 8 = 3 steps per epoch; 7 steps ends mid-epoch 3


def _params_at(ckpt_root, run, step):
    state, _, _ = load_checkpoint(f"{ckpt_root}/{run}/step_{step:08d}")
    return state.params


def test_cli_mid_epoch_resume_is_deterministic(tmp_path):
    root = str(tmp_path)
    # unbroken: 7 steps
    train_main(ARGS + ["--max_steps", "7", "--save_every", "7",
                       "--save_path", root, "--run_name", "unbroken"])
    # interrupted: 4 steps (mid-epoch 2), then resume to 7
    train_main(ARGS + ["--max_steps", "4", "--save_every", "4",
                       "--save_path", root, "--run_name", "resumed"])
    train_main(ARGS + ["--max_steps", "7", "--save_every", "7", "--resume",
                       "--save_path", root, "--run_name", "resumed"])

    p_unbroken = _params_at(root, "unbroken", 7)
    p_resumed = _params_at(root, "resumed", 7)
    tree_allclose(p_unbroken, p_resumed, atol=1e-6)
    assert float(np.asarray(
        next(iter(p_unbroken["embed"].values())))[1, 0]) != 0.0


def test_grouped_dispatch_resume_matches_per_step_run(tmp_path):
    """--steps_per_dispatch composes with deterministic resume: a grouped
    run interrupted mid-epoch and resumed must land on exactly the
    parameters of an unbroken PER-STEP run (the batch order is a pure
    function of (seed, epoch) either way; epoch tails and max_steps trims
    fall back to per-step dispatch inside the grouped loop)."""
    root = str(tmp_path)
    train_main(ARGS + ["--max_steps", "7", "--save_every", "7",
                       "--save_path", root, "--run_name", "perstep"])
    # grouped: 2 steps/dispatch; 4 steps then resume to 7 (odd tail)
    train_main(ARGS + ["--max_steps", "4", "--save_every", "4",
                       "--steps_per_dispatch", "2",
                       "--save_path", root, "--run_name", "grouped"])
    train_main(ARGS + ["--max_steps", "7", "--save_every", "7", "--resume",
                       "--steps_per_dispatch", "2",
                       "--save_path", root, "--run_name", "grouped"])
    tree_allclose(_params_at(root, "perstep", 7),
                  _params_at(root, "grouped", 7), atol=1e-6)


def test_resume_with_mismatched_config_fails_loudly(tmp_path):
    """A resume whose flags disagree with the checkpoint's structural config
    (architecture, sizes, lr, ...) must abort, not silently train
    current-flag math against old weights."""
    root = str(tmp_path)
    train_main(ARGS + ["--max_steps", "2", "--save_every", "2",
                       "--save_path", root, "--run_name", "run"])
    with pytest.raises(SystemExit, match="rnn_hidden_size"):
        train_main(ARGS + ["--max_steps", "4", "--resume",
                           "--rnn_hidden_size", "32",
                           "--save_path", root, "--run_name", "run"])
    with pytest.raises(SystemExit, match="learning_rate"):
        train_main(ARGS + ["--max_steps", "4", "--resume",
                           "--learning_rate", "0.1",
                           "--save_path", root, "--run_name", "run"])
    # run-control overrides stay allowed
    train_main(ARGS + ["--max_steps", "4", "--resume", "--log_every", "1",
                       "--save_every", "4",
                       "--save_path", root, "--run_name", "run"])

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


def test_cross_mesh_resume_matches_unbroken_run(tmp_path):
    """mesh_data/mesh_model are RESUME_OVERRIDABLE (config.py): the recovery
    story (SURVEY.md §5) includes resuming a checkpoint on a replacement
    slice with a DIFFERENT shape.  Train 4 steps on the (8,1) mesh, resume
    to 7 on (4,2) and on (1,1); both must land on the unbroken 8-device
    run's parameters (checkpoints are mesh-agnostic host arrays; jit
    reshards the loaded state to each mesh's layout of record)."""
    root = str(tmp_path)
    base = ARGS + ["--mesh_data", "8", "--mesh_model", "1"]
    train_main(base + ["--max_steps", "7", "--save_every", "7",
                       "--save_path", root, "--run_name", "unbroken"])
    for name, (d, m) in {"mesh42": (4, 2), "mesh11": (1, 1)}.items():
        train_main(base + ["--max_steps", "4", "--save_every", "4",
                           "--save_path", root, "--run_name", name])
        train_main(ARGS + ["--mesh_data", str(d), "--mesh_model", str(m),
                           "--max_steps", "7", "--save_every", "7",
                           "--resume", "--save_path", root,
                           "--run_name", name])
        tree_allclose(_params_at(root, "unbroken", 7),
                      _params_at(root, name, 7), atol=1e-6)


def test_resumed_state_lands_vocab_leaves_on_model_axis(tmp_path):
    """A checkpoint loaded back and shard_train_state'd onto a mesh with a
    real model axis must actually place the vocab-dimensioned leaves on
    'model' (the TP layout of record), not silently replicate them."""
    import jax
    from jax.sharding import PartitionSpec as P

    from visdial_tpu.parallel.mesh import make_mesh
    from visdial_tpu.parallel.train_step import (init_train_state,
                                                 shard_train_state)
    from visdial_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from tests.conftest import small_config

    cfg = small_config(vocab_size=512, decoder="gen")  # divisible by model=2
    path = save_checkpoint(str(tmp_path), init_train_state(cfg), cfg)
    state, _, _ = load_checkpoint(path)
    mesh = make_mesh(data=4, model=2, devices=jax.devices())
    state = shard_train_state(state, cfg, mesh)
    assert state.params["embed"]["table"].sharding.spec == P("model", None)
    assert state.params["decoder"]["out_proj"]["w"].sharding.spec == \
        P(None, "model")
    # LSTM weights stay replicated at this model scale
    assert state.params["decoder"]["lm_lstm"]["layers"][0]["w"] \
        .sharding.spec == P()


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

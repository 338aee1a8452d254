"""Dense-annotation fine-tuning (v1.0 NDCG phase): the CE-on-relevance
objective must actually move the model toward the dense targets — NDCG on
the annotated rounds rises and the fine-tune loss falls — through the
real CLI (load checkpoint -> DenseLoader -> make_dense_train_fn ->
checkpoint)."""

import json

import numpy as np

from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.finetune import main as finetune_main
from visdial_tpu.train import main as train_main
from visdial_tpu.utils.checkpoint import load_checkpoint

TRAIN_ARGS = [
    "--synthetic", "16", "--encoder", "lf-ques-im", "--decoder", "disc",
    "--embed_size", "8", "--rnn_hidden_size", "16", "--img_feat_size", "16",
    "--max_ques_len", "4", "--max_ans_len", "3", "--max_cap_len", "5",
    "--num_rounds", "3", "--num_options", "5", "--batch_size", "8",
    "--dropout", "0.0", "--log_every", "100", "--max_steps", "2",
    "--save_every", "2",
]


def test_finetune_raises_ndcg_and_lowers_loss(tmp_path, capsys):
    root = str(tmp_path)
    train_main(TRAIN_ARGS + ["--save_path", root, "--run_name", "base"])
    load = f"{root}/base/step_00000002"

    # dense targets DISAGREEING with the sparse gt: relevance 1.0 on a
    # fixed non-gt slot of round 2 for every dialog — the model must be
    # pulled toward them, which only the dense objective can do
    _, cfg, _ = load_checkpoint(load)
    split, _ = make_synthetic_split(cfg, num_dialogs=16, seed=cfg.seed + 1)
    dense = []
    for i in range(16):
        slot = (int(split.gt_ind[i, 1]) + 2) % cfg.num_options
        rel = [0.0] * cfg.num_options
        rel[slot] = 1.0
        dense.append({"image_id": int(split.img_ids[i]), "round_id": 2,
                      "gt_relevance": rel})
    dense_path = f"{root}/dense.json"
    with open(dense_path, "w") as f:
        json.dump(dense, f)

    out = finetune_main([
        "--load_path", load, "--dense_json", dense_path,
        "--synthetic", "16", "--steps", "30", "--learning_rate", "0.02",
        "--save_path", root, "--run_name", "ft", "--eval_every", "0",
    ])
    capsys.readouterr()                      # swallow the JSONL stream
    assert out["ndcg_after"] > out["ndcg_before"] + 0.05, out
    assert out["last_loss"] < out["first_loss"] * 0.8, out

    # the fine-tuned checkpoint reloads and evaluates
    state, cfg2, _ = load_checkpoint(out["checkpoint"])
    assert cfg2.decoder == "disc"
    leaf = next(iter(jax_leaves(state.params)))
    assert np.isfinite(np.asarray(leaf)).all()


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_dense_train_step_on_two_axis_mesh():
    """make_dense_train_fn runs over a (4,2) mesh (vocab-sharded embed
    active) and matches the single-device step's loss exactly."""
    import jax
    import numpy as np

    from conftest import small_config

    from visdial_tpu.data.loader import DenseLoader
    from visdial_tpu.parallel.mesh import make_mesh, shard_batch
    from visdial_tpu.parallel.train_step import (
        init_train_state,
        make_dense_train_fn,
        shard_train_state,
    )

    cfg = small_config(encoder="mn-ques-im-hist", decoder="disc",
                       batch_size=8, dropout=0.0)
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=11)
    cfg = cfg.replace(vocab_size=vocab.size)
    dense = [{"image_id": int(split.img_ids[i]), "round_id": 1,
              "gt_relevance": [1.0] + [0.0] * (cfg.num_options - 1)}
             for i in range(8)]
    batch = next(DenseLoader(split, vocab, cfg, dense).epoch(seed=0))

    losses = {}
    for shape in ((1, 1), (4, 2)):
        mesh = make_mesh(*shape, devices=jax.devices()[: shape[0] * shape[1]])
        state = shard_train_state(init_train_state(cfg), cfg, mesh)
        _, m = make_dense_train_fn(cfg, mesh)(state, shard_batch(batch, mesh))
        losses[shape] = float(np.asarray(m["loss"]))
    assert np.isfinite(losses[(1, 1)])
    assert np.isclose(losses[(1, 1)], losses[(4, 2)], atol=1e-5), losses

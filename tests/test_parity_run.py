"""Rehearsal of the parity runbook (scripts/parity_run.py).

SURVEY.md §4 item 6 is the real-data acceptance test; this rehearses its
exact composition end-to-end on synthetic data authored in the REFERENCE
artifact schema: h5/json artifacts -> ingest (Lua index-base detection) ->
feature sanity -> train both acceptance models through the train CLI ->
evaluate the final checkpoints through the evaluate CLI -> summary deltas.
The first real-data session then only swaps the artifact paths.
"""

import dataclasses
import json
import os
import sys

import numpy as np
import pytest

from tests.conftest import small_config
from tests.test_ingest_h5 import _write_reference_artifacts
from visdial_tpu.data.synthetic import make_synthetic_split

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_parity_runbook_rehearsal(tmp_path):
    from parity_run import main as parity_main

    cfg = small_config(dropout=0.5)
    train_split, vocab = make_synthetic_split(cfg, num_dialogs=40, seed=0)
    val_split, _ = make_synthetic_split(cfg, num_dialogs=12, vocab=vocab,
                                        seed=1)
    data_dir = tmp_path / "artifacts"
    data_dir.mkdir()
    _write_reference_artifacts(str(data_dir), train_split, vocab, "train")
    _write_reference_artifacts(str(data_dir), val_split, vocab, "val",
                               mode="a")

    dims = {f: getattr(cfg, f) for f in (
        "embed_size", "rnn_hidden_size", "img_feat_size", "img_embed_size",
        "max_ques_len", "max_ans_len", "max_cap_len", "num_rounds",
        "num_options")}
    dims.update(batch_size=8,              # divisible by the 8-device mesh
                dropout=0.0, learning_rate=0.005, lr_decay_rate=1.0,
                eval_every=40, save_every=40, log_every=20)
    dims_json = tmp_path / "dims.json"
    dims_json.write_text(json.dumps(dims))

    summary = parity_main([
        "--data_dir", str(data_dir),
        "--work_dir", str(tmp_path / "runs"),
        "--config_json", str(dims_json),
        "--max_steps", "40",
        "--steps_per_dispatch", "4",
        "--no-check",                      # synthetic targets are not real
    ])

    # Both acceptance models trained, checkpointed, and re-evaluated
    # through the CLIs; MRRs finite and clearly above chance (1/12 options
    # -> random MRR ~0.26).
    for key in ("lf-disc", "mn-gen"):
        mrr = summary[f"{key}_mrr"]
        assert np.isfinite(mrr) and 0.0 < mrr <= 1.0
        assert np.isfinite(summary[f"{key}_delta"])
        ckpt_root = tmp_path / "runs" / f"parity-{key}"
        assert any(p.startswith("step_") for p in os.listdir(ckpt_root))
    assert summary["lf-disc_mrr"] > 0.30   # learnable synthetic structure


@pytest.mark.slow
def test_parity_runbook_feature_check_catches_broken_features(tmp_path):
    """A NaN-poisoned data_img.h5 must abort before any training starts."""
    import h5py

    from parity_run import main as parity_main

    cfg = small_config()
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=2)
    data_dir = tmp_path / "artifacts"
    data_dir.mkdir()
    _write_reference_artifacts(str(data_dir), split, vocab, "train")
    _write_reference_artifacts(str(data_dir), split, vocab, "val", mode="a")
    with h5py.File(data_dir / "data_img.h5", "a") as h:
        feats = np.asarray(h["images_train"])
        feats[0, 0] = np.nan
        del h["images_train"]
        h["images_train"] = feats

    dims = {f: getattr(cfg, f) for f in (
        "embed_size", "rnn_hidden_size", "img_feat_size", "img_embed_size",
        "max_ques_len", "max_ans_len", "max_cap_len", "num_rounds",
        "num_options", "batch_size")}
    dims_json = tmp_path / "dims.json"
    dims_json.write_text(json.dumps(dims))

    with pytest.raises(SystemExit, match="image feature check failed"):
        parity_main(["--data_dir", str(data_dir),
                     "--work_dir", str(tmp_path / "runs"),
                     "--config_json", str(dims_json),
                     "--max_steps", "4"])
    assert not (tmp_path / "runs").exists()    # aborted before training

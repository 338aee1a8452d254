"""Interactive inference engine: raw-text queries through a checkpoint."""

import jax
import numpy as np

from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.infer import InferenceEngine
from visdial_tpu.parallel.train_step import init_train_state
from visdial_tpu.utils.checkpoint import save_checkpoint

from conftest import small_config


def _checkpoint(tmp_path, decoder, encoder="mn-ques-im-hist"):
    cfg = small_config(encoder=encoder, decoder=decoder)
    _, vocab = make_synthetic_split(cfg, num_dialogs=4, seed=0)
    cfg = cfg.replace(vocab_size=vocab.size)
    state = init_train_state(cfg)
    return save_checkpoint(str(tmp_path / decoder), state, cfg)


def test_rank_answers_disc(tmp_path):
    path = _checkpoint(tmp_path, "disc")
    eng = InferenceEngine(path, synthetic=8)
    out = eng.rank_answers("w002 w001", caption="w003 w004",
                           history=[("w001", "w002 w003")], top_k=4)
    assert len(out) == 4
    scores = [o["score"] for o in out]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(o["answer"], str) and o["answer"] for o in out)
    # determinism
    out2 = eng.rank_answers("w002 w001", caption="w003 w004",
                            history=[("w001", "w002 w003")], top_k=4)
    assert [o["answer"] for o in out] == [o["answer"] for o in out2]


def test_generate_answer_gen(tmp_path):
    path = _checkpoint(tmp_path, "gen")
    eng = InferenceEngine(path, synthetic=8)
    greedy = eng.generate_answer("w002 w001", caption="w003")
    assert isinstance(greedy["answer"], str)
    assert greedy["log_prob"] <= 0.0
    beam = eng.generate_answer("w002 w001", caption="w003", beam_size=3)
    # a width-3 beam can only match or beat greedy
    assert beam["log_prob"] >= greedy["log_prob"] - 1e-4


def test_rank_answers_lf_incremental_history(tmp_path):
    """LF checkpoints serve through the incremental-history path."""
    path = _checkpoint(tmp_path, "disc", encoder="lf-ques-im-hist")
    eng = InferenceEngine(path, synthetic=8)
    out = eng.rank_answers("w002 w001", caption="w003 w004",
                           history=[("w001", "w002"), ("w005", "w006")],
                           top_k=3)
    assert len(out) == 3
    # history must influence the scores (same question, different history)
    out2 = eng.rank_answers("w002 w001", caption="w003 w004",
                            history=[("w010", "w011")], top_k=3)
    assert ([o["score"] for o in out] != [o["score"] for o in out2])


def test_engine_from_in_memory_components():
    """Embedding/serving-bench route: build the engine without a
    checkpoint from (state, cfg, data, vocab)."""
    from conftest import small_config

    from visdial_tpu.data.synthetic import make_synthetic_split
    from visdial_tpu.parallel.train_step import init_train_state

    cfg = small_config(encoder="lf-ques-hist", decoder="disc")
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=0)
    cfg = cfg.replace(vocab_size=vocab.size)
    eng = InferenceEngine(state=init_train_state(cfg), cfg=cfg,
                          data=split, vocab=vocab)
    top = eng.rank_answers("tok1 tok2 ?", caption="tok3",
                           history=[("tok4 ?", "tok5")], top_k=3)
    assert len(top) == 3 and all("answer" in t and "score" in t for t in top)


def test_cli_json_lines_loop(tmp_path, monkeypatch, capsys):
    """The serving CLI surface itself (SURVEY-beyond component): one JSON
    query per stdin line -> one JSON answer per stdout line, with a bad
    request producing an error line instead of a dead server."""
    import io
    import json

    from visdial_tpu.infer import main as infer_main

    ckpt = _checkpoint(tmp_path, "disc")
    queries = "\n".join([
        json.dumps({"question": "w010 w011 ?", "caption": "w012"}),
        "{not json",                              # must not kill the loop
        json.dumps({"question": "w013 ?",
                    "history": [["w014 ?", "w015"]]}),
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(queries))
    infer_main(["--load_path", ckpt, "--synthetic", "4", "--top_k", "3"])

    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["event"] == "ready"
    assert len(lines) == 4                        # ready + 3 responses
    assert len(lines[1]["answers"]) == 3
    assert all("answer" in a and "score" in a for a in lines[1]["answers"])
    assert "error" in lines[2] and "JSONDecodeError" in lines[2]["error"]
    assert len(lines[3]["answers"]) == 3          # loop survived the error

"""Offline data pipeline: VisDial-JSON -> artifacts -> loader round trip,
and the VGG-16 feature extractor (reference: data/prepro.py +
data/prepro_img.lua equivalents)."""

import json
import os

import numpy as np
import pytest

from visdial_tpu.data.dataset import load_split
from visdial_tpu.data.prepro import main as prepro_main, tokenize

from conftest import small_config

R, K = 4, 6  # small protocol for fixtures


def make_visdial_json(path, num_dialogs, num_q, num_a, seed=0):
    """Minimal released-schema VisDial JSON."""
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(30)] + ["a", "the", "dog", "red", "no"]
    def sent(n):
        return " ".join(rng.choice(words, size=n))
    questions = [sent(rng.integers(2, 6)) + " ?" for _ in range(num_q)]
    answers = [sent(rng.integers(1, 4)) for _ in range(num_a)]
    dialogs = []
    for i in range(num_dialogs):
        rounds = []
        for _ in range(R):
            ai = int(rng.integers(0, num_a))
            opts = rng.choice([x for x in range(num_a) if x != ai],
                              size=K - 1, replace=False).tolist()
            slot = int(rng.integers(0, K))
            opts.insert(slot, ai)
            rounds.append({"question": int(rng.integers(0, num_q)),
                           "answer": ai, "answer_options": opts,
                           "gt_index": slot})
        dialogs.append({"image_id": 1000 + i, "caption": sent(5),
                        "dialog": rounds})
    with open(path, "w") as f:
        json.dump({"data": {"questions": questions, "answers": answers,
                            "dialogs": dialogs}, "version": "0.9"}, f)


def test_tokenize_lowercase_and_punct():
    toks = tokenize("Is there a Dog?")
    assert toks == ["is", "there", "a", "dog", "?"]


def test_tokenizer_matches_frozen_fixture():
    """Tokenizer parity pin (SURVEY.md hard part #1): 57 representative
    VisDial-style strings (contractions, possessives, punctuation, quotes,
    multi-sentence answers, abbreviations, numerals) with frozen expected
    token lists.  Runs against whichever branch is active (word_tokenize
    when punkt data is installed, the sentence-split + NLTKWordTokenizer
    fallback otherwise) — a divergent nltk behavior fails here instead of
    silently shifting the vocabulary and wrecking MRR parity."""
    fix_path = os.path.join(os.path.dirname(__file__), "golden",
                            "token_fixture.json")
    with open(fix_path) as f:
        fixture = json.load(f)
    assert len(fixture) >= 50
    for text, expected in fixture:
        assert tokenize(text) == expected, f"tokenizer drift on {text!r}"


def test_vocab_content_hash_roundtrip(tmp_path):
    """prepro stores a sha256 of the vocab in visdial_params.json; load
    verifies it, and a tampered artifact fails loudly."""
    from visdial_tpu.data.dataset import Vocabulary

    vocab = Vocabulary.build([["a", "b", "a"], ["a", "b", "c"]], min_count=2)
    path = str(tmp_path / "visdial_params.json")
    vocab.save(path)
    with open(path) as f:
        payload = json.load(f)
    assert payload["vocab_sha256"] == vocab.content_hash()
    loaded = Vocabulary.load(path)          # hash validates silently
    assert loaded.word2ind == vocab.word2ind

    payload["word2ind"]["zzz"] = 99          # tamper
    with open(path, "w") as f:
        json.dump(payload, f)
    with pytest.raises(ValueError, match="vocab_sha256 mismatch"):
        Vocabulary.load(path)


@pytest.fixture(scope="module")
def prepro_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("prepro")
    make_visdial_json(d / "train.json", 12, 40, 30, seed=0)
    make_visdial_json(d / "val.json", 6, 40, 30, seed=1)
    feats = np.random.default_rng(0).standard_normal((12, 32)).astype(np.float32)
    np.savez(d / "feats_train.npz", images_train=feats)
    np.savez(d / "feats_val.npz", images_val=feats[:6])
    prepro_main([
        "--train_json", str(d / "train.json"),
        "--val_json", str(d / "val.json"),
        "--img_feats_train", str(d / "feats_train.npz"),
        "--img_feats_val", str(d / "feats_val.npz"),
        "--out_dir", str(d / "out"),
        "--min_count", "1",
        "--max_ques_len", "8", "--max_ans_len", "5", "--max_cap_len", "8",
        "--num_rounds", str(R), "--num_options", str(K),
    ])
    return str(d / "out")


def test_prepro_artifacts_roundtrip(prepro_dir):
    train, vocab = load_split(prepro_dir, "train")
    val, _ = load_split(prepro_dir, "val")
    assert train.num_dialogs == 12 and val.num_dialogs == 6
    assert train.num_rounds == R
    assert train.opt_inds.shape[2] == K
    # gt_ind points at the ground-truth answer row
    for i in range(train.num_dialogs):
        for r in range(R):
            gt_row = train.opt_inds[i, r, train.gt_ind[i, r]]
            np.testing.assert_array_equal(train.opt_list[gt_row],
                                          train.ans[i, r, :5])
    # pad index 0 never appears as a real token id
    assert vocab.size > 4
    assert 0 not in vocab.word2ind.values()


def test_prepro_feeds_loader(prepro_dir):
    from visdial_tpu.data.loader import TrainLoader

    train, vocab = load_split(prepro_dir, "train")
    cfg = small_config(
        vocab_size=vocab.size, encoder="mn-ques-im-hist", decoder="disc",
        max_ques_len=8, max_ans_len=5, max_cap_len=8,
        num_rounds=R, num_options=K, batch_size=4, img_feat_size=32,
    )
    batch = next(iter(TrainLoader(train, vocab, cfg).epoch(seed=0)))
    assert batch.ques.shape == (4, R, 8)
    # default disc train path is dedup'd: unique rows + gather map
    assert batch.opt is None
    assert batch.opt_uniq.shape == (4 * R * K, 5)
    assert batch.opt_row.shape == (4, R, K)
    assert batch.img.shape == (4, 32)
    # right alignment: last column is nonzero wherever the row has tokens
    lens = (batch.ques != 0).sum(-1)
    assert ((batch.ques[..., -1] != 0) == (lens > 0)).all()
    # dedup off restores the expanded layout, and the gather map
    # reconstructs exactly those rows
    plain_cfg = cfg.replace(disc_dedup_options=False)
    plain = next(iter(TrainLoader(train, vocab, plain_cfg).epoch(seed=0)))
    assert plain.opt.shape == (4, R, K, 5)
    np.testing.assert_array_equal(batch.opt_uniq[batch.opt_row], plain.opt)


@pytest.mark.slow
def test_vgg16_shapes_and_conversion(tmp_path):
    import jax

    from visdial_tpu.models import vgg16

    params = vgg16.init_params(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).integers(
        0, 255, size=(2, 224, 224, 3)).astype(np.uint8)
    feats = vgg16.apply(params, vgg16.preprocess(imgs))
    assert feats["fc7"].shape == (2, 4096)
    assert feats["pool5"].shape == (2, 7, 7, 512)

    # npz round trip through the documented key layout
    flat = {}
    for name, p in params.items():
        flat[f"{name}/w"] = np.asarray(p["w"])
        flat[f"{name}/b"] = np.asarray(p["b"])
    path = tmp_path / "vgg.npz"
    np.savez(path, **flat)
    params2 = vgg16.load_params(str(path))
    feats2 = vgg16.apply(params2, vgg16.preprocess(imgs))
    np.testing.assert_allclose(np.asarray(feats["fc7"]),
                               np.asarray(feats2["fc7"]), atol=1e-6)


@pytest.mark.slow
def test_prepro_img_cli_images_npz(tmp_path, prepro_dir):
    """Feature-extraction CLI end-to-end from a prebaked image array."""
    import jax

    from visdial_tpu.data.prepro_img import main as img_main
    from visdial_tpu.models import vgg16

    with np.load(os.path.join(prepro_dir, "visdial_data_val.npz")) as z:
        n = z["img_ids"].shape[0]
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(n, 224, 224, 3)).astype(np.uint8)
    np.savez(tmp_path / "images.npz", images=images)

    params = vgg16.init_params(jax.random.PRNGKey(0))
    flat = {}
    for name, prm in params.items():
        flat[f"{name}/w"] = np.asarray(prm["w"])
        flat[f"{name}/b"] = np.asarray(prm["b"])
    np.savez(tmp_path / "vgg.npz", **flat)

    img_main([
        "--split_npz", os.path.join(prepro_dir, "visdial_data_val.npz"),
        "--weights", str(tmp_path / "vgg.npz"),
        "--images_npz", str(tmp_path / "images.npz"),
        "--out", str(tmp_path / "feats.npz"),
        "--batch_size", "4",
    ])
    with np.load(tmp_path / "feats.npz") as z:
        feats = z["images_val"]
    assert feats.shape == (n, 4096)
    assert np.isfinite(feats).all()
    # tail batch (n=6, bs=4) must not be padded garbage: recompute row n-1
    direct = vgg16.apply(params, vgg16.preprocess(images[n - 1:n]))["fc7"]
    np.testing.assert_allclose(feats[n - 1], np.asarray(direct)[0], atol=1e-4)


def test_prepro_v10_variable_rounds(tmp_path):
    """v1.0-style data: short dialogs and incompletely annotated rounds are
    padded + masked (round_valid), not rejected (ADVICE r1: the prepro CLI
    previously hard-asserted fixed shapes and aborted on v1.0 val/test)."""
    import jax

    from visdial_tpu.data.loader import EvalLoader, TrainLoader
    from visdial_tpu.eval_harness import evaluate_split
    from visdial_tpu.parallel.mesh import make_mesh
    from visdial_tpu.parallel.train_step import init_train_state, train_step

    d = tmp_path
    make_visdial_json(d / "train.json", 8, 40, 30, seed=0)
    make_visdial_json(d / "val.json", 6, 40, 30, seed=1)
    # mutate val into v1.0-test-like shape: dialog 0 has 2 rounds; dialog 1's
    # round 1 lacks answer_options; dialog 2's round 2 lacks the answer
    with open(d / "val.json") as f:
        raw = json.load(f)
    dialogs = raw["data"]["dialogs"]
    dialogs[0]["dialog"] = dialogs[0]["dialog"][:2]
    del dialogs[1]["dialog"][1]["answer_options"]
    del dialogs[1]["dialog"][1]["gt_index"]
    del dialogs[2]["dialog"][2]["answer"]
    del dialogs[2]["dialog"][2]["gt_index"]
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
    want = np.ones((6, R), np.int32)
    want[0, 2:] = 0   # truncated dialog
    want[1, 1] = 0    # no options
    want[2, 2] = 0    # no answer
    np.testing.assert_array_equal(val.round_valid, want)

    cfg = small_config(
        vocab_size=vocab.size, encoder="lf-ques-hist", decoder="disc",
        max_ques_len=8, max_ans_len=5, max_cap_len=8,
        num_rounds=R, num_options=K, batch_size=3, img_feat_size=1,
    )
    # masked rounds reach neither metrics...
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    metrics = evaluate_split(init_train_state(cfg).params, val, vocab, cfg,
                             mesh)
    assert metrics["num_examples"] == int(want.sum())
    # ...nor the training loss (finite even with invalid rounds in-batch)
    state = init_train_state(cfg)
    batch = next(iter(TrainLoader(val, vocab, cfg).epoch(seed=0))).as_dict()
    for decoder in ("disc", "gen"):
        dcfg = cfg.replace(decoder=decoder)
        b = (batch if decoder == "disc" else
             next(iter(EvalLoader(val, vocab, dcfg, batch_size=3))).as_dict())
        st = init_train_state(dcfg)
        st, m = jax.jit(lambda s, x: train_step(s, x, dcfg, impl="xla"))(st, b)
        assert np.isfinite(float(np.asarray(m["loss"])))


def test_gen_trains_on_answer_only_rounds(tmp_path):
    """round_valid means RANKABLE (candidates+gt); gen training masks on
    answer presence instead, so a round with an answer but no candidate
    list still trains the LM (code-review r2 finding)."""
    import jax
    import jax.numpy as jnp

    from visdial_tpu.data.loader import BatchAssembler
    from visdial_tpu.models.model import model_init, model_loss

    d = tmp_path
    make_visdial_json(d / "train.json", 4, 40, 30, seed=0)
    with open(d / "train.json") as f:
        raw = json.load(f)
    # dialog 0 round 1: answer present, candidates absent -> not rankable
    del raw["data"]["dialogs"][0]["dialog"][1]["answer_options"]
    del raw["data"]["dialogs"][0]["dialog"][1]["gt_index"]
    with open(d / "train.json", "w") as f:
        json.dump(raw, f)
    prepro_main([
        "--train_json", str(d / "train.json"),
        "--val_json", str(d / "train.json"),
        "--img_feats_train", "", "--img_feats_val", "",
        "--out_dir", str(d / "out"), "--min_count", "1",
        "--max_ques_len", "8", "--max_ans_len", "5", "--max_cap_len", "8",
        "--num_rounds", str(R), "--num_options", str(K),
    ])
    split, vocab = load_split(str(d / "out"), "train")
    assert split.round_valid[0, 1] == 0          # not rankable...
    assert split.ans_len[0, 1] > 0               # ...but has an answer

    cfg = small_config(vocab_size=vocab.size, encoder="lf-ques",
                       decoder="gen", max_ques_len=8, max_ans_len=5,
                       max_cap_len=8, num_rounds=R, num_options=K,
                       batch_size=4, img_feat_size=1)
    # scale params away from init: a fresh init's LM is near-uniform, so
    # every token costs ~ln(V) and removing a round would not move the
    # mean measurably
    params = jax.tree.map(lambda x: x * 5.0,
                          model_init(jax.random.PRNGKey(0), cfg))
    batch = BatchAssembler(split, vocab, cfg).assemble(
        np.arange(4), with_options=False).as_dict()
    loss = float(model_loss(params, batch, cfg, train=False, impl="xla"))

    # removing that round's answer must CHANGE the gen loss (its tokens
    # were in the masked mean, i.e. the round trains despite round_valid=0)
    b2 = dict(batch)
    ai = np.array(batch["ans_in"]);  ao = np.array(batch["ans_out"])
    ai[0, 1, 1:] = 0
    ao[0, 1, :] = 0
    b2["ans_in"], b2["ans_out"] = ai, ao
    loss2 = float(model_loss(params, b2, cfg, train=False, impl="xla"))
    assert abs(loss - loss2) > 1e-5

    # ...whereas an answerless round's spurious lone-<END> target (what
    # the loader emits for padded rounds) must contribute NOTHING
    b3 = dict(b2)
    ao3 = np.array(ao)
    ao3[0, 1, 0] = vocab.end
    b3["ans_out"] = ao3
    loss3 = float(model_loss(params, b3, cfg, train=False, impl="xla"))
    assert loss3 == loss2

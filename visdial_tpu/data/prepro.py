"""Offline dialog preprocessing — the `data/prepro.py` equivalent.

Reads VisDial-format JSON (the released v0.9/v1.0 schema:
``{"data": {"questions": [...], "answers": [...], "dialogs": [...]}}`` with
per-dialog ``image_id``, ``caption`` and per-round ``question``/``answer``/
``answer_options``/``gt_index`` indices into the shared string lists),
tokenizes, builds the vocabulary from the train split (min count 5,
reference: data/prepro.py word-count threshold), encodes and pads, keeps the
deduplicated candidate-answer list + per-round option *indices* (the
reference's memory trick), and writes the loader's artifacts:

    visdial_data_train.npz / visdial_data_val.npz   (VisDialSplit arrays)
    visdial_params.json                             (word2ind)

Tokenization (SURVEY.md hard part #1 — behavior of record): lowercase,
nltk ``word_tokenize`` when its punkt data is installed, else nltk's
data-free ``TreebankWordTokenizer`` (identical output on single-sentence
text, which VisDial questions/answers are).  The vocabulary is sorted
lexicographically among kept words — deterministic across runs.

Image features come from a sidecar ``.npz``/``.h5`` produced by
``visdial_tpu.data.prepro_img`` (VGG-16 fc7, reference: data/prepro_img.lua)
keyed by image order; ``--img_feats ''`` writes zero features so text-only
encoders can train without images.

Usage:
    python -m visdial_tpu.data.prepro \
        --train_json visdial_0.9_train.json --val_json visdial_0.9_val.json \
        --img_feats_train feats_train.npz --img_feats_val feats_val.npz \
        --out_dir data
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .dataset import VisDialSplit, Vocabulary

_TOKENIZE = None

# nltk's word_tokenize (>=3.5) = punkt sentence split + NLTKWordTokenizer
# per sentence.  The data-free fallback mirrors that structure exactly: the
# SAME NLTKWordTokenizer class, fed by a regex sentence split
# (sentence-final punctuation + whitespace) with a small abbreviation guard
# standing in for punkt's learned abbreviation model.  On single-sentence
# text fallback == word_tokenize by construction; on multi-sentence answers
# ("yes. it is.") a plain whole-string tokenizer call would keep "yes."
# fused — the split fixes exactly that divergence.  The residual gap is
# punkt's statistical abbreviation/ellipsis decisions on text outside the
# guard list (rare in lowercase VisDial QA text);
# tests/golden/token_fixture.json freezes the expected tokens so ANY drift
# — an nltk upgrade, punkt-vs-fallback disagreement — fails the suite
# instead of silently shifting the vocab (SURVEY.md hard part #1).
import re

_SENT_RE = re.compile(r"(?<=[.!?])\s+")
# lowercase (input is lowercased) abbreviations punkt reliably keeps
# mid-sentence; the fallback must not split after them either.
_ABBREVS = frozenset((
    "mr.", "mrs.", "ms.", "dr.", "prof.", "st.", "mt.", "u.s.", "u.k.",
    "a.m.", "p.m.", "e.g.", "i.e.", "etc.", "vs.", "approx.", "ft.", "in.",
))


def _sentences(text: str) -> list[str]:
    parts = []
    for p in _SENT_RE.split(text):
        if not p:
            continue
        if parts and parts[-1].rsplit(None, 1)[-1] in _ABBREVS:
            parts[-1] = parts[-1] + " " + p
        else:
            parts.append(p)
    return parts


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens; nltk word_tokenize with a data-free
    sentence-split + NLTKWordTokenizer fallback (documented decision — see
    module docstring and the fallback note above)."""
    global _TOKENIZE
    if _TOKENIZE is None:
        try:
            from nltk.tokenize import word_tokenize
            word_tokenize("probe")  # raises LookupError without punkt data
            _TOKENIZE = word_tokenize
        except Exception:
            try:
                from nltk.tokenize import NLTKWordTokenizer
                tk = NLTKWordTokenizer().tokenize
            except ImportError:    # pre-3.5 nltk: the older Treebank class
                from nltk.tokenize import TreebankWordTokenizer
                tk = TreebankWordTokenizer().tokenize
            _TOKENIZE = lambda s: [t for sent in _sentences(s)
                                   for t in tk(sent)]
    return _TOKENIZE(str(text).lower())


def load_visdial_json(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    data = raw["data"] if "data" in raw else raw
    return {
        "questions": data["questions"],
        "answers": data["answers"],
        "dialogs": data["dialogs"],
    }


def _encode_rows(token_lists, vocab: Vocabulary, max_len: int):
    arr = np.zeros((len(token_lists), max_len), np.int32)
    lens = np.zeros(len(token_lists), np.int32)
    for i, toks in enumerate(token_lists):
        arr[i], lens[i] = vocab.encode(toks, max_len)
    return arr, lens


def build_split(data: dict, vocab: Vocabulary, cfg_caps: dict,
                img_feat: np.ndarray | None, num_rounds: int = 10,
                num_options: int = 100) -> VisDialSplit:
    """Encode one split against a (frozen) vocabulary."""
    Lq, La, Lc = cfg_caps["ques"], cfg_caps["ans"], cfg_caps["cap"]
    dialogs = data["dialogs"]
    q_tok = [tokenize(q) for q in data["questions"]]
    a_tok = [tokenize(a) for a in data["answers"]]
    q_enc, q_len = _encode_rows(q_tok, vocab, Lq)
    a_enc, a_len = _encode_rows(a_tok, vocab, La)

    N = len(dialogs)
    ques = np.zeros((N, num_rounds, Lq), np.int32)
    ques_len = np.zeros((N, num_rounds), np.int32)
    ans = np.zeros((N, num_rounds, La), np.int32)
    ans_len = np.zeros((N, num_rounds), np.int32)
    cap = np.zeros((N, Lc), np.int32)
    cap_len = np.zeros(N, np.int32)
    opt_inds = np.zeros((N, num_rounds, num_options), np.int32)
    gt_ind = np.zeros((N, num_rounds), np.int32)
    round_valid = np.zeros((N, num_rounds), np.int32)
    round_scoreable = np.zeros((N, num_rounds), np.int32)
    img_ids = np.zeros(N, np.int64)

    # The dedup'd option list IS the global answer list (the released JSON
    # already shares answers by index — the reference's prepro dedups raw
    # strings into the same structure).
    opt_list, opt_list_len = a_enc, a_len

    for i, d in enumerate(dialogs):
        img_ids[i] = int(d.get("image_id", i))
        cap[i], cap_len[i] = vocab.encode(tokenize(d.get("caption", "")), Lc)
        # v0.9-style train dialogs always carry num_rounds fully annotated
        # rounds; v1.0 val/test dialogs may have fewer rounds, or rounds
        # missing the answer (test) or the candidate list.  Short dialogs
        # are zero-padded; round_valid marks RANKABLE rounds (full
        # candidate list + gt) and gates disc loss and retrieval metrics.
        # Gen training masks on answer presence instead (gen_loss), so an
        # answer-only round still trains the LM.  (Behavior of record —
        # the empty-mount rule in SURVEY.md §0: decide + document.)
        rounds = d["dialog"][:num_rounds]
        for r, turn in enumerate(rounds):
            qi, ai = int(turn["question"]), int(turn.get("answer", -1))
            ques[i, r], ques_len[i, r] = q_enc[qi], q_len[qi]
            if ai >= 0:
                ans[i, r], ans_len[i, r] = a_enc[ai], a_len[ai]
            opts = [int(o) for o in
                    turn.get("answer_options", [])[:num_options]]
            if len(opts) == num_options:
                opt_inds[i, r] = opts
                # full candidate list -> scoreable (dumped by --save_ranks)
                # even without gt: the v1.0 TEST split's submission rounds
                round_scoreable[i, r] = 1
                gt = turn.get("gt_index")
                if gt is None and ai >= 0:
                    # some exports store the answer id, not the slot
                    gt = opts.index(ai)
                if gt is not None:
                    gt_ind[i, r] = int(gt)
                    # content check only when the (redundant) answer field
                    # is present — some exports omit it, gt_index alone is
                    # enough to rank
                    assert ai < 0 or opts[gt_ind[i, r]] == ai, (
                        f"dialog {i} round {r}: gt_index does not point at "
                        "the ground-truth answer")
                    round_valid[i, r] = 1

    if img_feat is None:
        img_feat = np.zeros((N, 1), np.float32)
    assert img_feat.shape[0] == N, (
        f"{img_feat.shape[0]} image features for {N} dialogs")

    return VisDialSplit(
        ques=ques, ques_len=ques_len, ans=ans, ans_len=ans_len,
        cap=cap, cap_len=cap_len,
        opt_list=opt_list, opt_list_len=opt_list_len,
        opt_inds=opt_inds, gt_ind=gt_ind,
        img_feat=img_feat.astype(np.float32), img_ids=img_ids,
        round_valid=round_valid, round_scoreable=round_scoreable,
    ).validate()


def load_img_feats(path: str, split: str,
                   spatial: bool = False) -> np.ndarray | None:
    """fc7 (N, 4096) by default; with spatial=True the pool5 map written by
    prepro_img --save_pool5 ((N, 7, 7, 512)), flattened to (N, 25088) for
    the img_spatial encoder pathway."""
    if not path:
        return None
    keys = ([f"pool5_{split}", "pool5"] if spatial
            else [f"images_{split}", "features"])
    def pick(available):
        key = next((k for k in keys if k in available), None)
        if key is None:
            raise ValueError(
                f"{path}: no {'/'.join(keys)} array for split {split!r} "
                f"(have: {sorted(available)}); --img_spatial needs a pool5 "
                "map from prepro_img --save_pool5" if spatial else
                f"{path}: no {'/'.join(keys)} array for split {split!r} "
                f"(have: {sorted(available)})")
        return key

    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:
            feats = np.asarray(f[pick(list(f))], np.float32)
    else:
        with np.load(path) as z:
            feats = np.asarray(z[pick(z.files)], np.float32)
    return feats.reshape(len(feats), -1) if spatial else feats


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_json", required=True)
    p.add_argument("--val_json", required=True)
    p.add_argument("--test_json", type=str, default="",
                   help="optional v1.0 test split (submission rounds carry "
                        "options but no gt — scoreable, not rankable)")
    p.add_argument("--img_feats_train", type=str, default="")
    p.add_argument("--img_feats_val", type=str, default="")
    p.add_argument("--img_feats_test", type=str, default="")
    p.add_argument("--out_dir", type=str, default="data")
    p.add_argument("--min_count", type=int, default=5)
    p.add_argument("--max_ques_len", type=int, default=16)
    p.add_argument("--max_ans_len", type=int, default=8)
    p.add_argument("--max_cap_len", type=int, default=40)
    p.add_argument("--num_rounds", type=int, default=10)
    p.add_argument("--num_options", type=int, default=100)
    p.add_argument("--img_spatial", action="store_true",
                   help="store the pool5 spatial map (flattened 7x7x512) "
                        "from the feature files instead of fc7 — pairs "
                        "with Config.img_spatial")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    caps = {"ques": args.max_ques_len, "ans": args.max_ans_len,
            "cap": args.max_cap_len}

    train = load_visdial_json(args.train_json)
    val = load_visdial_json(args.val_json)

    # Vocabulary from the TRAIN split only (reference: prepro.py builds the
    # vocab on train; val OOV becomes <UNK>).
    corpus = ([tokenize(q) for q in train["questions"]]
              + [tokenize(a) for a in train["answers"]]
              + [tokenize(d.get("caption", "")) for d in train["dialogs"]])
    vocab = Vocabulary.build(corpus, min_count=args.min_count)
    vocab.save(os.path.join(args.out_dir, "visdial_params.json"))
    print(f"vocab: {vocab.size} entries (min_count={args.min_count}) "
          f"sha256={vocab.content_hash()}")

    splits = [("train", train, args.img_feats_train),
              ("val", val, args.img_feats_val)]
    if args.test_json:
        splits.append(("test", load_visdial_json(args.test_json),
                       args.img_feats_test))
    for split, data, feats_path in splits:
        feats = load_img_feats(feats_path, split, spatial=args.img_spatial)
        out = build_split(data, vocab, caps, feats,
                          num_rounds=args.num_rounds,
                          num_options=args.num_options)
        path = os.path.join(args.out_dir, f"visdial_data_{split}.npz")
        out.save(path)
        print(f"{split}: {out.num_dialogs} dialogs -> {path}")


if __name__ == "__main__":
    main()

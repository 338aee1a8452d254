"""Interactive / serving inference — answer questions about an image.

The reference has no serving story (generate.lua is batch-only); this
module adds one: load a checkpoint once, jit the single-dialog forward at
fixed shapes, and answer ad-hoc (caption, history, question) queries at
interactive latency.

* disc checkpoints rank the ENTIRE answer pool (the split's deduplicated
  option list) via the option-embedding table — one encoder forward + one
  (1, H) x (H, M) matmul per query — and return the top-k answers.
* gen checkpoints decode free-form text (greedy or beam).

CLI: one JSON query per stdin line, one JSON answer per stdout line:

    echo '{"caption": "a man on a horse", "question": "is it sunny ?",
           "history": [["is the man old ?", "no"]]}' | \
    python -m visdial_tpu.infer --load_path checkpoints/run/step_N \
        --data_dir data [--top_k 5 | --beam_size 5]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import VisDialSplit, load_split
from .data.loader import BatchAssembler
from .data.prepro import tokenize
from .data.synthetic import make_synthetic_split
from .models.model import _impl, model_generate, model_option_table
from .models.encoders import encoder_apply
from .utils.checkpoint import load_checkpoint
from .utils.platform import apply_platform_env


class InferenceEngine:
    """Checkpoint + vocabulary + (for disc) the answer-pool table, with
    jitted single-dialog forwards cached at fixed shapes."""

    def __init__(self, load_path: str = "", data_dir: str = "",
                 synthetic: int = 0, *, state=None, cfg=None, data=None,
                 vocab=None):
        """Build from a checkpoint path (the CLI route) or directly from
        in-memory components (embedding/serving-bench route: pass state,
        cfg, data, vocab and no load_path)."""
        if load_path:
            state, cfg, _ = load_checkpoint(load_path)
            if data_dir:
                cfg = cfg.replace(data_dir=data_dir)
            if synthetic:
                data, vocab = make_synthetic_split(
                    cfg, num_dialogs=synthetic, seed=cfg.seed + 1)
            else:
                data, vocab = load_split(cfg.data_dir, "val")
        assert None not in (state, cfg, data, vocab), \
            "need load_path or explicit (state, cfg, data, vocab)"
        self.cfg = cfg
        self.vocab = vocab
        self.params = state.params
        self.opt_list = data.opt_list
        self.opt_list_len = data.opt_list_len
        self._template = data           # shapes/feature-dim template
        impl = _impl(cfg)               # same fused-path choice as model.py

        # One fused jit per request, everything reduced ON DEVICE to a
        # single small packed array: a request pays exactly one dispatch
        # chain and one readback round trip.  (The previous design chained
        # encode -> rank -> full-pool score readback -> host argsort — on a
        # ~30 ms-RTT link the extra sync + the 200 KB score transfer
        # roughly doubled interactive p50.)
        if cfg.decoder == "disc":
            table = model_option_table(self.params, jnp.asarray(data.opt_list),
                                       cfg)
            self._table = table

            def serve_disc(params, batch, table, t, k):
                joint = encoder_apply(params["encoder"], params["embed"],
                                      batch, cfg, train=False, impl=impl)
                j = jax.lax.dynamic_slice_in_dim(joint, t, 1, 0)   # (1, H)
                scores = jnp.dot(j.astype(table.dtype), table.T,
                                 preferred_element_type=jnp.float32)[0]
                top_s, top_i = jax.lax.top_k(scores, k)
                return jnp.stack([top_i.astype(jnp.float32), top_s])

            self._serve_disc_jit = jax.jit(serve_disc, static_argnums=(4,))
        else:
            def serve_gen(params, batch, beam, t):
                toks, logp = model_generate(
                    params, batch, cfg, start_token=vocab.start,
                    end_token=vocab.end, beam_size=beam, greedy=True)
                row = jax.lax.dynamic_slice(
                    toks, (0, t, 0), (1, 1, toks.shape[2]))[0, 0]
                lp = jax.lax.dynamic_slice(logp, (0, t), (1, 1))[0, 0]
                # tokens pack exactly into f32 (vocab << 2^24)
                return jnp.concatenate([lp[None], row.astype(jnp.float32)])

            self._serve_gen_jit = jax.jit(serve_gen, static_argnums=(2,))

    # -- raw text -> one-dialog split ------------------------------------
    def _encode_dialog(self, caption: str, history, question: str,
                       img_feat=None) -> tuple[VisDialSplit, int]:
        cfg, v = self.cfg, self.vocab
        R = cfg.num_rounds
        # keep the MOST RECENT turns when the dialog exceeds the model's
        # round budget — the current question refers to recent context
        # (explicit start index: [-(R-1):] at R == 1 would be [-0:] == the
        # whole history, then ques[0, t] indexes out of bounds)
        history = list(history or [])
        history = history[max(len(history) - (R - 1), 0):]
        t = len(history)                       # current round index
        ques = np.zeros((1, R, cfg.max_ques_len), np.int32)
        ques_len = np.zeros((1, R), np.int32)
        ans = np.zeros((1, R, cfg.max_ans_len), np.int32)
        ans_len = np.zeros((1, R), np.int32)
        for r, (q, a) in enumerate(history):
            ques[0, r], ques_len[0, r] = v.encode(tokenize(q), cfg.max_ques_len)
            ans[0, r], ans_len[0, r] = v.encode(tokenize(a), cfg.max_ans_len)
        ques[0, t], ques_len[0, t] = v.encode(tokenize(question),
                                              cfg.max_ques_len)
        cap = np.zeros((1, cfg.max_cap_len), np.int32)
        cap_enc, cap_n = v.encode(tokenize(caption or ""), cfg.max_cap_len)
        cap[0] = cap_enc
        F = self._template.img_feat.shape[1]
        feat = (np.asarray(img_feat, np.float32).reshape(1, F)
                if img_feat is not None else np.zeros((1, F), np.float32))
        split = VisDialSplit(
            ques=ques, ques_len=ques_len, ans=ans, ans_len=ans_len,
            cap=cap, cap_len=np.array([cap_n], np.int32),
            opt_list=self.opt_list, opt_list_len=self.opt_list_len,
            opt_inds=np.zeros((1, R, self.cfg.num_options), np.int32),
            gt_ind=np.zeros((1, R), np.int32),
            img_feat=feat, img_ids=np.zeros(1, np.int64),
        )
        return split, t

    def _batch(self, caption, history, question, img_feat):
        split, t = self._encode_dialog(caption, history, question, img_feat)
        asm = BatchAssembler(split, self.vocab, self.cfg)
        return asm.assemble(np.array([0]), with_options=False).as_dict(), t

    # -- public API -------------------------------------------------------
    def rank_answers(self, question: str, caption: str = "", history=None,
                     img_feat=None, top_k: int = 5) -> list[dict]:
        """Top-k answers from the whole pool with scores (disc decoder)."""
        assert self.cfg.decoder == "disc"
        batch, t = self._batch(caption, history, question, img_feat)
        k = min(int(top_k), len(self.opt_list))  # lax.top_k needs k <= pool
        packed = np.asarray(self._serve_disc_jit(
            self.params, batch, self._table, t, k))            # (2, k)
        return [{"answer": " ".join(self.vocab.decode(self.opt_list[int(i)])),
                 "score": float(s)} for i, s in zip(packed[0], packed[1])]

    def generate_answer(self, question: str, caption: str = "", history=None,
                        img_feat=None, beam_size: int = 0) -> dict:
        """Free-form decoded answer (gen decoder)."""
        assert self.cfg.decoder == "gen"
        batch, t = self._batch(caption, history, question, img_feat)
        packed = np.asarray(self._serve_gen_jit(
            self.params, batch, int(beam_size), t))            # (1 + La,)
        toks = packed[1:].astype(np.int32)
        return {"answer": " ".join(self.vocab.decode(toks)),
                "log_prob": float(packed[0])}


def main(argv=None) -> None:
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--beam_size", type=int, default=0)
    args = p.parse_args(argv)

    engine = InferenceEngine(args.load_path, data_dir=args.data_dir,
                             synthetic=args.synthetic)
    print(json.dumps({"event": "ready",
                      "model": f"{engine.cfg.encoder}-{engine.cfg.decoder}"}),
          flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:  # one bad request -> one error line, never a dead server
            q = json.loads(line)
            if engine.cfg.decoder == "disc":
                out = {"answers": engine.rank_answers(
                    q["question"], q.get("caption", ""), q.get("history"),
                    q.get("img_feat"), top_k=args.top_k)}
            else:
                out = engine.generate_answer(
                    q["question"], q.get("caption", ""), q.get("history"),
                    q.get("img_feat"), beam_size=args.beam_size)
        except Exception as e:
            out = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

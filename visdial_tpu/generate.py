"""Generation CLI — the `th generate.lua` equivalent.

Loads a gen-decoder checkpoint (embedding its Config, like the reference's
.t7 embeds `opt`), decodes an answer for every dialog round (greedy by
default, or temperature sampling), detokenizes via the vocabulary, and
writes a JSON file of dialogs + generated answers that `vis/index.html`
renders (reference: generate.lua -> vis/ flow, SURVEY.md §3.3).

Usage:
    python -m visdial_tpu.generate --load_path checkpoints/run/step_N \
        [--data_dir data | --synthetic 64] [--num_dialogs 20] \
        [--sample --temperature 0.8] [--out_path generated.json]
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from .data.dataset import load_split
from .data.loader import EvalLoader
from .data.synthetic import make_synthetic_split
from .models.model import model_generate
from .parallel.mesh import make_mesh, shard_batch
from .parallel.train_step import state_shardings
from .utils.checkpoint import load_checkpoint
from .utils.platform import apply_platform_env


def main(argv=None) -> list:
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--num_dialogs", type=int, default=20,
                   help="how many dialogs to decode (0 = whole split)")
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--sample", action="store_true",
                   help="temperature sampling instead of greedy")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--beam_size", type=int, default=0,
                   help=">1 enables beam search (overrides --sample)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_path", type=str, default="generated.json")
    args = p.parse_args(argv)

    state, cfg, _ = load_checkpoint(args.load_path)
    assert cfg.decoder == "gen", \
        f"checkpoint is {cfg.decoder!r}; generation needs a gen decoder"
    if args.data_dir:
        cfg = cfg.replace(data_dir=args.data_dir)
    if args.synthetic:
        data, vocab = make_synthetic_split(cfg, num_dialogs=args.synthetic,
                                           seed=cfg.seed + 1)
    else:
        data, vocab = load_split(cfg.data_dir, args.split)

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    psh = state_shardings(cfg, mesh).params
    params = jax.device_put(state.params, psh)

    bs = args.batch_size or cfg.batch_size
    n = args.num_dialogs or data.num_dialogs

    gen_fn = jax.jit(
        lambda params, batch, rng: model_generate(
            params, batch, cfg, start_token=vocab.start, end_token=vocab.end,
            greedy=not args.sample, rng=rng, temperature=args.temperature,
            beam_size=args.beam_size))

    # option_tokens=False: generation never scores candidates, and the
    # default would assemble + ship ~9 MB/batch of opt/opt_in/opt_out
    # tokens over the link for nothing
    loader = EvalLoader(data, vocab, cfg, batch_size=bs, option_tokens=False)
    rng = jax.random.PRNGKey(args.seed)
    records = []
    for batch_idx, batch in enumerate(loader):
        rng, step_rng = jax.random.split(rng)
        toks, logp = gen_fn(params, shard_batch(batch.as_dict(), mesh),
                            step_rng)
        toks, logp = np.asarray(toks), np.asarray(logp)
        keep = batch.dialog_valid.astype(bool)
        for b in range(toks.shape[0]):
            i = batch_idx * bs + b            # global dialog index
            if not keep[b] or i >= n:
                break
            rounds = []
            for r in range(cfg.num_rounds):
                # v1.0-style short dialogs are padded to the static round
                # count; fabricating "answers" to their empty padded
                # rounds would render garbage in the viewer
                if not batch.round_valid[b, r]:
                    continue
                rounds.append({
                    "question": " ".join(vocab.decode(batch.ques[b, r])),
                    "gt_answer": " ".join(vocab.decode(data.ans[i, r])),
                    "generated": " ".join(vocab.decode(toks[b, r])),
                    "log_prob": float(logp[b, r]),
                })
            records.append({
                "image_id": int(data.img_ids[i]),
                "caption": " ".join(vocab.decode(data.cap[i])),
                "rounds": rounds,
            })
        if len(records) >= n:
            break

    with open(args.out_path, "w") as f:
        json.dump({"model": f"{cfg.encoder}-{cfg.decoder}",
                   "split": args.split, "dialogs": records}, f, indent=1)
    print(json.dumps({"event": "generated", "dialogs": len(records),
                      "out_path": args.out_path}))
    return records


if __name__ == "__main__":
    main()

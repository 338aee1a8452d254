"""Evaluation CLI — the `th evaluate.lua` equivalent.

Loads a checkpoint (which embeds its Config, like the reference's .t7
embeds `opt`), rebuilds the model, ranks 100 candidates per round on the
val split and prints MRR, R@1, R@5, R@10, mean rank.

Usage:
    python -m visdial_tpu.evaluate --load_path checkpoints/run/step_00001000 \
        [--data_dir data | --synthetic 64] [--batch_size 32]
"""

from __future__ import annotations

import argparse
import json

from .data.dataset import load_split
from .data.synthetic import make_synthetic_split
from .eval_harness import evaluate_split
from .parallel.mesh import make_mesh
from .utils.checkpoint import load_checkpoint
from .utils.platform import apply_platform_env


def main(argv=None) -> dict:
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--length_norm", type=str, default="",
                   choices=("", "0", "1"),
                   help="override gen_score_length_norm from the checkpoint "
                        "(parity probing; '' keeps the saved value)")
    p.add_argument("--ties", type=str, default="optimistic",
                   choices=("optimistic", "pessimistic", "mean"),
                   help="rank convention for score ties (parity probing)")
    args = p.parse_args(argv)

    state, cfg, _ = load_checkpoint(args.load_path)
    if args.data_dir:
        cfg = cfg.replace(data_dir=args.data_dir)
    if args.length_norm:
        cfg = cfg.replace(gen_score_length_norm=args.length_norm == "1")
    if args.synthetic:
        data, vocab = make_synthetic_split(cfg, num_dialogs=args.synthetic,
                                           seed=cfg.seed + 1)
    else:
        data, vocab = load_split(cfg.data_dir, args.split)
    assert vocab.size == cfg.vocab_size, "checkpoint/vocab mismatch"

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    metrics = evaluate_split(state.params, data, vocab, cfg, mesh,
                             batch_size=args.batch_size or None,
                             ties=args.ties)
    print(json.dumps({"model": f"{cfg.encoder}-{cfg.decoder}",
                      "split": args.split, **metrics}))
    return metrics


if __name__ == "__main__":
    main()

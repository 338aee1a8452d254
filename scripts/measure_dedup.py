"""Measure intra-batch candidate-row duplication in DISC TRAIN batches.

The dominant disc train cost is the (B*R*K)-row option LSTM
(models/decoders.py disc_option_embeddings; 32k rows at the flagship
batch).  Those rows are gathers from the split's deduplicated opt_list
(reference: prepro.py's memory trick), so rows REPEAT within a batch —
every repeat is redundant LSTM work.  This script measures the repeat
fraction at v0.9-like scale to decide whether unique-rows-then-gather is
worth building (VERDICT r4 item 5).

Caveat stated up front: make_random_split samples candidates UNIFORMLY
from the option list; real VisDial answer options follow answer-popularity
skew ("yes"/"no"/counts dominate), which can only RAISE the duplicate
fraction.  The uniform number is therefore a lower bound.

    python scripts/measure_dedup.py [--num_dialogs 8000] [--batches 20]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_dialogs", type=int, default=8000)
    p.add_argument("--num_unique_answers", type=int, default=100_000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--zipf", type=float, default=0.0,
                   help="re-draw candidate rows with a Zipf(a) popularity "
                        "skew over the option list (a~1.2-1.5 approximates "
                        "real answer popularity) instead of the split's "
                        "uniform draws")
    args = p.parse_args(argv)

    from visdial_tpu.config import Config
    from visdial_tpu.data.loader import TrainLoader
    from visdial_tpu.data.synthetic import make_random_split

    cfg = Config(vocab_size=0, batch_size=args.batch_size, dropout=0.0)
    split, vocab = make_random_split(cfg, num_dialogs=args.num_dialogs,
                                     num_unique_answers=args.num_unique_answers,
                                     seed=0)
    if args.zipf:
        from visdial_tpu.data.synthetic import zipf_redraw_options
        zipf_redraw_options(split, args.zipf)

    cfg = cfg.replace(vocab_size=vocab.size)
    loader = TrainLoader(split, vocab, cfg)
    fracs, uniq_counts = [], []
    for i, b in enumerate(loader.epoch(seed=0)):
        if i >= args.batches:
            break
        rows = b.opt_inds.reshape(-1)              # (B*R*K,) rows into opt_list
        n_unique = np.unique(rows).size
        fracs.append(1.0 - n_unique / rows.size)
        uniq_counts.append(n_unique)
    total = cfg.batch_size * cfg.num_rounds * cfg.num_options
    print(json.dumps({
        "rows_per_batch": total,
        "duplicate_fraction_mean": round(float(np.mean(fracs)), 4),
        "duplicate_fraction_min": round(float(np.min(fracs)), 4),
        "duplicate_fraction_max": round(float(np.max(fracs)), 4),
        "unique_rows_mean": round(float(np.mean(uniq_counts)), 1),
        "batches_measured": len(fracs),
        "opt_list_rows": int(split.opt_list.shape[0]),
        "sampling": f"zipf({args.zipf})" if args.zipf else "uniform",
    }))


if __name__ == "__main__":
    main()

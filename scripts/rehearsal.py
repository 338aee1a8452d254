"""Production-scale pipeline rehearsal on real TPU hardware.

Builds a VisDial-v0.9-scale random dataset (80k train dialogs, 100k unique
answers), runs sustained training through the full host-loader -> device
pipeline (fresh batches every step — unlike bench.py's fixed batch), and a
complete val-split retrieval evaluation, reporting wall-clock throughput.

    python scripts/rehearsal.py [--train_dialogs 80000] [--steps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train_dialogs", type=int, default=80_000)
    p.add_argument("--val_dialogs", type=int, default=2_000)
    p.add_argument("--unique_answers", type=int, default=100_000)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="optimizer steps scanned on device per dispatch "
                        "(the production train.py configuration); the host "
                        "loader must assemble G fresh batches per dispatch")
    p.add_argument("--dedup", type=int, default=1,
                   help="disc_dedup_options (1=production default; 0 for "
                        "the plain expanded-candidate A/B)")
    args = p.parse_args()

    import jax

    from visdial_tpu.config import Config
    from visdial_tpu.data.loader import TrainLoader
    from visdial_tpu.data.synthetic import make_random_split
    from visdial_tpu.eval_harness import evaluate_split
    from visdial_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_batch_stack,
    )
    from visdial_tpu.parallel.train_step import (
        init_train_state,
        make_multistep_train_fn,
        make_train_fn,
        shard_train_state,
    )
    from visdial_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(encoder="mn-ques-im-hist", decoder="disc",
                 batch_size=32, dropout=0.5, compute_dtype="bfloat16",
                 disc_dedup_options=bool(args.dedup))
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)

    t0 = time.time()
    train, vocab = make_random_split(cfg, args.train_dialogs,
                                     args.unique_answers, seed=0)
    val, _ = make_random_split(cfg, args.val_dialogs,
                               args.unique_answers, seed=1)
    cfg = cfg.replace(vocab_size=vocab.size)
    print(f"data: {args.train_dialogs} train dialogs in {time.time()-t0:.0f}s",
          flush=True)

    mesh = make_mesh()
    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    G = max(1, args.steps_per_dispatch)
    multi_fn = make_multistep_train_fn(cfg, mesh) if G > 1 else None
    train_fn = make_train_fn(cfg, mesh) if G == 1 else None
    loader = TrainLoader(train, vocab, cfg)

    def groups():
        """Yield fresh host batches one at a time, crossing epochs as
        needed; dispatch() collects G of them per device call (rehearsal
        only — train.py keeps groups within an epoch for its resume
        semantics)."""
        seed = 0
        while True:
            for b in loader.epoch(seed=seed):
                yield b.as_dict()
            seed += 1

    batch_iter = groups()

    def dispatch():
        nonlocal state
        if G == 1:
            state, m = train_fn(
                state, shard_batch(next(batch_iter), mesh))
        else:
            pending = [next(batch_iter) for _ in range(G)]
            state, m = multi_fn(state, shard_batch_stack(pending, mesh))
        return m

    t0 = time.time()
    m = dispatch()
    float(np.asarray(m["loss"]).ravel()[-1])
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    dispatches = max(args.steps // G, 1)
    t0 = time.time()
    for _ in range(dispatches):
        m = dispatch()
    loss = float(np.asarray(m["loss"]).ravel()[-1])
    dt = time.time() - t0
    steps = dispatches * G
    train_rps = steps * cfg.batch_size * cfg.num_rounds / dt
    print(f"train: {steps} steps ({G}/dispatch), fresh batches: "
          f"{train_rps:.0f} rounds/s sustained, loss {loss:.3f}", flush=True)

    t0 = time.time()
    metrics = evaluate_split(state.params, val, vocab, cfg, mesh)
    print(json.dumps({"event": "rehearsal",
                      "sustained_train_rounds_per_sec": round(train_rps, 1),
                      "val_eval_seconds": round(metrics["eval_seconds"], 2),
                      "val_evals_per_sec": round(metrics["evals_per_sec"], 1),
                      "val_mrr": round(metrics["mrr"], 4),
                      "expected_chance_mrr": 0.052}),
          flush=True)


if __name__ == "__main__":
    main()

"""Dense-annotation fine-tuning CLI — the VisDial v1.0 NDCG phase.

Loads a trained disc checkpoint and fine-tunes it so its candidate-score
softmax matches the dense human gt_relevance annotations
(`visdial_1.0_val_dense_annotations.json` schema), the ecosystem's
standard NDCG-optimization step (the v0.9 reference predates it; this is
a beyond-reference completion of the v1.0 protocol, see
models/model.py::model_dense_loss).

Optimizer moments are re-initialized (a fresh Adam at a small LR over a
new objective); everything else — config, sharding, checkpoint format —
is the training stack's.  Progress is JSONL like train.py, including NDCG
on the annotated rounds every --eval_every steps.

Usage:
    python -m visdial_tpu.finetune --load_path checkpoints/run/step_N \
        --dense_json dense_annotations.json [--data_dir data | --synthetic N] \
        --steps 200 --learning_rate 1e-4 --save_path checkpoints/ft
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from .data.dataset import load_split
from .data.loader import DenseLoader
from .data.synthetic import make_synthetic_split
from .eval_harness import evaluate_split
from .evaluate import ndcg_from_dense
from .parallel.mesh import make_mesh, shard_batch
from .parallel.optim import init_opt_state
from .parallel.train_step import (
    TrainState,
    make_dense_train_fn,
    shard_train_state,
)
from .utils.checkpoint import load_checkpoint, save_checkpoint
from .utils.platform import apply_platform_env


def ndcg_on_entries(params, data, vocab, cfg, mesh, dense_entries) -> dict:
    """NDCG over the annotated rounds (resident rankings pass)."""
    _, cand = evaluate_split(params, data, vocab, cfg, mesh,
                             collect_rankings=True, resident=True)
    return ndcg_from_dense(cand, data.img_ids, dense_entries)


def main(argv=None) -> dict:
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True)
    p.add_argument("--dense_json", required=True)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--split", type=str, default="val",
                   help="split the dense annotations cover (v1.0: val)")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--eval_every", type=int, default=0,
                   help="NDCG on the annotated rounds every N steps "
                        "(0 = only before/after)")
    p.add_argument("--log_every", type=int, default=10,
                   help="steps between buffered loss readbacks/records")
    p.add_argument("--save_path", type=str, default="checkpoints/finetune")
    p.add_argument("--run_name", type=str, default="dense")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    state, cfg, _ = load_checkpoint(args.load_path)
    assert cfg.decoder == "disc", "dense fine-tuning targets disc models"
    cfg = cfg.replace(learning_rate=args.learning_rate, lr_decay_rate=1.0)
    if args.data_dir:
        cfg = cfg.replace(data_dir=args.data_dir)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    if args.synthetic:
        data, vocab = make_synthetic_split(cfg, num_dialogs=args.synthetic,
                                           seed=cfg.seed + 1)
    else:
        data, vocab = load_split(cfg.data_dir, args.split)
    assert vocab.size == cfg.vocab_size, "checkpoint/vocab mismatch"
    with open(args.dense_json) as f:
        dense = json.load(f)

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    loader = DenseLoader(data, vocab, cfg, dense)
    assert len(loader) > 0, "no usable dense annotations for this split"
    # fresh optimizer over the new objective; keep the trained params
    state = shard_train_state(
        TrainState(state.params, init_opt_state(state.params, cfg),
                   jax.random.PRNGKey(args.seed)), cfg, mesh)
    train_fn = make_dense_train_fn(cfg, mesh)

    def emit(event: str, **kw) -> None:
        print(json.dumps({"event": event, **kw}), flush=True)

    before = ndcg_on_entries(state.params, data, vocab, cfg, mesh, dense)
    emit("ndcg", step=0, **before)

    step, epoch, t0 = 0, 0, time.time()
    losses: list[float] = []
    buf: list = []      # device scalars; read back only at flush points

    def flush():
        # Buffered readback (train.py's pattern): a per-step float() would
        # sync the ~30 ms tunnel round trip every step and gate dispatch
        # of the next one (advisor finding, round 2).  One stacked readback
        # per flush — not one per scalar, which would re-pay the same RTT
        # count the buffering exists to avoid.
        if not buf:
            return
        vals = np.asarray(jnp.stack(
            [jnp.stack([dm["loss"], dm["lr"], dm["grad_norm"]])
             for dm in buf]).astype(jnp.float32))               # (n, 3)
        for dm, (loss, lr, gnorm) in zip(buf, vals):
            losses.append(float(loss))
            emit("finetune", step=dm["step"], loss=float(loss),
                 lr=float(lr), grad_norm=float(gnorm))
        buf.clear()

    while step < args.steps:
        for batch in loader.epoch(seed=args.seed + epoch):
            state, m = train_fn(state, shard_batch(batch, mesh))
            step += 1
            buf.append({**m, "step": step})   # python step wins over m's device scalar
            if step % args.log_every == 0 or step >= args.steps:
                flush()
            if args.eval_every and step % args.eval_every == 0:
                flush()
                emit("ndcg", step=step, **ndcg_on_entries(
                    state.params, data, vocab, cfg, mesh, dense))
            if step >= args.steps:
                break
        epoch += 1
    flush()

    after = ndcg_on_entries(state.params, data, vocab, cfg, mesh, dense)
    emit("ndcg", step=step, **after)
    path = save_checkpoint(f"{args.save_path}/{args.run_name}", state, cfg)
    emit("checkpoint", step=step, path=path, seconds=time.time() - t0)
    return {"ndcg_before": before["ndcg"], "ndcg_after": after["ndcg"],
            "first_loss": losses[0] if losses else None,
            "last_loss": losses[-1] if losses else None,
            "steps": step, "checkpoint": path}


if __name__ == "__main__":
    main()

"""Training CLI — the `th train.lua` equivalent.

Usage:
    python -m visdial_tpu.train --encoder lf-ques-im-hist --decoder disc \
        --data_dir data --num_epochs 15
    python -m visdial_tpu.train --synthetic 64 --num_epochs 3   # no data needed

Mirrors the reference option surface (reference: train.lua cmd:option
block) with pythonic flag names; every run writes JSONL metrics and full
resumable checkpoints (params + optimizer + step + PRNG + config).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import numpy as np

from .config import RESUME_OVERRIDABLE, Config, resume_config_mismatches
from .data.dataset import load_split
from .data.loader import TrainLoader
from .data.synthetic import make_synthetic_split
from .eval_harness import evaluate_split
from .parallel.mesh import make_mesh, shard_batch, shard_batch_stack
from .parallel.train_step import (init_train_state, make_disc_table_eval_fns,
                                  make_eval_fn, make_gen_bucket_eval_fns,
                                  make_multistep_train_fn, make_train_fn)
from .utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .utils.logging import MetricsLogger
from .utils.platform import apply_platform_env, profiler_supported


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=f.default)
        else:
            p.add_argument(name, type=type(f.default), default=f.default)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic dialogs instead of real data")
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N steps (0 = run num_epochs)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in save_path")
    p.add_argument("--run_name", type=str, default="")
    p.add_argument("--profile_steps", type=str, default="",
                   help="'start,stop' step range to capture an xprof trace "
                        "(refused with a warning on runtimes where tracing "
                        "hangs, e.g. tunneled TPU — use --time_steps there)")
    p.add_argument("--time_steps", type=int, default=0,
                   help="log per-step host-readback wall-clock ('step_time' "
                        "JSONL events) for the first N steps — the "
                        "profiler-free timing story; slows training while "
                        "active (forces a device sync every step)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps per device dispatch (>1 scans G "
                        "steps in one jitted call over a stacked batch "
                        "group — amortizes per-step host dispatch, the "
                        "dominant overhead for fast steps on high-latency "
                        "links; metrics/eval/checkpoint cadences quantize "
                        "to group boundaries)")
    p.add_argument("--eval_resident",
                   type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True,
                   help="periodic eval (both decoders): cache the val split "
                        "on device and score it in one dispatch (auto-falls "
                        "back to streaming when the split exceeds the byte "
                        "cap)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans: abort with a traceback the "
                        "step any NaN/Inf appears (the sanitizer story for "
                        "a functional stack — SURVEY.md §5)")
    return p


def config_from_args(args) -> Config:
    fields = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in vars(args).items() if k in fields})


def main(argv=None) -> dict:
    apply_platform_env()
    args = build_argparser().parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = config_from_args(args)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)

    if args.synthetic:
        train_data, vocab = make_synthetic_split(cfg, num_dialogs=args.synthetic,
                                                 seed=cfg.seed)
        val_data, _ = make_synthetic_split(cfg, num_dialogs=max(8, args.synthetic // 4),
                                           vocab=vocab, seed=cfg.seed + 1)
    else:
        train_data, vocab = load_split(cfg.data_dir, "train")
        val_data, _ = load_split(cfg.data_dir, "val")
    cfg = cfg.replace(vocab_size=vocab.size).validate()

    run_name = args.run_name or f"{cfg.encoder}-{cfg.decoder}-{int(time.time())}"
    ckpt_dir = os.path.join(cfg.save_path, run_name)
    log = MetricsLogger(os.path.join(ckpt_dir, "metrics.jsonl"))
    log.log({"event": "config", **dataclasses.asdict(cfg),
             "devices": len(jax.devices()), "backend": jax.default_backend()})

    from .config import encoder_family, encoder_uses_history

    if (encoder_family(cfg.encoder) == "lf" and encoder_uses_history(cfg.encoder)
            and cfg.lf_hist_incremental and cfg.dropout > 0):
        # Deterministic math on this path is exactly the per-round
        # re-encoding; the deviation is noise-shape only (see config.py).
        log.log({"event": "notice",
                 "msg": "LF incremental-history path: inter-layer dropout "
                        "masks are shared across a dialog's rounds (~10x "
                        "fewer token-steps); pass --lf_hist_incremental "
                        "false for reference-exact per-round noise"})

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    if cfg.batch_size % mesh.shape["data"] != 0:
        # Train keeps the fixed P('data') production pins (donation +
        # grouped dispatch); fail at config time with a usable message
        # instead of pjit's divisibility ValueError mid-compile.  Eval and
        # generate stay usable at any batch size (mesh.shard_batch).
        raise SystemExit(
            f"--batch_size {cfg.batch_size} is not divisible by the "
            f"mesh data axis ({mesh.shape['data']}); pick a multiple, or "
            f"shrink the mesh with --mesh_data")
    group = max(1, args.steps_per_dispatch)
    train_fn = make_train_fn(cfg, mesh)
    multi_fn = (make_multistep_train_fn(cfg, mesh) if group > 1 else None)
    # Each decoder's eval fast path, compiled once and reused across evals:
    # disc = option-table scoring; gen = length-bucketed candidate rows.
    eval_fn = table_fns = gen_fns = None
    if cfg.decoder == "disc":
        table_fns = make_disc_table_eval_fns(cfg, mesh)
    elif cfg.gen_eval_bucketed:
        gen_fns = make_gen_bucket_eval_fns(cfg, mesh)
    else:
        eval_fn, table_fns, gen_fns = make_eval_fn(cfg, mesh), False, False

    if args.resume and (path := latest_checkpoint(ckpt_dir)):
        state, cfg_saved, _ = load_checkpoint(path)
        if diffs := resume_config_mismatches(cfg_saved, cfg):
            raise SystemExit(
                f"--resume config mismatch vs {path}: the checkpoint was "
                "trained under different structural settings — "
                + ", ".join(f"{k}: saved={a!r} flag={b!r}"
                            for k, (a, b) in sorted(diffs.items()))
                + ". Re-run with matching flags (only "
                + ", ".join(sorted(RESUME_OVERRIDABLE))
                + " may differ on resume).")
        log.log({"event": "resumed", "from": path})
    else:
        state = init_train_state(cfg)

    loader = TrainLoader(train_data, vocab, cfg)
    steps_per_epoch = loader.steps_per_epoch
    eval_every = cfg.eval_every or steps_per_epoch
    save_every = cfg.save_every or steps_per_epoch
    max_steps = args.max_steps or cfg.num_epochs * steps_per_epoch

    prof_range = tuple(int(x) for x in args.profile_steps.split(",")) \
        if args.profile_steps else None
    if prof_range:
        ok, reason = profiler_supported()
        if not ok:
            log.log({"event": "profile_disabled", "reason": reason})
            prof_range = None

    step = int(np.asarray(state.opt.step))
    t_last, s_last = time.time(), step
    rounds_per_batch = cfg.batch_size * cfg.num_rounds
    running = None
    loss_buf: list = []
    last_eval: dict = {}
    epoch = step // steps_per_epoch
    # Deterministic mid-epoch resume (SURVEY.md §5 recovery story): the
    # epoch's batch order is a pure function of (seed, epoch), so skipping
    # the already-consumed prefix reproduces the unbroken run exactly.
    skip = step % steps_per_epoch

    def flush_losses():
        # Keep losses as device scalars/arrays between log points: a
        # per-step float() readback would sync host<->device every step and
        # gate dispatch of the next one.  Runs before every checkpoint/eval
        # so a NaN can never reach a saved checkpoint unnoticed (failure
        # detection, SURVEY.md §5: the latest good checkpoint +
        # deterministic resume is recovery).
        nonlocal running
        if not loss_buf:
            return None
        losses = np.concatenate(
            [np.asarray(x, np.float64).ravel() for x in loss_buf])
        loss_buf.clear()
        for loss in losses:
            running = (loss if running is None
                       else 0.95 * running + 0.05 * loss)
        bad = losses[~np.isfinite(losses)]
        if bad.size:
            log.log({"event": "non_finite_loss", "step": step,
                     "loss": float(bad[0])})
            raise FloatingPointError(
                f"non-finite loss {bad[0]} by step {step}; "
                "re-run with --debug_nans to locate the origin")
        return float(losses[-1])

    def crossed(every, prev):
        return prev // every != step // every

    while step < max_steps:
        batch_iter = (b for i, b in enumerate(loader.epoch(seed=cfg.seed + epoch))
                      if i >= skip)
        while step < max_steps:
            pending = []
            for b in batch_iter:
                pending.append(b.as_dict())
                if len(pending) >= min(group, max_steps - step):
                    break
            if not pending:
                break                       # epoch exhausted
            if prof_range and step <= prof_range[0] < step + len(pending):
                jax.profiler.start_trace(os.path.join(ckpt_dir, "trace"))
            timing = args.time_steps and step < args.time_steps
            if timing:
                t0 = time.time()  # prior dispatch synced by its own readback
            prev = step
            if len(pending) == group and multi_fn is not None:
                # One dispatch for the whole group: stacked transfer +
                # on-device lax.scan of the step (metrics come back (G,)).
                state, m = multi_fn(state, shard_batch_stack(pending, mesh))
                step += len(pending)
                loss_buf.append(m["loss"])
            else:  # group==1, epoch tail, or max_steps trim
                for bd in pending:
                    state, m = train_fn(state, shard_batch(bd, mesh))
                    step += 1
                    # per-step buffering: EVERY tail step's loss must reach
                    # the NaN gate / running EWMA, not just the last one
                    loss_buf.append(m["loss"])
            if timing:
                # block_until_ready does not block under the tunneled TPU
                # runtime (CLAUDE.md); a host readback is the reliable sync.
                loss_now = float(np.asarray(m["loss"]).ravel()[-1])
                log.log({"event": "step_time", "step": step,
                         "seconds": (time.time() - t0) / len(pending),
                         "steps_per_dispatch": len(pending),
                         "loss": loss_now})
            if prof_range and prev < prof_range[1] <= step:
                jax.profiler.stop_trace()

            if crossed(cfg.log_every, prev) or step >= max_steps:
                last_loss = flush_losses()
                dt = time.time() - t_last
                rps = (step - s_last) * rounds_per_batch / max(dt, 1e-9)
                log.log({"event": "train", "step": step, "epoch": epoch,
                         "loss": last_loss, "running_loss": running,
                         "lr": float(np.asarray(m["lr"]).ravel()[-1]),
                         "grad_norm":
                             float(np.asarray(m["grad_norm"]).ravel()[-1]),
                         "rounds_per_sec": rps,
                         "rounds_per_sec_per_chip": rps / len(jax.devices())})
                t_last, s_last = time.time(), step
            if crossed(eval_every, prev) or step >= max_steps:
                flush_losses()
                metrics = evaluate_split(state.params, val_data, vocab, cfg,
                                         mesh, eval_fn=eval_fn,
                                         table_fns=table_fns,
                                         gen_fns=gen_fns,
                                         resident=args.eval_resident,
                                         resident_max_bytes=2 << 30)
                last_eval = metrics
                log.log({"event": "eval", "step": step, **metrics})
            if crossed(save_every, prev) or step >= max_steps:
                flush_losses()   # never checkpoint past an undetected NaN
                path = save_checkpoint(ckpt_dir, state, cfg)
                log.log({"event": "checkpoint", "step": step, "path": path})
        epoch += 1
        skip = 0
    log.log({"event": "done", "step": step, **{f"final_{k}": v
                                               for k, v in last_eval.items()}})
    log.close()
    return last_eval


if __name__ == "__main__":
    main()

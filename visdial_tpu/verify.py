"""On-chip Pallas-vs-XLA kernel equivalence gate.

Every Pallas kernel in this package has a pure-JAX twin, and the twin
equivalence tests run in INTERPRETER mode on the CPU test platform
(tests/conftest.py forces it; ops/*_pallas.py default `interpret` to
"not TPU").  Compiled Mosaic on the real chip is a different code path
with its own failure modes — round 4 observed a kernel variant that
interpreted fine but failed Mosaic compilation on-chip (K>=3 blocked
backward), and a silent on-chip numeric miscompile would otherwise be
caught by nothing: train would just converge slightly wrong.

This module runs every kernel AND its twin at flagship shapes on the
CURRENT backend and reports per-check error statistics.  bench.py embeds
the result in the bench JSON as the `kernel_check` block and refuses to
report throughput for miscompiled kernels (hard tolerance gate).

Checks (kernel vs twin, value and/or grad):
  * masked-LSTM forward (ops/lstm_pallas.lstm_layer_pallas vs _layer_xla)
    at the flagship 32k-row option-LSTM shape (bf16), the small-tile gen
    shape (bf16), and f32;
  * fused LSTM backward (grads through `_layer`'s custom VJP — the
    save_cell forward + _lstm_bwd_kernel + XLA dW matmuls — vs autodiff
    of the twin) at both shapes;
  * slot attention + fused attention+fusion tail
    (ops/attention_pallas vs their _*_ref twins);
  * online-logsumexp LM scoring (logp AND lse) and the LM d-logits
    backward kernel (ops/lm_score_pallas vs materialized-logits math);
  * one whole train-step gradient: value_and_grad of model_loss,
    impl="pallas" vs impl="xla", both decoders, at flagship dims with
    realistic lengths (engages the length-sort + per-tile-bounds path);
  * the dedup'd disc-train layout (opt_uniq + gather map + all-pad
    filler — the production default) vs the plain expanded layout on
    identical candidate tokens, both through the Pallas path.

Tolerances are RELATIVE to the twin's per-leaf max |value| and were pinned
from measured on-chip errors (see tests/test_verify.py for the CPU
interpreter rehearsal and the tolerance-failure path).
"""

from __future__ import annotations

import json
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# comparison helpers
# ---------------------------------------------------------------------------

def _leaf_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    if got.shape != want.shape:
        return float("inf"), float("inf")
    # non-finite on EITHER side fails the leaf: a NaN in the twin would
    # otherwise make np.max return NaN, and max(0.0, nan) keeps 0.0 —
    # masking real mismatches on the finite elements (tests/test_verify.py)
    if not (np.all(np.isfinite(got)) and np.all(np.isfinite(want))):
        return float("inf"), float("inf")
    abs_err = float(np.max(np.abs(got - want))) if got.size else 0.0
    scale = float(np.max(np.abs(want))) if want.size else 0.0
    return abs_err, abs_err / max(scale, 1e-12)


def _record(name: str, got, want, rel_tol: float) -> dict:
    """Compare two pytrees; worst per-leaf relative error decides."""
    gl, wl = jax.tree.leaves(got), jax.tree.leaves(want)
    if len(gl) != len(wl):
        return {"name": name, "max_abs_err": float("inf"),
                "max_rel_err": float("inf"), "rel_tol": rel_tol, "ok": False}
    max_abs = max_rel = 0.0
    for g, w in zip(gl, wl):
        a, r = _leaf_err(g, w)
        max_abs, max_rel = max(max_abs, a), max(max_rel, r)
    return {"name": name, "max_abs_err": max_abs, "max_rel_err": max_rel,
            "rel_tol": rel_tol, "ok": bool(max_rel <= rel_tol)}


def _aggregate(checks: list[dict]) -> dict:
    return {"ok": all(c["ok"] for c in checks), "checks": checks}


# ---------------------------------------------------------------------------
# shape scales
# ---------------------------------------------------------------------------

# flagship: the shapes production actually runs on v5e — the 32k-row option
# LSTM (disc train batch 32 x 10 rounds x 100 candidates), the 640-row gen
# train tile (batch 64 x 10 rounds), V=8848 vocab, H=512.
SCALES = {
    "flagship": dict(N_big=32000, N_small=640, T=9, E=300, H=512,
                     V=8848, B_att=320, R=10, NT_lm=18432, B_step=8,
                     cfg_overrides={}),
    # CPU-interpreter rehearsal of the same code paths (tests)
    "tiny": dict(N_big=64, N_small=16, T=5, E=12, H=16,
                 V=64, B_att=8, R=4, NT_lm=96, B_step=2,
                 cfg_overrides=dict(num_rounds=3, num_options=4,
                                    max_ques_len=5, max_ans_len=4,
                                    max_cap_len=6, img_feat_size=32,
                                    img_embed_size=16)),
}

# Relative tolerances per check family.  bf16 paths: both sides do bf16
# MXU matmuls with f32 accumulation, but reduction order / fusion differ,
# and the recurrence compounds over T steps.  Values pinned at ~5-10x the
# max error measured on the real v5e chip (run recorded in BASELINE.md);
# a miscompile (wrong block indexing, clobbered carry, bad mask algebra)
# produces O(1) relative errors, orders of magnitude past these.
TOLS = {
    # f32 matmuls ride the MXU via multi-pass bf16 decomposition on v5e;
    # kernel vs XLA-scan decompose/accumulate differently, compounded over
    # the T-step recurrence: measured 6.8e-4 on-chip (0.0 on CPU)
    "lstm_fwd_f32": 3e-3,
    "lstm_fwd_bf16": 3e-2,
    "lstm_bwd_bf16": 5e-2,
    "attention_bf16": 2e-2,
    "attention_fusion_bf16": 2e-2,
    "lm_logprobs_bf16": 2e-2,
    "lm_dlogits_bf16": 2e-2,
    "train_grads_disc_bf16": 6e-2,
    "train_grads_gen_bf16": 6e-2,
    # dedup vs plain layout, BOTH through the Pallas path: same math, only
    # duplicate-row grad summation order differs — measured 7.8e-3 on-chip
    "train_grads_disc_dedup_bf16": 6e-2,
}


def _lengths_mask(rng, N: int, T: int):
    """Left-aligned length mask with the hard cases: full rows, short rows,
    and a few all-pad rows (the carry-through/empty-span path)."""
    lens = rng.integers(0, T + 1, size=N)
    lens[: max(N // 8, 1)] = T          # some full-length rows
    lens[N // 2: N // 2 + max(N // 16, 1)] = 0   # some all-pad rows
    return (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# individual checks
# ---------------------------------------------------------------------------

def _lstm_args(s, N: int, dtype, seed: int = 0):
    rng = np.random.default_rng(seed)
    T, E, H = s["T"], s["E"], s["H"]
    w = jnp.asarray(rng.standard_normal((E + H, 4 * H)) * 0.08, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4 * H) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((N, T, E)) * 0.5, dtype)
    mask = jnp.asarray(_lengths_mask(rng, N, T))
    h0 = jnp.asarray(rng.standard_normal((N, H)) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((N, H)) * 0.3, jnp.float32)
    return w, b, x, mask, h0, c0


def check_lstm_fwd(s, dtype, name: str) -> dict:
    from .ops.lstm_pallas import _layer_xla, lstm_layer_pallas

    N = s["N_big"] if dtype == jnp.bfloat16 else max(s["N_big"] // 10, 8)
    args = _lstm_args(s, N, dtype)
    got = jax.jit(lambda *a: lstm_layer_pallas(*a))(*args)
    want = jax.jit(_layer_xla)(*args)
    return _record(name, got, want, TOLS[name.rsplit("@", 1)[0]])


def check_lstm_bwd(s, N: int, name: str) -> dict:
    """Grads through the custom VJP (fused save_cell fwd + bwd kernel on
    the TPU bf16 path) vs autodiff of the pure twin."""
    from .ops import lstm_pallas

    dtype = jnp.bfloat16
    w, b, x, mask, h0, c0 = _lstm_args(s, N, dtype, seed=1)
    rng = np.random.default_rng(2)
    T, H = s["T"], s["H"]
    ghs = jnp.asarray(rng.standard_normal((N, T, H)) * 0.1, jnp.float32)
    ght = jnp.asarray(rng.standard_normal((N, H)) * 0.1, jnp.float32)
    gct = jnp.asarray(rng.standard_normal((N, H)) * 0.1, jnp.float32)

    def scalarize(fn):
        # cotangents are explicit jit ARGUMENTS: a closure capture would
        # embed them as HLO constants (590 MB at flagship shapes), which
        # the tunneled remote-compile endpoint rejects (HTTP 413)
        def f(w, b, x, h0, c0, ghs, ght, gct):
            hs, ht, ct = fn(w, b, x, mask, h0, c0)
            return (jnp.sum(hs.astype(jnp.float32) * ghs)
                    + jnp.sum(ht.astype(jnp.float32) * ght)
                    + jnp.sum(ct.astype(jnp.float32) * gct))
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))

    # off-TPU the fused backward kernel only engages when forced (the same
    # switch tests/test_pallas.py uses); on TPU it engages for bf16
    forced = jax.default_backend() != "tpu"
    if forced:
        prev, lstm_pallas.FORCE_BWD_KERNEL = lstm_pallas.FORCE_BWD_KERNEL, True
    try:
        got = scalarize(lstm_pallas._layer)(w, b, x, h0, c0, ghs, ght, gct)
    finally:
        if forced:
            lstm_pallas.FORCE_BWD_KERNEL = prev
    want = scalarize(lstm_pallas._layer_xla)(w, b, x, h0, c0, ghs, ght, gct)
    return _record(name, got, want, TOLS["lstm_bwd_bf16"])


def check_attention(s) -> dict:
    from .ops.attention_pallas import _attention_ref, masked_slot_attention_pallas

    rng = np.random.default_rng(3)
    B, R, H = s["B_att"], s["R"], s["H"]
    q = jnp.asarray(rng.standard_normal((B, R, H)) * 0.3, jnp.bfloat16)
    slots = jnp.asarray(rng.standard_normal((B, R, H)) * 0.3, jnp.bfloat16)
    valid = jnp.asarray(np.tril(np.ones((R, R), np.float32))[None]
                        * np.ones((B, 1, 1), np.float32))
    got = jax.jit(masked_slot_attention_pallas)(q, slots, valid)
    want = jax.jit(_attention_ref)(q, slots, valid)
    return _record("attention_bf16", got, want, TOLS["attention_bf16"])


def check_attention_fusion(s) -> dict:
    from .ops.attention_pallas import (
        _attention_fusion_ref,
        attention_fusion_pallas,
    )

    rng = np.random.default_rng(4)
    B, R, H = s["B_att"], s["R"], s["H"]
    q = jnp.asarray(rng.standard_normal((B, R, H)) * 0.3, jnp.bfloat16)
    slots = jnp.asarray(rng.standard_normal((B, R, H)) * 0.3, jnp.bfloat16)
    valid = jnp.asarray(np.tril(np.ones((R, R), np.float32))[None]
                        * np.ones((B, 1, 1), np.float32))
    fw = jnp.asarray(rng.standard_normal((2 * H, H)) * 0.05, jnp.float32)
    fb = jnp.asarray(rng.standard_normal(H) * 0.05, jnp.float32)
    got = jax.jit(attention_fusion_pallas)(q, slots, valid, fw, fb)
    want = jax.jit(_attention_fusion_ref)(q, slots, valid, fw, fb)
    return _record("attention_fusion_bf16", got, want,
                   TOLS["attention_fusion_bf16"])


def _lm_args(s, seed: int = 5):
    rng = np.random.default_rng(seed)
    NT, H, V = s["NT_lm"], s["H"], s["V"]
    x = jnp.asarray(rng.standard_normal((NT, H)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(V) * 0.05, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, NT), jnp.int32)
    return x, w, b, tgt


def _lm_twin_logits(x, w, b):
    """Exactly the kernel's matmul contract: head weights cast to the
    compute dtype, f32 accumulation (cf. ops/lm_loss.masked_nll_ref)."""
    return (jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
            + b.astype(jnp.float32))


def check_lm_logprobs(s) -> dict:
    from .ops.lm_score_pallas import lm_token_logprobs_lse_pallas

    x, w, b, tgt = _lm_args(s)
    got = jax.jit(lm_token_logprobs_lse_pallas)(x, w, b, tgt)

    def twin(x, w, b, tgt):
        logits = _lm_twin_logits(x, w, b)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, tgt[:, None], axis=-1)[:, 0]
        return tl - lse, lse

    want = jax.jit(twin)(x, w, b, tgt)
    return _record("lm_logprobs_bf16", got, want, TOLS["lm_logprobs_bf16"])


def check_lm_dlogits(s) -> dict:
    from .ops.lm_score_pallas import lm_dlogits_pallas

    x, w, b, tgt = _lm_args(s, seed=6)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.standard_normal(x.shape[0]) * 0.1, jnp.float32)

    def twin_lse(x, w, b):
        return jax.nn.logsumexp(_lm_twin_logits(x, w, b), axis=-1)

    lse = jax.jit(twin_lse)(x, w, b)
    got = jax.jit(lm_dlogits_pallas)(x, w, b, tgt, lse, g)

    def twin(x, w, b, tgt, lse, g):
        logits = _lm_twin_logits(x, w, b)
        p = jnp.exp(logits - lse[:, None])
        onehot = jax.nn.one_hot(tgt, logits.shape[-1], dtype=jnp.float32)
        return (g[:, None] * (onehot - p)).astype(x.dtype)

    want = jax.jit(twin)(x, w, b, tgt, lse, g)
    return _record("lm_dlogits_bf16", got, want, TOLS["lm_dlogits_bf16"])


def _step_config(s, decoder: str):
    from .config import Config

    return Config(
        encoder="mn-ques-im-hist", decoder=decoder, vocab_size=s["V"],
        embed_size=300 if s["E"] >= 300 else s["E"],
        rnn_hidden_size=s["H"], batch_size=s["B_step"],
        dropout=0.0, compute_dtype="bfloat16", use_pallas=True,
        **s["cfg_overrides"],
    )


def check_train_grads(s, decoder: str) -> dict:
    """Whole train-step gradient, bf16 Pallas vs bf16 XLA, at realistic
    lengths (engages the candidate length-sort + per-tile bounds path).
    train=False: the equivalence convention of record — dropout mask
    ASSIGNMENT differs when sorting repoints rows (CLAUDE.md)."""
    from .data.synthetic import random_batch
    from .models.model import model_init, model_loss

    cfg = _step_config(s, decoder)
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = random_batch(cfg, seed=0, full_lengths=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def run(impl):
        # batch as an explicit argument (not a closure capture -> HLO
        # constant): see check_lstm_bwd's remote-compile size note
        def loss(p, b):
            return model_loss(p, b, cfg, train=False, impl=impl)
        return jax.jit(jax.value_and_grad(loss))(params, batch)

    got, want = run("pallas"), run("xla")
    return _record(f"train_grads_{decoder}_bf16", got, want,
                   TOLS[f"train_grads_{decoder}_bf16"])


def check_train_grads_dedup(s) -> dict:
    """The production-default dedup'd disc-train layout (opt_uniq global
    gather + all-pad filler rows, Config.disc_dedup_options) vs the plain
    expanded layout on the SAME candidate tokens — both compiled through
    the Pallas path on the current backend.  Deterministic math is exact
    (same tokens -> same embedding); this is the only check that compiles
    the dedup batch's filler-tile/length-sort handling on real Mosaic —
    check_train_grads' random_batch never emits opt_uniq/opt_row."""
    from .data.loader import dedup_option_rows
    from .data.synthetic import random_batch
    from .models.model import model_init, model_loss

    cfg = _step_config(s, "disc")
    params = model_init(jax.random.PRNGKey(0), cfg)
    plain = random_batch(cfg, seed=0, full_lengths=False)
    # random_batch candidates are ~all unique; redraw them from a small
    # pool so the batch carries heavy duplication (the operating point the
    # layout exists for) and opt_uniq gets real all-pad filler rows
    rng = np.random.default_rng(8)
    B, R, K = cfg.batch_size, cfg.num_rounds, cfg.num_options
    pool = plain["opt"].reshape(-1, cfg.max_ans_len)[: max(B * R * K // 4, 1)]
    sel = rng.integers(0, pool.shape[0], size=(B, R, K))
    plain["opt"] = pool[sel]
    dedup = dict(plain)
    del dedup["opt"]
    dedup["opt_uniq"], dedup["opt_row"] = dedup_option_rows(pool, sel)
    plain = {k: jnp.asarray(v) for k, v in plain.items()}
    dedup = {k: jnp.asarray(v) for k, v in dedup.items()}

    def run(b):
        def loss(p, b):
            return model_loss(p, b, cfg, train=False, impl="pallas")
        return jax.jit(jax.value_and_grad(loss))(params, b)

    got, want = run(dedup), run(plain)
    return _record("train_grads_disc_dedup_bf16", got, want,
                   TOLS["train_grads_disc_dedup_bf16"])


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run_checks(scale: str = "flagship", log: Callable[[str], None] = None,
               include: set[str] | None = None) -> dict:
    """Run every kernel-vs-twin check on the CURRENT backend.

    Returns {"ok": bool, "backend": str, "scale": str, "checks": [...]}.
    `include` filters by check-name prefix (iteration convenience).
    """
    s = SCALES[scale]
    backend = jax.default_backend()
    steps: list[tuple[str, Callable[[], dict]]] = [
        ("lstm_fwd_f32", lambda: check_lstm_fwd(s, jnp.float32,
                                                "lstm_fwd_f32")),
        ("lstm_fwd_bf16@big", lambda: check_lstm_fwd(s, jnp.bfloat16,
                                                     "lstm_fwd_bf16@big")),
        ("lstm_bwd_bf16@big", lambda: check_lstm_bwd(s, s["N_big"],
                                                     "lstm_bwd_bf16@big")),
        ("lstm_bwd_bf16@small", lambda: check_lstm_bwd(
            s, s["N_small"], "lstm_bwd_bf16@small")),
        ("attention_bf16", lambda: check_attention(s)),
        ("attention_fusion_bf16", lambda: check_attention_fusion(s)),
        ("lm_logprobs_bf16", lambda: check_lm_logprobs(s)),
        ("lm_dlogits_bf16", lambda: check_lm_dlogits(s)),
        ("train_grads_disc_bf16", lambda: check_train_grads(s, "disc")),
        ("train_grads_gen_bf16", lambda: check_train_grads(s, "gen")),
        ("train_grads_disc_dedup_bf16",
         lambda: check_train_grads_dedup(s)),
    ]
    checks = []
    for name, fn in steps:
        if include and not any(name.startswith(p) for p in include):
            continue
        try:
            rec = fn()
        except Exception as e:  # a crashing kernel is a failing check
            rec = {"name": name, "max_abs_err": float("inf"),
                   "max_rel_err": float("inf"),
                   "rel_tol": TOLS.get(name.rsplit("@", 1)[0], 0.0),
                   "ok": False, "error": f"{type(e).__name__}: {e}"}
        if log:
            log(f"[verify] {rec['name']}: rel {rec['max_rel_err']:.2e} "
                f"(tol {rec['rel_tol']:.0e}) abs {rec['max_abs_err']:.2e} "
                f"{'OK' if rec['ok'] else 'FAIL'}"
                + (f" [{rec['error']}]" if rec.get("error") else ""))
        checks.append(rec)
    out = _aggregate(checks)
    out["backend"] = backend
    out["scale"] = scale
    return out


def main(argv=None) -> int:
    import argparse
    import sys

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", default="flagship", choices=sorted(SCALES))
    p.add_argument("--include", nargs="*", default=None,
                   help="check-name prefixes to run (default: all)")
    args = p.parse_args(argv)
    res = run_checks(args.scale, log=lambda m: print(m, file=sys.stderr),
                     include=set(args.include) if args.include else None)
    print(json.dumps(res))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Fused masked-NLL training loss for the gen decoder's LM head.

Replaces the materialize-then-reduce loss of decoders/gen.lua's training
path (teacher-forced masked ClassNLLCriterion — reference: decoders/gen.lua
via the rnn package's masked sequence criterion; SURVEY.md §2 #9): the
straightforward XLA version computes a full (N*T, V) float32 logits tensor
(~100 MB at flagship shapes), log-softmaxes it, gathers the targets, and in
the backward materializes d-logits at the same width — several HBM round
trips for one scalar per token.

Here the head is a `jax.custom_vjp` around two Pallas kernels
(ops/lm_score_pallas.py):

  forward  — online-logsumexp scoring: per token, only log p(target) and
             the row logsumexp reach HBM.
  backward — rebuilds the softmax tile-by-tile from the saved logsumexp and
             emits COMPUTE-DTYPE d-logits (half the bytes of f32, no
             separate softmax pass); dW / dx / db are then three clean
             MXU matmuls at the XLA level.

The pure-JAX twin (`masked_nll_ref`, and `masked_nll` in models/decoders.py
over materialized logits) is the behavior of record; tests assert value and
grad equivalence (tests/test_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lm_score_pallas import lm_dlogits_pallas, lm_token_logprobs_lse_pallas


@jax.custom_vjp
def _token_logprobs(x, w, b, tgt):
    """log p(tgt_i | x_i) per row: x (NT, H) compute dtype, w (H, V) f32
    param, b (V,), tgt (NT,) int32.  Returns (NT,) f32."""
    logp, _ = lm_token_logprobs_lse_pallas(x, w, b, tgt)
    return logp


def _token_logprobs_fwd(x, w, b, tgt):
    logp, lse = lm_token_logprobs_lse_pallas(x, w, b, tgt)
    return logp, (x, w, b, tgt, lse)


def _token_logprobs_bwd(res, g):
    x, w, b, tgt, lse = res
    f32 = jnp.float32
    dlog = lm_dlogits_pallas(x, w, b, tgt, lse, g)          # (NT, V) cdt
    wc = w.astype(x.dtype)
    dx = jnp.dot(dlog, wc.T, preferred_element_type=f32).astype(x.dtype)
    dw = jnp.dot(x.T, dlog, preferred_element_type=f32).astype(w.dtype)
    db = jnp.sum(dlog, axis=0, dtype=f32).astype(b.dtype)
    return dx, dw, db, None


_token_logprobs.defvjp(_token_logprobs_fwd, _token_logprobs_bwd)


def masked_nll_fused(outs, w, b, targets):
    """Mean NLL over non-pad targets, logits never materialized.

    outs (N, T, H) LM hidden states in the compute dtype; w (H, V) / b (V,)
    the output projection; targets (N, T) int32 with 0 = ignore.
    Numerically: identical math to masked_nll(linear(outs), targets) — the
    softmax statistics are exact (online logsumexp), the only difference is
    d-logits rounding to the compute dtype in the backward.
    """
    N, T, H = outs.shape
    tgt = targets.reshape(N * T)
    tok_lp = _token_logprobs(outs.reshape(N * T, H), w, b, tgt)
    mask = (tgt != 0).astype(tok_lp.dtype)
    return -jnp.sum(tok_lp * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_nll_ref(outs, w, b, targets):
    """Pure-JAX twin of masked_nll_fused (materialized logits), for tests
    and non-TPU backends."""
    logits = (jnp.dot(outs, w.astype(outs.dtype),
                      preferred_element_type=jnp.float32)
              + b.astype(jnp.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != 0).astype(logits.dtype)
    return -jnp.sum(tok_lp * mask) / jnp.maximum(jnp.sum(mask), 1.0)

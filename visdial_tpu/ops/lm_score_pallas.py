"""Fused vocab-projection LM scoring: logit[target] - logsumexp, online.

The gen decoder's 100-candidate eval (reference: evaluate.lua gen branch)
needs, per candidate token, its log-probability under the LM head — i.e.
`W_out` logits for every (row, vocab) pair reduced immediately to a scalar.
Materializing the logits is ~10GB at flagship shapes; the lax.map-chunked
XLA path (models/decoders.py) bounds that to ~2.6GB of HBM round trips per
batch.  This kernel removes the round trips entirely: it tiles the vocab
axis, keeps each logits tile in VMEM, and maintains an ONLINE logsumexp
(flash-attention-style running max/sum) plus the target logit extracted
with a one-hot matmul — per token, only the final scalar ever reaches HBM.

The same tiling also powers the TRAINING loss backward (`lm_dlogits_pallas`
+ ops/lm_loss.py): the forward saves each row's logsumexp, and the backward
rebuilds the softmax tile-by-tile from it, emitting compute-dtype d-logits
for the dW/dx matmuls — the (N*T, V) float32 logits tensor never exists in
either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lm_score_kernel(x_ref, tgt_ref, w_ref, b_ref, out_ref, lse_ref,
                     m_scr, s_scr, tl_scr, *, VT: int, n_vt: int):
    """Grid (row tiles, vocab tiles); vocab minor.  Blocks: x (TB,H),
    tgt (TB,1) int32, w (H,VT), b (1,VT), out/lse (TB,1) f32; scratch
    (TB,1).  Emits log p(tgt) AND the row logsumexp (the softmax statistic
    the fused training backward reuses to rebuild probabilities without a
    second reduction pass)."""
    v = pl.program_id(1)
    TB = x_ref.shape[0]

    @pl.when(v == 0)
    def _init():
        m_scr[:] = jnp.full((TB, 1), NEG, jnp.float32)
        s_scr[:] = jnp.zeros((TB, 1), jnp.float32)
        tl_scr[:] = jnp.zeros((TB, 1), jnp.float32)

    logits = (jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
              + b_ref[:].astype(jnp.float32))                 # (TB, VT)

    # online logsumexp update
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    s_scr[:] = (s_scr[:] * jnp.exp(m_old - m_new)
                + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True))
    m_scr[:] = m_new

    # target logit if it falls in this vocab tile (one-hot row-sum)
    local = tgt_ref[:].astype(jnp.int32) - v * VT             # (TB, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, VT), 1)
    onehot = (col == local).astype(jnp.float32)
    tl_scr[:] = tl_scr[:] + jnp.sum(logits * onehot, axis=-1, keepdims=True)

    @pl.when(v == n_vt - 1)
    def _final():
        lse = m_scr[:] + jnp.log(s_scr[:])
        out_ref[:] = tl_scr[:] - lse
        lse_ref[:] = lse


def _pad_vocab(w, b, dt, V_pad):
    """Cast/pad the head weights; padded vocab gets a NEG bias so it never
    wins the max / adds softmax mass."""
    V = w.shape[1]
    w = w.astype(dt)
    if V_pad != V:
        w = jnp.pad(w, ((0, 0), (0, V_pad - V)))
        b = jnp.pad(b, (0, V_pad - V), constant_values=NEG)
    return w, b


def lm_token_logprobs_lse_pallas(x, w, b, tgt, *,
                                 interpret: bool | None = None):
    """Per-token target log-probabilities + row logsumexp, no materialized
    logits.

    x (NT, H) LM hidden states (compute dtype); w (H, V); b (V,);
    tgt (NT,) int32 target ids.  Returns (logp (NT,), lse (NT,)) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    NT, H = x.shape
    V = w.shape[1]
    dt = x.dtype
    VT = 1024
    TB = 512
    V_pad = _round_up(V, VT)
    NT_pad = _round_up(NT, TB)

    w, b = _pad_vocab(w, b, dt, V_pad)
    if NT_pad != NT:
        x = jnp.pad(x, ((0, NT_pad - NT), (0, 0)))
        tgt = jnp.pad(tgt, (0, NT_pad - NT))
    n_vt = V_pad // VT

    row_blk = lambda i, v: (i, 0)
    w_blk = lambda i, v: (0, v)
    b_blk = lambda i, v: (0, v)

    out, lse = pl.pallas_call(
        functools.partial(_lm_score_kernel, VT=VT, n_vt=n_vt),
        grid=(NT_pad // TB, n_vt),
        in_specs=[
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, VT), w_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VT), b_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NT_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((NT_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, 1), jnp.float32),
            pltpu.VMEM((TB, 1), jnp.float32),
            pltpu.VMEM((TB, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * NT_pad * H * V_pad,
            bytes_accessed=NT_pad * H * 2 + H * V_pad * 2,
            transcendentals=NT_pad * V_pad,
        ),
        interpret=interpret,
    )(x, tgt.reshape(-1, 1).astype(jnp.int32), w,
      b.reshape(1, -1).astype(jnp.float32))
    return out[:NT, 0], lse[:NT, 0]


def lm_token_logprobs_pallas(x, w, b, tgt, *, interpret: bool | None = None):
    """Per-token target log-probabilities without materializing logits.

    x (NT, H) LM hidden states (compute dtype); w (H, V); b (V,);
    tgt (NT,) int32 target ids.  Returns (NT,) f32 log p(tgt | x).
    """
    return lm_token_logprobs_lse_pallas(x, w, b, tgt,
                                        interpret=interpret)[0]


def _lm_dlogits_kernel(x_ref, tgt_ref, lse_ref, g_ref, w_ref, b_ref,
                       dlog_ref, *, VT: int):
    """Backward of the target-logprob map, one (row tile, vocab tile) block:
    d logits[i, v] = g_i * (onehot[i, v] - softmax[i, v]), with softmax
    rebuilt from the saved row logsumexp — the logits tile is recomputed in
    VMEM and only the (compute-dtype) d-logits tile reaches HBM."""
    v = pl.program_id(1)
    TB = x_ref.shape[0]

    logits = (jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
              + b_ref[:].astype(jnp.float32))                 # (TB, VT)
    p = jnp.exp(logits - lse_ref[:])                          # (TB, VT)
    local = tgt_ref[:].astype(jnp.int32) - v * VT
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, VT), 1)
    onehot = (col == local).astype(jnp.float32)
    dlog_ref[:] = (g_ref[:] * (onehot - p)).astype(dlog_ref.dtype)


def lm_dlogits_pallas(x, w, b, tgt, lse, g, *,
                      interpret: bool | None = None):
    """d logits (NT, V) in x.dtype for the fused LM-head loss backward.

    x (NT, H) compute dtype; w (H, V); b (V,); tgt (NT,) int32;
    lse (NT,) f32 saved row logsumexp; g (NT,) f32 cotangent of logp.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    NT, H = x.shape
    V = w.shape[1]
    dt = x.dtype
    VT = 1024
    TB = 512
    V_pad = _round_up(V, VT)
    NT_pad = _round_up(NT, TB)

    w, b = _pad_vocab(w, b, dt, V_pad)
    if NT_pad != NT:
        x = jnp.pad(x, ((0, NT_pad - NT), (0, 0)))
        tgt = jnp.pad(tgt, (0, NT_pad - NT))
        lse = jnp.pad(lse, (0, NT_pad - NT))
        g = jnp.pad(g, (0, NT_pad - NT))   # zero cotangent on pad rows

    row_blk = lambda i, v: (i, 0)
    tile_blk = lambda i, v: (i, v)
    w_blk = lambda i, v: (0, v)

    dlog = pl.pallas_call(
        functools.partial(_lm_dlogits_kernel, VT=VT),
        grid=(NT_pad // TB, V_pad // VT),
        in_specs=[
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, VT), w_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VT), w_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, VT), tile_blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT_pad, V_pad), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * NT_pad * H * V_pad,
            bytes_accessed=(NT_pad * H + H * V_pad + NT_pad * V_pad) * 2,
            transcendentals=NT_pad * V_pad,
        ),
        interpret=interpret,
    )(x, tgt.reshape(-1, 1).astype(jnp.int32),
      lse.reshape(-1, 1).astype(jnp.float32),
      g.reshape(-1, 1).astype(jnp.float32), w,
      b.reshape(1, -1).astype(jnp.float32))
    return dlog[:NT, :V]

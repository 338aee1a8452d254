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

Forward-only (candidate scoring takes no gradients).
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


def _lm_score_kernel(x_ref, tgt_ref, w_ref, b_ref, out_ref,
                     m_scr, s_scr, tl_scr, *, VT: int, n_vt: int):
    """Grid (row tiles, vocab tiles); vocab minor.  Blocks: x (TB,H),
    tgt (TB,1) int32, w (H,VT), b (1,VT), out (TB,1) f32; scratch (TB,1)."""
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
        out_ref[:] = tl_scr[:] - (m_scr[:] + jnp.log(s_scr[:]))


def lm_token_logprobs_pallas(x, w, b, tgt, *, interpret: bool | None = None):
    """Per-token target log-probabilities without materializing logits.

    x (NT, H) LM hidden states (compute dtype); w (H, V); b (V,);
    tgt (NT,) int32 target ids.  Returns (NT,) f32 log p(tgt | x).
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

    w = w.astype(dt)
    if V_pad != V:
        # pad with NEG bias so padded vocab never wins the max / adds mass
        w = jnp.pad(w, ((0, 0), (0, V_pad - V)))
        b = jnp.pad(b, (0, V_pad - V), constant_values=NEG)
    if NT_pad != NT:
        x = jnp.pad(x, ((0, NT_pad - NT), (0, 0)))
        tgt = jnp.pad(tgt, (0, NT_pad - NT))
    n_vt = V_pad // VT

    row_blk = lambda i, v: (i, 0)
    w_blk = lambda i, v: (0, v)
    b_blk = lambda i, v: (0, v)

    out = pl.pallas_call(
        functools.partial(_lm_score_kernel, VT=VT, n_vt=n_vt),
        grid=(NT_pad // TB, n_vt),
        in_specs=[
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, VT), w_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VT), b_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 1), row_blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT_pad, 1), jnp.float32),
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
    return out[:NT, 0]

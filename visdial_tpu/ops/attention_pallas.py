"""Fused Pallas kernel for masked history-attention over dialog-round slots.

One VMEM pass fuses the reference MN/HREA attention chain — dot-product
scores, causal slot masking, softmax, weighted slot sum (reference:
encoders/mn-ques-im-hist.lua attention block; SURVEY.md §3.5) — so the
(B, R, S) score/attention tensors never materialize in HBM.

Shapes are tiny on the slot axes (R = S = 10 rounds) and MXU-sized on the
hidden axis (H = 512); the grid tiles the batch.  The mask is an explicit
input so a blockwise/long-sequence variant stays kernel-local (SURVEY.md §5
long-context decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_kernel(q_ref, s_ref, valid_ref, out_ref):
    """Blocks: q (TB,R,H), s (TB,S,H), valid (TB,R,S), out (TB,R,H)."""
    q = q_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, s, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (TB, R, S)
    # f32 compare: Mosaic has no bf16 vector comparison on this target
    scores = jnp.where(valid_ref[:].astype(jnp.float32) > 0, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    att = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        att, s, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (TB, R, H)
    out_ref[:] = out.astype(out_ref.dtype)


def _pad_batch(query, slots, valid, TB: int):
    """Pad the batch dim to a TB multiple.  valid pads with 1.0, NOT 0.0:
    an all-masked pad row would softmax over -inf everywhere and NaN."""
    B = query.shape[0]
    B_pad = -(-B // TB) * TB
    if B_pad != B:
        pad = B_pad - B
        query = jnp.pad(query, ((0, pad), (0, 0), (0, 0)))
        slots = jnp.pad(slots, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0), (0, 0)),
                        constant_values=1.0)
    return query, slots, valid, B_pad


@jax.custom_vjp
def _attention(query, slots, valid):
    interpret = jax.default_backend() != "tpu"
    B, R, H = query.shape
    S = slots.shape[1]
    TB = 8
    query, slots, valid, B_pad = _pad_batch(query, slots, valid, TB)
    blk = lambda i: (i, 0, 0)
    out = pl.pallas_call(
        _attention_kernel,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, R, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, S, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R, S), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, R, H), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, R, H), query.dtype),
        interpret=interpret,
    )(query, slots, valid)
    return out[:B]


def _attention_ref(query, slots, valid):
    scores = jnp.einsum("brh,bsh->brs", query, slots,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(valid > 0, scores, NEG_INF)
    att = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("brs,bsh->brh", att, slots,
                      preferred_element_type=jnp.float32).astype(query.dtype)


def _attention_fwd(query, slots, valid):
    return _attention(query, slots, valid), (query, slots, valid)


def _attention_bwd(residuals, g):
    query, slots, valid = residuals

    def ref(query, slots):
        return _attention_ref(query, slots, valid)

    _, vjp = jax.vjp(ref, query, slots)
    dq, ds = vjp(g)
    return dq, ds, jnp.zeros_like(valid)


_attention.defvjp(_attention_fwd, _attention_bwd)


def masked_slot_attention_pallas(query, slots, valid):
    """Fused twin of ops.attention.masked_slot_attention(impl='xla')."""
    return _attention(query, slots, valid)


# ---------------------------------------------------------------------------
# attention + fusion MLP (the full MN/HREA joint-embedding tail in one pass)
# ---------------------------------------------------------------------------

def _attention_fusion_kernel(q_ref, s_ref, valid_ref, wq_ref, wm_ref, b_ref,
                             out_ref):
    """Attention chain + fusion MLP: joint = tanh([q; mem] @ Wf + b),
    computed as q @ Wf_top + mem @ Wf_bot without materializing mem or the
    concat in HBM.  Blocks: q (TB,R,H), s (TB,S,H), valid (TB,R,S),
    wq/wm (H,H), b (1,H), out (TB,R,H)."""
    TB, R, H = q_ref.shape
    q = q_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, s, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    scores = jnp.where(valid_ref[:].astype(jnp.float32) > 0, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    att = e / jnp.sum(e, axis=-1, keepdims=True)
    mem = jax.lax.dot_general(
        att, s, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (TB, R, H)
    dt = q_ref.dtype
    pre = (jnp.dot(q.reshape(TB * R, H).astype(dt), wq_ref[:],
                   preferred_element_type=jnp.float32)
           + jnp.dot(mem.reshape(TB * R, H).astype(dt), wm_ref[:],
                     preferred_element_type=jnp.float32)
           + b_ref[:].astype(jnp.float32))
    out_ref[:] = jnp.tanh(pre).reshape(TB, R, H).astype(out_ref.dtype)


def _attention_fusion_ref(query, slots, valid, fusion_w, fusion_b):
    """Unfused twin: attention -> concat -> linear -> tanh."""
    B, R, H = query.shape
    mem = _attention_ref(query, slots, valid)
    cat = jnp.concatenate([query.reshape(-1, H), mem.reshape(-1, H)], -1)
    pre = (jnp.dot(cat, fusion_w.astype(cat.dtype),
                   preferred_element_type=jnp.float32) + fusion_b)
    return jnp.tanh(pre).reshape(B, R, H).astype(query.dtype)


@jax.custom_vjp
def attention_fusion_pallas(query, slots, valid, fusion_w, fusion_b):
    """joint = tanh(concat([query, attention(query, slots)]) @ Wf + b)
    in one VMEM pass — the full MN/HREA tail (reference: encoders/mn-*.lua
    attention + fusion Linear+Tanh; the 'fusion MLP' kernel named in
    BASELINE.json).  fusion_w (2H, H) rows [query-half; memory-half].

    Gradients go through the unfused twin (numerically identical chain).
    """
    return _attention_fusion_impl(query, slots, valid, fusion_w, fusion_b)


def _attention_fusion_fwd(query, slots, valid, fusion_w, fusion_b):
    out = _attention_fusion_impl(query, slots, valid, fusion_w, fusion_b)
    return out, (query, slots, valid, fusion_w, fusion_b)


def _attention_fusion_bwd(residuals, g):
    query, slots, valid, fusion_w, fusion_b = residuals

    def ref(query, slots, fusion_w, fusion_b):
        return _attention_fusion_ref(query, slots, valid, fusion_w, fusion_b)

    _, vjp = jax.vjp(ref, query, slots, fusion_w, fusion_b)
    dq, ds, dw, db = vjp(g)
    return dq, ds, jnp.zeros_like(valid), dw, db


attention_fusion_pallas.defvjp(_attention_fusion_fwd, _attention_fusion_bwd)


def _attention_fusion_impl(query, slots, valid, fusion_w, fusion_b,
                           *, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, R, H = query.shape
    S = slots.shape[1]
    TB = 8
    query, slots, valid, B_pad = _pad_batch(query, slots, valid, TB)
    dt = query.dtype
    wq = fusion_w[:H].astype(dt)
    wm = fusion_w[H:].astype(dt)
    b2 = fusion_b.reshape(1, -1).astype(jnp.float32)
    blk = lambda i: (i, 0, 0)
    mat = lambda i: (0, 0)
    out = pl.pallas_call(
        _attention_fusion_kernel,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, R, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, S, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R, S), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), mat, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, R, H), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, R, H), dt),
        interpret=interpret,
    )(query, slots, valid, wq, wm, b2)
    return out[:B]

"""Masked attention over dialog-round memory slots.

The reference's MN encoder computes dot-product attention of the query over
<=10 per-round fact embeddings, softmaxes, and takes the weighted sum
(reference: encoders/mn-ques-im-hist.lua; SURVEY.md §3.5); HREA does the
same over dialog-RNN outputs.  Scores are unscaled dot products (documented
decision; 2017-era attention used no 1/sqrt(d) scaling).

Pure-XLA path here; the fused Pallas kernel (scores + masked softmax +
weighted sum in one VMEM pass) lives in ops/attention_pallas.py.  The mask
argument is explicit so a blockwise/long-sequence variant stays a
kernel-local extension (SURVEY.md §5 long-context decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_slot_attention(
    query: jnp.ndarray,   # (B, R, H)
    slots: jnp.ndarray,   # (B, S, H)
    valid: jnp.ndarray,   # (B, R, S) 1.0 where slot visible to that round
    *,
    impl: str = "xla",
) -> jnp.ndarray:
    """Returns the attention-weighted slot sum, (B, R, H)."""
    if impl == "pallas":
        from .attention_pallas import masked_slot_attention_pallas

        return masked_slot_attention_pallas(query, slots, valid)

    scores = jnp.einsum("brh,bsh->brs", query, slots,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(valid > 0, scores, NEG_INF)
    att = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("brs,bsh->brh", att.astype(slots.dtype), slots,
                      preferred_element_type=jnp.float32).astype(query.dtype)

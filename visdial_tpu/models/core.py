"""Parameter initialization and elementary modules (pure-JAX pytrees).

Replaces the reference's nn/nngraph module layer (reference: external deps
nn, nngraph, Element-Research rnn — SURVEY.md §2b).  No module objects:
params are nested dicts of jnp arrays; every module is (init_fn, apply_fn).

Initialization: uniform(-0.08, 0.08) everywhere, matching Torch7's default
`reset` scale for small RNN research code [documented decision — the
reference relies on nn defaults, SURVEY.md marks exact init [P]].  The one
deliberate departure: LSTM forget-gate bias starts at 1.0 (standard practice;
aids gradient flow; documented).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Single source of truth for the uniform(-0.08, 0.08) init lives in the
# ops layer (ops/lstm.py); re-exported here for the linear/embedding inits.
from ..ops.lstm import INIT_SCALE, uniform  # noqa: F401


def linear_init(rng, in_dim: int, out_dim: int) -> dict:
    wk, bk = jax.random.split(rng)
    return {"w": uniform(wk, (in_dim, out_dim)), "b": jnp.zeros((out_dim,))}


def linear(params: dict, x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """Mixed-precision linear: weights cast to the activation dtype (bf16 on
    the fast path), f32 MXU accumulation, output in `out_dtype` (defaults to
    the activation dtype; pass jnp.float32 for logit/score heads that feed
    softmax)."""
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=jnp.float32) + params["b"]
    return y.astype(out_dtype or x.dtype)


def embedding_init(rng, vocab_size: int, embed_size: int) -> dict:
    # Row 0 is the pad row; lookups mask it to zero regardless, but keep the
    # stored row zero too so optimizer updates on it are harmless.
    table = uniform(rng, (vocab_size, embed_size))
    return {"table": table.at[0].set(0.0)}


def embed(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """Zero-masked lookup (reference: nn.LookupTableMaskZero semantics —
    pad token 0 embeds to the zero vector)."""
    vecs = jnp.take(params["table"], tokens, axis=0)
    return vecs * (tokens != 0)[..., None].astype(vecs.dtype)


def dropout(rng, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)

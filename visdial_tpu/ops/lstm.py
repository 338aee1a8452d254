"""Masked multi-layer LSTM over time — the workhorse recurrence.

Replaces the reference's Element-Research rnn `SeqLSTM` + `MaskZero` stack
(reference: encoders/*.lua, decoders/*.lua all build 2-layer zero-masked
LSTMs).  Mask semantics (SURVEY.md hard part #2, documented decision):

    at a padded timestep the cell state and hidden state CARRY THROUGH
    unchanged (h_t, c_t) = (h_{t-1}, c_{t-1}).

With right-aligned inputs and zero initial state this is exactly equivalent
to Torch's MaskZero (state is zero through the leading pads), and for
left-aligned trailing pads it keeps the last real state, so "final state"
always means "state after the last real token" regardless of alignment.

Two implementations behind one interface:
  * impl='xla'    — jax.lax.scan over time (reference twin; runs anywhere)
  * impl='pallas' — fused TPU kernel, weights resident in VMEM, time loop
                    inside the kernel (ops/lstm_pallas.py)
Gate order is i, f, g, o (packed in that order along the 4H axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INIT_SCALE = 0.08


def uniform(rng, shape, scale: float = INIT_SCALE, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=-scale, maxval=scale)


def lstm_init(rng, input_size: int, hidden_size: int, num_layers: int) -> dict:
    """Per layer: W (in+H, 4H) packing [x; h] -> gates, b (4H,).

    Forget-gate bias initialized to 1.0 (documented departure from the
    reference's nn defaults; see module docstring of models/core.py).
    """
    layers = []
    for layer in range(num_layers):
        rng, wk = jax.random.split(rng)
        in_dim = input_size if layer == 0 else hidden_size
        w = uniform(wk, (in_dim + hidden_size, 4 * hidden_size))
        b = jnp.zeros((4 * hidden_size,))
        b = b.at[hidden_size : 2 * hidden_size].set(1.0)  # forget gate
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def lstm_cell(w, b, x_t, h_prev, c_prev, mask_t, hidden_size: int):
    """One masked step.  x_t (B,E), h/c (B,H), mask_t (B,) float 0/1."""
    zx = jnp.concatenate([x_t, h_prev], axis=-1)
    gates = jnp.dot(zx, w, preferred_element_type=jnp.float32) + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    m = mask_t[:, None]
    return ((m * h_new + (1 - m) * h_prev).astype(h_prev.dtype),
            (m * c_new + (1 - m) * c_prev).astype(c_prev.dtype))


def masked_lstm(
    params: dict,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    h0: jnp.ndarray | None = None,
    c0: jnp.ndarray | None = None,
    *,
    impl: str = "xla",
    dropout_rng=None,
    dropout_rate: float = 0.0,
):
    """Run the stacked masked LSTM.

    Args:
      params: from lstm_init.
      x: (B, T, E) embedded inputs.
      mask: (B, T) 1.0 where real token, 0.0 where pad.
      h0, c0: optional (num_layers, B, H) initial states (forwardConnect).
      impl: 'xla' or 'pallas'.
      dropout_rng/dropout_rate: inter-layer dropout on layer outputs
        (reference -dropout; applied between stacked layers, not on h->h).

    Returns:
      outputs: (B, T, H) top-layer hidden states (masked steps carry through)
      (h_final, c_final): each (num_layers, B, H)
    """
    if impl == "pallas":
        from .lstm_pallas import masked_lstm_pallas

        return masked_lstm_pallas(
            params, x, mask, h0, c0,
            dropout_rng=dropout_rng, dropout_rate=dropout_rate,
        )

    layers = params["layers"]
    num_layers = len(layers)
    B, T, _ = x.shape
    H = layers[0]["w"].shape[1] // 4
    if h0 is None:
        h0 = jnp.zeros((num_layers, B, H), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((num_layers, B, H), x.dtype)

    mask_f = mask.astype(x.dtype)
    layer_in = x
    h_fin, c_fin = [], []
    for li, lp in enumerate(layers):
        def step(carry, xs):
            h_prev, c_prev = carry
            x_t, m_t = xs
            h_new, c_new = lstm_cell(lp["w"], lp["b"], x_t, h_prev, c_prev, m_t, H)
            return (h_new, c_new), h_new

        (h_T, c_T), outs = jax.lax.scan(
            step,
            (h0[li], c0[li]),
            (jnp.swapaxes(layer_in, 0, 1), jnp.swapaxes(mask_f, 0, 1)),
        )
        outs = jnp.swapaxes(outs, 0, 1)  # (B, T, H)
        h_fin.append(h_T)
        c_fin.append(c_T)
        layer_in = outs
        if li < num_layers - 1 and dropout_rate > 0.0 and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - dropout_rate
            dm = jax.random.bernoulli(sub, keep, layer_in.shape)
            layer_in = jnp.where(dm, layer_in / keep, 0.0)

    return layer_in, (jnp.stack(h_fin), jnp.stack(c_fin))


def last_state(outputs_and_final):
    """Top-layer final hidden state (B, H) from masked_lstm's return."""
    _, (h_final, _) = outputs_and_final
    return h_final[-1]


def lstm_step(params: dict, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One unmasked time step through the stacked LSTM (decode path).

    x_t (B, E); h, c (num_layers, B, H).  Returns (top-layer h, new h, new c).
    Used by the token-by-token generator (reference: generate.lua step loop)
    where every position is a real token, so no mask argument.
    """
    H = params["layers"][0]["w"].shape[1] // 4
    ones = jnp.ones((x_t.shape[0],), x_t.dtype)
    layer_in = x_t
    hs, cs = [], []
    for li, lp in enumerate(params["layers"]):
        h_new, c_new = lstm_cell(lp["w"], lp["b"], layer_in, h[li], c[li],
                                 ones, H)
        hs.append(h_new)
        cs.append(c_new)
        layer_in = h_new
    return layer_in, jnp.stack(hs), jnp.stack(cs)

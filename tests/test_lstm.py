"""Model-math unit tests (SURVEY.md §4 item 2): LSTM cell vs a few-line
numpy reference; mask carry-through semantics; initial-state seeding."""

import jax
import jax.numpy as jnp
import numpy as np

from visdial_tpu.ops.lstm import lstm_init, masked_lstm


def numpy_lstm_reference(w, b, x, mask, h0, c0):
    """Plain numpy masked LSTM, gate order i,f,g,o, carry-through on pad."""
    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    B, T, E = x.shape
    H = w.shape[1] // 4
    h, c = h0.copy(), c0.copy()
    outs = np.zeros((B, T, H))
    for t in range(T):
        zx = np.concatenate([x[:, t], h], axis=-1)
        g = zx @ w + b
        i_, f_, g_, o_ = g[:, :H], g[:, H:2*H], g[:, 2*H:3*H], g[:, 3*H:]
        i_, f_, o_ = sigmoid(i_), sigmoid(f_), sigmoid(o_)
        g_ = np.tanh(g_)
        c_new = f_ * c + i_ * g_
        h_new = o_ * np.tanh(c_new)
        m = mask[:, t][:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        outs[:, t] = h
    return outs, h, c


def test_single_layer_matches_numpy():
    rng = jax.random.PRNGKey(0)
    B, T, E, H = 3, 5, 4, 6
    params = lstm_init(rng, E, H, num_layers=1)
    x = np.random.default_rng(0).standard_normal((B, T, E)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[0, 3:] = 0  # trailing pads
    mask[1, :2] = 0  # leading pads
    outs, (hf, cf) = masked_lstm(params, jnp.array(x), jnp.array(mask))
    w = np.asarray(params["layers"][0]["w"])
    b = np.asarray(params["layers"][0]["b"])
    ref_outs, ref_h, ref_c = numpy_lstm_reference(
        w, b, x, mask, np.zeros((B, H)), np.zeros((B, H)))
    np.testing.assert_allclose(np.asarray(outs), ref_outs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf[0]), ref_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf[0]), ref_c, atol=1e-5)


def test_mask_carry_through_equals_right_aligned_zero_init():
    """Right-aligned input with zero init == running only the real tokens."""
    rng = jax.random.PRNGKey(1)
    B, T, E, H = 2, 6, 4, 5
    params = lstm_init(rng, E, H, num_layers=2)
    real = np.random.default_rng(1).standard_normal((B, 3, E)).astype(np.float32)
    # right-aligned: 3 leading pads
    x_pad = np.concatenate([np.zeros((B, 3, E), np.float32), real], axis=1)
    mask_pad = np.concatenate([np.zeros((B, 3)), np.ones((B, 3))], axis=1)
    _, (h_pad, c_pad) = masked_lstm(params, jnp.array(x_pad), jnp.array(mask_pad))
    _, (h_raw, c_raw) = masked_lstm(
        params, jnp.array(real), jnp.ones((B, 3)))
    np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h_raw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pad), np.asarray(c_raw), atol=1e-6)


def test_trailing_pads_keep_final_state():
    """Left-aligned with trailing pads: final state = state at last real token."""
    rng = jax.random.PRNGKey(2)
    B, E, H = 2, 4, 5
    params = lstm_init(rng, E, H, num_layers=1)
    real = np.random.default_rng(2).standard_normal((B, 4, E)).astype(np.float32)
    x_pad = np.concatenate([real, np.zeros((B, 2, E), np.float32)], axis=1)
    mask = np.concatenate([np.ones((B, 4)), np.zeros((B, 2))], axis=1)
    _, (h_pad, _) = masked_lstm(params, jnp.array(x_pad), jnp.array(mask))
    _, (h_raw, _) = masked_lstm(params, jnp.array(real), jnp.ones((B, 4)))
    np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h_raw), atol=1e-6)


def test_initial_state_seeding():
    """forwardConnect-style h0/c0 actually seeds the recurrence."""
    rng = jax.random.PRNGKey(3)
    B, T, E, H, L = 2, 3, 4, 5, 2
    params = lstm_init(rng, E, H, num_layers=L)
    x = jnp.zeros((B, T, E))
    mask = jnp.ones((B, T))
    h0 = jnp.ones((L, B, H)) * 0.3
    c0 = jnp.ones((L, B, H)) * -0.2
    _, (hf_seeded, _) = masked_lstm(params, x, mask, h0, c0)
    _, (hf_zero, _) = masked_lstm(params, x, mask)
    assert not np.allclose(np.asarray(hf_seeded), np.asarray(hf_zero))


def test_gradients_flow():
    rng = jax.random.PRNGKey(4)
    params = lstm_init(rng, 4, 5, num_layers=2)
    x = jnp.ones((2, 3, 4))
    mask = jnp.ones((2, 3))

    def loss(p):
        _, (h, _) = masked_lstm(p, x, mask)
        return jnp.sum(h ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert total > 0

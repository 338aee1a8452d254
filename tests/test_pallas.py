"""Pallas fused kernels vs their pure-JAX twins (SURVEY.md §4 item 2:
every Pallas kernel must match its lax.scan/einsum reference).

On CPU the kernels run in interpreter mode automatically, so these tests
validate kernel logic everywhere; the compiled path is exercised on real
TPU by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visdial_tpu.ops.attention import masked_slot_attention
from visdial_tpu.ops.lstm import lstm_init, masked_lstm

from conftest import small_config


def _right_aligned_mask(lengths, T):
    lengths = np.asarray(lengths)
    return jnp.asarray(
        (np.arange(T)[None, :] >= (T - lengths)[:, None]).astype(np.float32))


@pytest.fixture(scope="module")
def lstm_setup():
    params = lstm_init(jax.random.PRNGKey(0), 20, 24, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 7, 20))
    mask = _right_aligned_mask([7, 3, 1, 5, 7, 2], 7)
    return params, x, mask


def test_lstm_pallas_matches_xla(lstm_setup):
    params, x, mask = lstm_setup
    out_x, (h_x, c_x) = masked_lstm(params, x, mask, impl="xla")
    out_p, (h_p, c_p) = masked_lstm(params, x, mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_x), np.asarray(h_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_x), np.asarray(c_p), atol=1e-5)


def test_lstm_pallas_initial_state(lstm_setup):
    """forwardConnect path: non-zero (h0, c0) must round through the kernel."""
    params, x, mask = lstm_setup
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 24))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 24))
    _, (h_x, c_x) = masked_lstm(params, x, mask, h0, c0, impl="xla")
    _, (h_p, c_p) = masked_lstm(params, x, mask, h0, c0, impl="pallas")
    np.testing.assert_allclose(np.asarray(h_x), np.asarray(h_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_x), np.asarray(c_p), atol=1e-5)


def test_lstm_pallas_carry_through_all_pad(lstm_setup):
    """A fully-padded row must return its initial state unchanged."""
    params, x, _ = lstm_setup
    mask = jnp.zeros((6, 7))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 24))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 24))
    _, (h_p, c_p) = masked_lstm(params, x, mask, h0, c0, impl="pallas")
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c0), atol=1e-6)


def test_lstm_pallas_grads_match(lstm_setup):
    params, x, mask = lstm_setup

    def loss(p, impl):
        o, (h, _) = masked_lstm(p, x, mask, impl=impl)
        return jnp.sum(o ** 2) + jnp.sum(h ** 2)

    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_lstm_pallas_tile_bounds_skip_exactly(lstm_setup):
    """When a whole tile's rows are shorter than T, the kernel skips the
    out-of-span grid steps (per-tile bounds).  Values AND grads — including
    nonzero cotangents at pad positions, which must still flow through the
    carried state — must match the lax.scan twin exactly."""
    params, x, _ = lstm_setup
    import visdial_tpu.ops.lstm_pallas as lp

    # every row short: right-aligned span (T-3, T); also a left-aligned
    # span (0, 2) case and an all-pad row
    for mask_np in (
        _right_aligned_mask([3, 1, 2, 3, 0, 2], 7),
        jnp.asarray(np.array([[1, 1, 0, 0, 0, 0, 0]] * 6, np.float32)),
    ):
        def loss(p, impl):
            o, (h, c) = masked_lstm(p, x, mask_np, impl=impl)
            return (jnp.sum(o ** 2) + jnp.sum(h ** 2) + jnp.sum(c ** 2))

        v_x, g_x = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
        old = lp.FORCE_BWD_KERNEL
        lp.FORCE_BWD_KERNEL = True
        try:
            v_p, g_p = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
        finally:
            lp.FORCE_BWD_KERNEL = old
        np.testing.assert_allclose(np.asarray(v_x), np.asarray(v_p),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_lstm_pallas_fuzz_twin_multi_tile():
    """Seeded sweep of value+grad twin equivalence over shapes the fixed
    tests never hit: MULTI-TILE grids (tile forced small so several batch
    tiles run per call, exercising per-tile bounds, span-clamped fetches,
    and the divisor/round-up paths of _pick_tile), tiles whose rows are
    ALL pad, length-sorted and unsorted rows, T=1, and odd E/H.  Interpret
    mode on CPU, deterministic seeds."""
    import visdial_tpu.ops.lstm_pallas as lp

    rng = np.random.default_rng(7)
    # (N, T, E, H, forced_tile, lengths)
    cases = [
        (32, 9, 12, 16, 8, rng.integers(0, 10, 32)),      # 4 tiles, mixed
        (24, 5, 7, 8, 8, np.sort(rng.integers(1, 3, 24))[::-1]),  # short
        (40, 4, 9, 24, 8, np.full(40, 4)),                # no pads at all
        (8, 1, 4, 8, None, rng.integers(0, 2, 8)),        # T=1 edge
        (32, 7, 10, 8, 8, np.r_[rng.integers(1, 8, 8),    # tile 2 of 4 is
                                np.zeros(8, int),         # ALL-pad rows
                                rng.integers(1, 8, 16)]),
    ]
    for N, T, E, H, tile, lengths in cases:
        params = lstm_init(jax.random.PRNGKey(N + T), E, H, 2)
        x = jax.random.normal(jax.random.PRNGKey(N * T), (N, T, E))
        mask = _right_aligned_mask(np.asarray(lengths), T)
        h0 = jax.random.normal(jax.random.PRNGKey(E), (2, N, H))
        c0 = jax.random.normal(jax.random.PRNGKey(H), (2, N, H))

        def loss(p, impl):
            o, (h, c) = masked_lstm(p, x, mask, h0, c0, impl=impl)
            return jnp.sum(o ** 2) + jnp.sum(h ** 2) + jnp.sum(c ** 2)

        v_x, g_x = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
        orig_tile, orig_force = lp._pick_tile, lp.FORCE_BWD_KERNEL
        if tile is not None:
            lp._pick_tile = lambda *a, **k: tile
        lp.FORCE_BWD_KERNEL = True
        try:
            v_p, g_p = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
        finally:
            lp._pick_tile, lp.FORCE_BWD_KERNEL = orig_tile, orig_force
        err = f"case N={N} T={T} E={E} H={H} tile={tile}"
        np.testing.assert_allclose(np.asarray(v_x), np.asarray(v_p),
                                   rtol=2e-5, err_msg=err)
        for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, err_msg=err)


def test_attention_pallas_matches_xla():
    q = jax.random.normal(jax.random.PRNGKey(2), (6, 4, 16))
    s = jax.random.normal(jax.random.PRNGKey(3), (6, 4, 16))
    valid = jnp.broadcast_to(jnp.tril(jnp.ones((4, 4)))[None], (6, 4, 4))
    a_x = masked_slot_attention(q, s, valid, impl="xla")
    a_p = masked_slot_attention(q, s, valid, impl="pallas")
    np.testing.assert_allclose(np.asarray(a_x), np.asarray(a_p), atol=1e-5)

    def loss(q, impl):
        return jnp.sum(masked_slot_attention(q, s, valid, impl=impl) ** 2)

    g_x = jax.grad(lambda q: loss(q, "xla"))(q)
    g_p = jax.grad(lambda q: loss(q, "pallas"))(q)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p), atol=1e-5)


def test_attention_pallas_spatial_49_slots():
    """Pin the fused attention kernel on the img_spatial operating shape:
    R=10 question queries over S=49 pool5 locations (rectangular, all
    valid, lane-unaligned slot count) at the production H=512 — the shape
    `bench.py --img_spatial` runs on the chip (PARITY row 29)."""
    B, R, S, H = 6, 10, 49, 512
    q = jax.random.normal(jax.random.PRNGKey(4), (B, R, H))
    s = jax.random.normal(jax.random.PRNGKey(5), (B, S, H))
    valid = jnp.ones((B, R, S))
    a_x = masked_slot_attention(q, s, valid, impl="xla")
    a_p = masked_slot_attention(q, s, valid, impl="pallas")
    np.testing.assert_allclose(np.asarray(a_x), np.asarray(a_p),
                               atol=2e-5, rtol=1e-5)

    def loss(q, impl):
        return jnp.sum(masked_slot_attention(q, s, valid, impl=impl) ** 2)

    g_x = jax.grad(lambda q: loss(q, "xla"))(q)
    g_p = jax.grad(lambda q: loss(q, "pallas"))(q)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p),
                               atol=2e-4, rtol=1e-4)


def test_model_scores_pallas_twin(tiny_data):
    """Full model candidate scoring agrees across impls (MN encoder hits
    both the LSTM and attention kernels)."""
    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.models.model import model_init, model_scores

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="mn-ques-im-hist", decoder="disc")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4))).as_dict()
    s_x = model_scores(params, batch, cfg, impl="xla")
    s_p = model_scores(params, batch, cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p), atol=2e-4)


def test_fused_backward_kernel_matches_autodiff(lstm_setup):
    """The fused Pallas backward (dgp kernel + XLA dW matmuls) must match
    XLA autodiff of the reference recurrence, including masked rows and
    non-zero initial states."""
    import visdial_tpu.ops.lstm_pallas as lp

    params, x, mask = lstm_setup
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 24))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 24))

    def loss(p, impl):
        o, (h, c) = masked_lstm(p, x, mask, h0, c0, impl=impl)
        return jnp.sum(o ** 2) + jnp.sum(h ** 2) + jnp.sum(c ** 2)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    old = lp.FORCE_BWD_KERNEL
    lp.FORCE_BWD_KERNEL = True
    try:
        g_ker = jax.grad(lambda p: loss(p, "pallas"))(params)
    finally:
        lp.FORCE_BWD_KERNEL = old
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_attention_fusion_tail_matches_unfused(tiny_data):
    """attention_fusion_pallas == attention -> concat -> linear -> tanh
    (the fused MN/HREA inference tail)."""
    from visdial_tpu.ops.attention_pallas import attention_fusion_pallas
    from visdial_tpu.models.core import linear, linear_init

    H = 16
    q = jax.random.normal(jax.random.PRNGKey(2), (6, 4, H))
    s = jax.random.normal(jax.random.PRNGKey(3), (6, 4, H))
    valid = jnp.broadcast_to(jnp.tril(jnp.ones((4, 4)))[None], (6, 4, 4))
    fusion = linear_init(jax.random.PRNGKey(4), 2 * H, H)

    mem = masked_slot_attention(q, s, valid, impl="xla")
    cat = jnp.concatenate([q.reshape(-1, H), mem.reshape(-1, H)], axis=-1)
    ref = jnp.tanh(linear(fusion, cat)).reshape(6, 4, H)

    fused = attention_fusion_pallas(q, s, valid, fusion["w"], fusion["b"])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=1e-5)


def test_encoder_eval_fused_tail_matches(tiny_data):
    """encoder_apply's fused inference tail == the unfused train-graph math
    for MN and HREA."""
    from visdial_tpu.models.encoders import encoder_apply, encoder_init

    split, vocab, cfg0 = tiny_data
    from visdial_tpu.data.loader import EvalLoader

    for enc in ("mn-ques-im-hist", "hrea-ques-im-hist"):
        cfg = cfg0.replace(encoder=enc, decoder="disc")
        from visdial_tpu.models.core import embedding_init

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        emb = embedding_init(k1, cfg.vocab_size, cfg.embed_size)
        enc_p = encoder_init(k2, cfg)
        batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4))).as_dict()
        j_xla = encoder_apply(enc_p, emb, batch, cfg, train=False, impl="xla")
        j_pal = encoder_apply(enc_p, emb, batch, cfg, train=False, impl="pallas")
        np.testing.assert_allclose(np.asarray(j_xla), np.asarray(j_pal),
                                   atol=2e-4, err_msg=enc)


def test_lm_score_kernel_matches_ref():
    """Online-logsumexp LM scoring == materialized log_softmax gather."""
    from visdial_tpu.ops.lm_score_pallas import lm_token_logprobs_pallas

    H, V, NT = 16, 37, 29
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (NT, H))
    w = jax.random.normal(jax.random.PRNGKey(1), (H, V))
    b = jax.random.normal(jax.random.PRNGKey(2), (V,)) * 0.1
    tgt = jax.random.randint(jax.random.PRNGKey(3), (NT,), 0, V)

    logits = x @ w + b
    ref = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                              tgt[:, None], axis=-1)[:, 0]
    got = lm_token_logprobs_pallas(x, w, b, tgt)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_attention_pallas_fuzz_shapes():
    """Seeded sweep of the fused attention kernel over query/slot counts
    the fixed tests never hit (single query round, R != S rectangles,
    ragged random masks) — value + grad vs the XLA twin.  Every query row
    keeps >= 1 valid slot (the production invariant: round r always sees
    slot 0)."""
    rng = np.random.default_rng(11)
    for B, R, S, H in [(5, 4, 4, 16), (2, 10, 10, 64), (4, 1, 7, 32),
                       (3, 6, 11, 40)]:
        q = jax.random.normal(jax.random.PRNGKey(B * R), (B, R, H))
        s = jax.random.normal(jax.random.PRNGKey(S), (B, S, H))
        v = rng.integers(0, 2, (B, R, S)).astype(np.float32)
        v[..., 0] = 1.0                      # >=1 valid slot per query
        valid = jnp.asarray(v)
        err = f"case B={B} R={R} S={S} H={H}"
        a_x = masked_slot_attention(q, s, valid, impl="xla")
        a_p = masked_slot_attention(q, s, valid, impl="pallas")
        np.testing.assert_allclose(np.asarray(a_x), np.asarray(a_p),
                                   atol=2e-5, err_msg=err)

        def loss(q, impl):
            return jnp.sum(masked_slot_attention(q, s, valid, impl=impl)**2)

        g_x = jax.grad(lambda q: loss(q, "xla"))(q)
        g_p = jax.grad(lambda q: loss(q, "pallas"))(q)
        np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p),
                                   atol=2e-4, err_msg=err)


def test_lm_score_kernel_fuzz_shapes():
    """Seeded sweep of the online-logsumexp scorer over row/vocab counts
    around the kernel's tiling boundaries (vocab smaller than one tile,
    just past a tile edge, single row)."""
    from visdial_tpu.ops.lm_score_pallas import lm_token_logprobs_pallas

    for NT, H, V in [(1, 8, 11), (17, 16, 130), (64, 32, 513),
                     (29, 24, 1024)]:
        x = jax.random.normal(jax.random.PRNGKey(NT), (NT, H))
        w = jax.random.normal(jax.random.PRNGKey(H), (H, V))
        b = jax.random.normal(jax.random.PRNGKey(V), (V,)) * 0.1
        tgt = jax.random.randint(jax.random.PRNGKey(3), (NT,), 0, V)
        logits = x @ w + b
        ref = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                  tgt[:, None], axis=-1)[:, 0]
        got = lm_token_logprobs_pallas(x, w, b, tgt)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-5,
                                   err_msg=f"NT={NT} H={H} V={V}")


def test_masked_nll_fused_value_and_grads():
    """Fused LM-head training loss (online-logsumexp fwd + tile-softmax
    d-logits bwd) == materialized-logits twin, values and all grads."""
    from visdial_tpu.ops.lm_loss import masked_nll_fused, masked_nll_ref

    N, T, H, V = 5, 4, 16, 37
    k = jax.random.PRNGKey(0)
    outs = jax.random.normal(k, (N, T, H))
    w = jax.random.normal(jax.random.PRNGKey(1), (H, V)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (V,)) * 0.1
    tgt = jax.random.randint(jax.random.PRNGKey(3), (N, T), 0, V)
    tgt = tgt.at[1].set(0)          # fully-ignored row
    tgt = tgt.at[0, 2:].set(0)      # trailing pad

    ref_v, ref_g = jax.value_and_grad(masked_nll_ref, argnums=(0, 1, 2))(
        outs, w, b, tgt)
    fus_v, fus_g = jax.value_and_grad(masked_nll_fused, argnums=(0, 1, 2))(
        outs, w, b, tgt)
    np.testing.assert_allclose(np.asarray(ref_v), np.asarray(fus_v),
                               atol=1e-5)
    for a, b_ in zip(ref_g, fus_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_masked_nll_fused_bf16_grads():
    """bf16 fast-path variant: the fused backward rounds d-logits to the
    compute dtype before the dW/dx matmuls (ops/lm_loss.py), while the
    twin's autodiff keeps them f32.  Bound that rounding: with bf16 hidden
    states the two must agree to bf16-level tolerance (advisor finding,
    round 3 — the f32 tests cannot see this cast)."""
    from visdial_tpu.ops.lm_loss import masked_nll_fused, masked_nll_ref

    N, T, H, V = 6, 5, 32, 53
    outs = (jax.random.normal(jax.random.PRNGKey(0), (N, T, H))
            .astype(jnp.bfloat16))
    w = jax.random.normal(jax.random.PRNGKey(1), (H, V)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (V,)) * 0.1
    tgt = jax.random.randint(jax.random.PRNGKey(3), (N, T), 0, V)
    tgt = tgt.at[0, 2:].set(0)      # trailing pad

    ref_v, ref_g = jax.value_and_grad(masked_nll_ref, argnums=(0, 1, 2))(
        outs, w, b, tgt)
    fus_v, fus_g = jax.value_and_grad(masked_nll_fused, argnums=(0, 1, 2))(
        outs, w, b, tgt)
    np.testing.assert_allclose(np.asarray(ref_v), np.asarray(fus_v),
                               rtol=2e-3)
    # d-outs compares in bf16 (one rounding each side); dW/db accumulate
    # over N*T bf16 d-logit terms — allow bf16-eps-scaled slack.
    for a, b_, tol in zip(ref_g, fus_g, (3e-2, 2e-2, 2e-2)):
        a, b_ = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        scale = np.maximum(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b_, a, atol=tol * scale)


def test_gen_loss_pallas_twin(tiny_data):
    """gen_loss value+grads agree across impls (eval-mode: no dropout —
    the pallas impl routes through the fused LM-head loss)."""
    from visdial_tpu.data.loader import TrainLoader
    from visdial_tpu.models.model import model_init, model_loss

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="lf-ques-im", decoder="gen")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = next(TrainLoader(split, vocab, cfg).epoch(seed=0)).as_dict()

    def loss(p, impl):
        return model_loss(p, batch, cfg, train=False, impl=impl)

    v_x, g_x = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    v_p, g_p = jax.value_and_grad(lambda p: loss(p, "pallas"))(params)
    np.testing.assert_allclose(np.asarray(v_x), np.asarray(v_p), atol=2e-5)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_length_sorted_candidate_paths_match(tiny_data):
    """The length-sorted candidate fast path (sort -> LSTM with per-tile
    bounds -> inverse scatter) must match the unsorted XLA twin exactly,
    for both disc option embeddings and gen candidate scores."""
    import visdial_tpu.models.decoders as dec
    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.models.model import model_init, model_scores

    split, vocab, cfg0 = tiny_data
    old = dec.LENGTH_SORT_MIN_ROWS
    dec.LENGTH_SORT_MIN_ROWS = 1       # force sorting at tiny shapes
    try:
        for decoder in ("disc", "gen"):
            cfg = cfg0.replace(encoder="lf-ques-im", decoder=decoder)
            params = model_init(jax.random.PRNGKey(0), cfg)
            batch = next(iter(EvalLoader(split, vocab, cfg,
                                         batch_size=4))).as_dict()
            s_x = model_scores(params, batch, cfg, impl="xla")
            s_p = model_scores(params, batch, cfg, impl="pallas")
            np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p),
                                       atol=2e-4, err_msg=decoder)
    finally:
        dec.LENGTH_SORT_MIN_ROWS = old


def test_gen_candidate_scores_pallas_twin(tiny_data):
    """gen candidate scoring: fused kernel path == chunked XLA path."""
    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.models.model import model_init, model_scores

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="lf-ques-im", decoder="gen")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4))).as_dict()
    s_x = model_scores(params, batch, cfg, impl="xla")
    s_p = model_scores(params, batch, cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p), atol=2e-4)


def test_attention_fusion_grads_match():
    """Grad equivalence for the fused MN/HREA tail's custom VJP (CLAUDE.md
    convention: every Pallas kernel is value- AND grad-tested)."""
    from visdial_tpu.ops.attention_pallas import attention_fusion_pallas
    from visdial_tpu.models.core import linear, linear_init

    H = 16
    q = jax.random.normal(jax.random.PRNGKey(2), (6, 4, H))
    s = jax.random.normal(jax.random.PRNGKey(3), (6, 4, H))
    valid = jnp.broadcast_to(jnp.tril(jnp.ones((4, 4)))[None], (6, 4, 4))
    fusion = linear_init(jax.random.PRNGKey(4), 2 * H, H)

    def ref_loss(q, s, w, b):
        mem = masked_slot_attention(q, s, valid, impl="xla")
        cat = jnp.concatenate([q.reshape(-1, H), mem.reshape(-1, H)], -1)
        return jnp.sum(jnp.tanh(linear({"w": w, "b": b}, cat)) ** 2)

    def fused_loss(q, s, w, b):
        return jnp.sum(attention_fusion_pallas(q, s, valid, w, b) ** 2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(
        q, s, fusion["w"], fusion["b"])
    g_fus = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(
        q, s, fusion["w"], fusion["b"])
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

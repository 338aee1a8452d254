"""Encoder/decoder wiring tests: all 9 encoder variants x 2 decoders build,
produce finite losses and correctly-shaped candidate scores; attention
masking respects the causal slot structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visdial_tpu.config import ENCODERS
from visdial_tpu.data.loader import BatchAssembler
from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.models.model import model_init, model_loss, model_scores
from visdial_tpu.ops.attention import masked_slot_attention
from tests.conftest import encoder_params, small_config


def _batch_for(cfg, n=4, seed=0):
    split, vocab = make_synthetic_split(cfg, num_dialogs=n, seed=seed)
    cfg = cfg.replace(vocab_size=vocab.size)
    asm = BatchAssembler(split, vocab, cfg)
    b = asm.assemble(np.arange(n), with_options=True,
                     with_gen_options=cfg.decoder == "gen")
    return {k: jnp.asarray(v) for k, v in b.as_dict().items()}, cfg


@pytest.mark.parametrize("encoder", encoder_params(ENCODERS))
@pytest.mark.parametrize("decoder", ["disc", "gen"])
def test_all_variants_build_and_score(encoder, decoder):
    cfg = small_config(encoder=encoder, decoder=decoder)
    batch, cfg = _batch_for(cfg)
    params = model_init(jax.random.PRNGKey(0), cfg)
    loss = model_loss(params, batch, cfg, train=True,
                      rng=jax.random.PRNGKey(1), impl="xla")
    assert np.isfinite(float(loss))
    scores = model_scores(params, batch, cfg, impl="xla")
    assert scores.shape == (4, cfg.num_rounds, cfg.num_options)
    assert np.isfinite(np.asarray(scores)).all()


def test_attention_mask_excludes_future_slots():
    B, R, H = 2, 4, 8
    rng = np.random.default_rng(0)
    query = jnp.asarray(rng.standard_normal((B, R, H)), jnp.float32)
    slots = jnp.asarray(rng.standard_normal((B, R, H)), jnp.float32)
    slot = np.arange(R)
    valid = jnp.asarray((slot[None, :] <= slot[:, None])[None].repeat(B, 0),
                        jnp.float32)
    out = masked_slot_attention(query, slots, valid)
    # round 0 sees only slot 0 -> output == slots[:, 0]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(slots[:, 0]),
                               atol=1e-5)
    # changing a future slot must not change earlier rounds
    slots2 = slots.at[:, 3].set(100.0)
    out2 = masked_slot_attention(query, slots2, valid)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(out2[:, :3]),
                               atol=1e-5)


def test_attention_rows_sum_to_one_under_mask():
    """Indirect check: with identical slots, output equals that slot value
    regardless of how many slots are valid (weights sum to 1)."""
    B, R, H = 1, 3, 4
    query = jnp.ones((B, R, H))
    slots = jnp.ones((B, R, H)) * 0.7
    slot = np.arange(R)
    valid = jnp.asarray((slot[None, :] <= slot[:, None])[None], jnp.float32)
    out = masked_slot_attention(query, slots, valid)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_disc_scores_are_dot_products():
    """disc scorer == plain dot product of option embedding and joint."""
    from visdial_tpu.models.decoders import disc_option_embeddings, disc_scores

    cfg = small_config(encoder="lf-ques", decoder="disc")
    batch, cfg = _batch_for(cfg)
    params = model_init(jax.random.PRNGKey(0), cfg)
    N = 4 * cfg.num_rounds
    opt = batch["opt"].reshape(N, cfg.num_options, -1)
    joint = jnp.ones((N, cfg.rnn_hidden_size))
    emb = disc_option_embeddings(params["decoder"], params["embed"], opt, cfg)
    scores = disc_scores(params["decoder"], params["embed"], joint, opt, cfg)
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(emb.sum(-1)), atol=1e-4)


def test_gen_candidate_score_is_logprob_sum():
    """Scoring the gold answer as a candidate == -token_count * NLL of it."""
    from visdial_tpu.models.decoders import gen_candidate_scores, gen_logits

    cfg = small_config(encoder="lf-ques", decoder="gen")
    batch, cfg = _batch_for(cfg)
    params = model_init(jax.random.PRNGKey(0), cfg)
    N = 4 * cfg.num_rounds
    joint = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, cfg.rnn_hidden_size)),
        jnp.float32)
    opt_in = batch["opt_in"].reshape(N, cfg.num_options, -1)
    opt_out = batch["opt_out"].reshape(N, cfg.num_options, -1)
    scores = gen_candidate_scores(params["decoder"], params["embed"], joint,
                                  opt_in, opt_out, cfg)
    assert scores.shape == (N, cfg.num_options)
    # manual recompute for candidate 0 of row 0
    logits = gen_logits(params["decoder"], params["embed"], joint[:1],
                        opt_in[:1, 0], cfg)
    logp = jax.nn.log_softmax(logits, -1)
    tgt = opt_out[0, 0]
    manual = sum(
        float(logp[0, t, int(tgt[t])]) for t in range(tgt.shape[0])
        if int(tgt[t]) != 0)
    np.testing.assert_allclose(float(scores[0, 0]), manual, atol=1e-4)


def test_variants_differ():
    """Image/history inputs actually influence the LF joint embedding."""
    from visdial_tpu.models.encoders import encoder_apply

    cfg = small_config(encoder="lf-ques-im-hist", decoder="disc")
    batch, cfg = _batch_for(cfg)
    params = model_init(jax.random.PRNGKey(0), cfg)
    j1 = encoder_apply(params["encoder"], params["embed"], batch, cfg)
    batch2 = dict(batch)
    batch2["img"] = batch["img"] + 1.0
    j2 = encoder_apply(params["encoder"], params["embed"], batch2, cfg)
    assert not np.allclose(np.asarray(j1), np.asarray(j2))


def test_gen_decode_shapes_and_determinism(tiny_data):
    """Token-by-token decoding (generate.lua equivalent): greedy decode is
    deterministic, emits int32 tokens with pad-after-end semantics."""
    import jax
    import numpy as np

    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.data.synthetic import synthetic_vocab
    from visdial_tpu.models.model import model_generate, model_init

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="lf-ques-im-hist", decoder="gen")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4))).as_dict()

    toks1, logp1 = model_generate(params, batch, cfg, start_token=vocab.start,
                                  end_token=vocab.end, greedy=True)
    toks2, _ = model_generate(params, batch, cfg, start_token=vocab.start,
                              end_token=vocab.end, greedy=True)
    assert toks1.shape == (4, cfg.num_rounds, cfg.max_ans_len)
    assert logp1.shape == (4, cfg.num_rounds)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    t = np.asarray(toks1)
    assert t.dtype == np.int32
    # pad-after-end: once a row emits 0, everything after is 0
    flat = t.reshape(-1, cfg.max_ans_len)
    for row in flat:
        if (row == 0).any():
            first0 = int(np.argmax(row == 0))
            assert (row[first0:] == 0).all()
    assert np.all(np.asarray(logp1) <= 0.0)

    # sampling path runs and respects the rng
    toks3, _ = model_generate(params, batch, cfg, start_token=vocab.start,
                              end_token=vocab.end, greedy=False,
                              rng=jax.random.PRNGKey(1), temperature=0.9)
    assert toks3.shape == toks1.shape


def test_beam_search_decode(tiny_data):
    """Beam search (generate.lua -beamSize equivalent): the best beam's
    log-prob must be >= the greedy sequence's, and outputs keep
    pad-after-end semantics."""
    import jax
    import numpy as np

    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.models.model import model_generate, model_init

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="lf-ques-im-hist", decoder="gen")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4))).as_dict()

    toks_g, logp_g = model_generate(params, batch, cfg,
                                    start_token=vocab.start,
                                    end_token=vocab.end, greedy=True)
    toks_b, logp_b = model_generate(params, batch, cfg,
                                    start_token=vocab.start,
                                    end_token=vocab.end, beam_size=4)
    assert toks_b.shape == toks_g.shape
    # a width-4 beam can only improve on greedy (greedy is a beam of 1)
    assert np.all(np.asarray(logp_b) >= np.asarray(logp_g) - 1e-4), (
        np.asarray(logp_b) - np.asarray(logp_g))
    t = np.asarray(toks_b).reshape(-1, cfg.max_ans_len)
    for row in t:
        if (row == 0).any():
            first0 = int(np.argmax(row == 0))
            assert (row[first0:] == 0).all()


def test_img_spatial_pathway_matches_manual():
    """img_spatial (beyond-reference conv5 pathway): the question-queried
    spatial attention over projected pool5 locations == a manual
    numpy softmax loop."""
    from visdial_tpu.models.encoders import _image_pathway
    from visdial_tpu.models.core import linear_init

    B, R, S, C, H = 2, 3, 4, 6, 5
    cfg = small_config(encoder="lf-ques-im").replace(
        img_spatial=True, img_spatial_slots=S, img_spatial_channels=C,
        img_feat_size=S * C, rnn_hidden_size=H)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, S * C)).astype(np.float32)
    q = rng.standard_normal((B * R, H)).astype(np.float32)
    params = {"img_proj": linear_init(jax.random.PRNGKey(0), C, H)}

    got = np.asarray(_image_pathway(params, {"img": jnp.asarray(img)},
                                    jnp.asarray(q), cfg, B, R, "xla"))
    w, b = np.asarray(params["img_proj"]["w"]), np.asarray(params["img_proj"]["b"])
    loc_h = img.reshape(B, S, C) @ w + b                      # (B, S, H)
    for bi in range(B):
        for r in range(R):
            logits = loc_h[bi] @ q[bi * R + r]
            att = np.exp(logits - logits.max())
            att /= att.sum()
            np.testing.assert_allclose(got[bi * R + r], att @ loc_h[bi],
                                       atol=1e-5)


@pytest.mark.parametrize("encoder", ["lf-ques-im-hist", "mn-ques-im-hist"])
def test_img_spatial_trains_and_scores(encoder):
    """Spatial variant end-to-end: loss is finite, grads reach img_proj,
    scores have the protocol shape — for both fusion styles (LF concat,
    MN/HRE query fusion)."""
    S, C = 4, 8
    cfg = small_config(encoder=encoder, decoder="disc").replace(
        img_spatial=True, img_spatial_slots=S, img_spatial_channels=C,
        img_feat_size=S * C)
    split, vocab = make_synthetic_split(cfg, num_dialogs=4, seed=5)
    cfg = cfg.replace(vocab_size=vocab.size)
    params = model_init(jax.random.PRNGKey(0), cfg)
    assert params["encoder"]["img_proj"]["w"].shape == (C, cfg.rnn_hidden_size)
    batch = BatchAssembler(split, vocab, cfg).assemble(np.arange(4)).as_dict()
    loss, grads = jax.value_and_grad(model_loss)(params, batch, cfg,
                                                 train=True,
                                                 rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    g_img = np.asarray(grads["encoder"]["img_proj"]["w"])
    assert np.abs(g_img).max() > 0, "no gradient reached the spatial proj"
    scores = model_scores(params, batch, cfg)
    assert scores.shape == (4, cfg.num_rounds, cfg.num_options)


def test_img_spatial_loader_norms_per_location():
    """img_norm + img_spatial: each location's channel vector is unit-L2."""
    from visdial_tpu.data.loader import BatchAssembler as BA

    S, C = 3, 5
    cfg = small_config(encoder="lf-ques-im").replace(
        img_spatial=True, img_spatial_slots=S, img_spatial_channels=C,
        img_feat_size=S * C, img_norm=True, compute_dtype="float32")
    split, vocab = make_synthetic_split(cfg, num_dialogs=3, seed=2)
    cfg = cfg.replace(vocab_size=vocab.size)
    asm = BA(split, vocab, cfg)
    loc = asm.img_feat.reshape(-1, S, C)
    np.testing.assert_allclose(np.linalg.norm(loc, axis=2), 1.0, atol=1e-5)


def test_beam_search_matches_brute_force_oracle():
    """Exact beam-search verification (SURVEY.md §2 #3 generate.lua
    -beamSize [U]): on a tiny vocab/length, a wide-enough beam must return
    the TRUE argmax sequence and score from exhaustive enumeration, and
    the best score must be monotone non-decreasing in beam width.

    Oracle scoring mirrors the documented behavior of record: score(s) =
    sum of token log-probs; a sequence ending before max_len additionally
    pays the better of log p(<END>) / log p(<PAD>) at its stop step (both
    stop a beam); a sequence reaching max_len pays no stop cost.
    """
    from itertools import product

    from visdial_tpu.models.core import embed, embedding_init, linear
    from visdial_tpu.models.decoders import (
        _joint_to_state,
        decoder_init,
        gen_beam_decode,
    )
    from visdial_tpu.ops.lstm import lstm_step

    V, E, H, L, MAX_LEN = 7, 6, 8, 2, 3
    START, END = V - 1, V - 2
    live = [t for t in range(1, V) if t not in (START, END)]   # 4 tokens
    cfg = small_config().replace(vocab_size=V, embed_size=E,
                                 rnn_hidden_size=H, num_layers=L,
                                 decoder="gen", max_ans_len=MAX_LEN)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    emb = embedding_init(k1, V, E)
    dec = decoder_init(k2, cfg)
    joint = jax.random.normal(k3, (2, H))

    def logp_seq(b, seq):
        """(score with stop options, score without stop) for live-token seq."""
        h, c = _joint_to_state(joint[b:b + 1], L)
        tok, total = START, 0.0
        for t in seq:
            x = embed(emb, jnp.array([[tok]]))[:, 0]
            top, h, c = lstm_step(dec["lm_lstm"], x, h, c)
            logp = jax.nn.log_softmax(
                linear(dec["out_proj"], top, out_dtype=jnp.float32))[0]
            total += float(logp[t])
            tok = t
        x = embed(emb, jnp.array([[tok]]))[:, 0]
        top, h, c = lstm_step(dec["lm_lstm"], x, h, c)
        logp = jax.nn.log_softmax(
            linear(dec["out_proj"], top, out_dtype=jnp.float32))[0]
        stop = max(float(logp[END]), float(logp[0]))
        return total + stop, total

    best_score = {}
    best_seq = {}
    for b in range(2):
        cands = []
        for k in range(MAX_LEN + 1):
            for seq in product(live, repeat=k):
                with_stop, without = logp_seq(b, seq)
                cands.append((with_stop if k < MAX_LEN else without, seq))
        score, seq = max(cands)
        best_score[b], best_seq[b] = score, seq

    prev = [-np.inf, -np.inf]
    for W in (1, 2, 4, 16, 128):
        toks, logp = gen_beam_decode(dec, emb, joint, cfg,
                                     start_token=START, end_token=END,
                                     beam_size=W, max_len=MAX_LEN)
        toks, logp = np.asarray(toks), np.asarray(logp)
        for b in range(2):
            assert logp[b] >= prev[b] - 1e-5, f"width {W} regressed row {b}"
            prev[b] = logp[b]
    # widest beam == exhaustive search
    for b in range(2):
        got = tuple(int(t) for t in toks[b] if t != 0)
        assert got == best_seq[b], (W, got, best_seq[b])
        np.testing.assert_allclose(logp[b], best_score[b], atol=1e-4)


def test_disc_table_scoring_matches_direct(tiny_data):
    """The option-table eval fast path must produce exactly the same scores
    as re-encoding all candidates per batch (no dropout at eval, so the
    paths are mathematically identical)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.models.model import (
        model_init,
        model_option_table,
        model_scores,
        model_scores_with_table,
    )

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="mn-ques-im-hist", decoder="disc")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4))).as_dict()

    direct = model_scores(params, batch, cfg, impl="xla")
    table = model_option_table(params, jnp.asarray(split.opt_list), cfg,
                               impl="xla")
    via_table = model_scores_with_table(params, batch, table, cfg, impl="xla")
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_table),
                               atol=1e-5)


@pytest.mark.slow
def test_remat_grads_match(tiny_data):
    """cfg.remat (jax.checkpoint around the encoder) must not change loss
    or gradients — only the memory/compute trade."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visdial_tpu.data.loader import BatchAssembler
    from visdial_tpu.models.model import model_init, model_loss

    split, vocab, cfg = tiny_data
    cfg = cfg.replace(encoder="mn-ques-im-hist", decoder="disc")
    params = model_init(jax.random.PRNGKey(0), cfg)
    batch = BatchAssembler(split, vocab, cfg).assemble(
        np.arange(4)).as_dict()

    def loss(p, c):
        return model_loss(p, batch, c, train=True,
                          rng=jax.random.PRNGKey(1), impl="xla")

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg.replace(remat=True))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lf_incremental_history_matches_per_round(tiny_data):
    """The one-pass LF history (prefix-boundary readout) must equal the
    legacy per-round right-aligned re-encoding exactly (causal LSTM)."""
    import jax
    import numpy as np

    from visdial_tpu.data.loader import BatchAssembler
    from visdial_tpu.models.core import embedding_init
    from visdial_tpu.models.encoders import encoder_apply, encoder_init

    split, vocab, cfg0 = tiny_data
    cfg_inc = cfg0.replace(encoder="lf-ques-im-hist", decoder="disc",
                           lf_hist_incremental=True)
    cfg_old = cfg_inc.replace(lf_hist_incremental=False)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    emb = embedding_init(k1, cfg_inc.vocab_size, cfg_inc.embed_size)
    enc = encoder_init(k2, cfg_inc)
    idx = np.arange(6)
    b_inc = BatchAssembler(split, vocab, cfg_inc).assemble(
        idx, with_options=False).as_dict()
    b_old = BatchAssembler(split, vocab, cfg_old).assemble(
        idx, with_options=False).as_dict()
    assert "hist_flat" in b_inc and "hist_concat" in b_old

    j_inc = encoder_apply(enc, emb, b_inc, cfg_inc, train=False, impl="xla")
    j_old = encoder_apply(enc, emb, b_old, cfg_old, train=False, impl="xla")
    np.testing.assert_allclose(np.asarray(j_inc), np.asarray(j_old),
                               atol=1e-5)

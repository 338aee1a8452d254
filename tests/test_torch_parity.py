"""Cross-framework parity: our masked LSTM vs torch.nn.LSTM.

The reference's recurrence is Element-Research rnn `SeqLSTM` (+ MaskZero),
whose cell math is the standard Torch LSTM — the same equations, gate
order (i, f, g, o) and weight layout that live on in `torch.nn.LSTM`.
With the reference itself unreadable (SURVEY.md §0), PyTorch's LSTM is the
closest executable relative of the reference cell, and this test pins our
implementation against it independently of our own numpy twin
(tests/test_lstm.py), closing the "same-author reference" loophole.

Weight mapping: our per-layer W is ([x; h], 4H) — W[:E].T == weight_ih,
W[E:].T == weight_hh, and our single bias b == bias_ih + bias_hh.

Masking: torch.nn.LSTM has no mask, so the torch side runs each row's
real tokens only; ours runs the right-aligned padded batch.  Equality of
final states and of outputs at real positions verifies both the cell math
and the carry-through-pad semantics in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visdial_tpu.ops.lstm import lstm_init, lstm_step, masked_lstm

torch = pytest.importorskip("torch")


def _to_torch_lstm(params, input_size, hidden_size, num_layers):
    """Build a torch.nn.LSTM carrying exactly our parameters."""
    m = torch.nn.LSTM(input_size, hidden_size, num_layers, batch_first=True)
    with torch.no_grad():
        for li, layer in enumerate(params["layers"]):
            w = np.asarray(layer["w"], np.float64)
            b = np.asarray(layer["b"], np.float64)
            in_dim = input_size if li == 0 else hidden_size
            getattr(m, f"weight_ih_l{li}").copy_(
                torch.from_numpy(w[:in_dim].T.copy()).float())
            getattr(m, f"weight_hh_l{li}").copy_(
                torch.from_numpy(w[in_dim:].T.copy()).float())
            getattr(m, f"bias_ih_l{li}").copy_(torch.from_numpy(b).float())
            getattr(m, f"bias_hh_l{li}").zero_()
    return m.eval()


@pytest.mark.parametrize("num_layers", [1, 2])
def test_masked_lstm_matches_torch(num_layers):
    B, T, E, H = 4, 7, 6, 5
    params = lstm_init(jax.random.PRNGKey(0), E, H, num_layers)
    rng = np.random.default_rng(0)
    lengths = np.array([7, 4, 1, 6])
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    # right-aligned: row i has T - lengths[i] leading pads
    mask = np.zeros((B, T), np.float32)
    for i, L in enumerate(lengths):
        mask[i, T - L:] = 1.0
        x[i, : T - L] = 0.0

    outs, (hf, cf) = masked_lstm(params, jnp.asarray(x), jnp.asarray(mask))
    outs, hf, cf = map(np.asarray, (outs, hf, cf))

    m = _to_torch_lstm(params, E, H, num_layers)
    with torch.no_grad():
        for i, L in enumerate(lengths):
            xi = torch.from_numpy(x[i:i + 1, T - L:])
            oi, (hi, ci) = m(xi)
            np.testing.assert_allclose(
                outs[i, T - L:], oi[0].numpy(), atol=2e-5,
                err_msg=f"row {i} outputs")
            np.testing.assert_allclose(
                hf[:, i], hi[:, 0].numpy(), atol=2e-5,
                err_msg=f"row {i} final h")
            np.testing.assert_allclose(
                cf[:, i], ci[:, 0].numpy(), atol=2e-5,
                err_msg=f"row {i} final c")


def test_seeded_initial_state_matches_torch():
    """The forwardConnect path (h0/c0 != 0) agrees with torch too."""
    B, T, E, H, L = 3, 5, 4, 6, 2
    params = lstm_init(jax.random.PRNGKey(1), E, H, L)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    h0 = rng.standard_normal((L, B, H)).astype(np.float32) * 0.5
    c0 = rng.standard_normal((L, B, H)).astype(np.float32) * 0.5

    _, (hf, cf) = masked_lstm(params, jnp.asarray(x), jnp.ones((B, T)),
                              jnp.asarray(h0), jnp.asarray(c0))
    m = _to_torch_lstm(params, E, H, L)
    with torch.no_grad():
        _, (ht, ct) = m(torch.from_numpy(x),
                        (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(np.asarray(hf), ht.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cf), ct.numpy(), atol=2e-5)


def test_decode_step_matches_torch_cell():
    """lstm_step (token-by-token generation path) == torch.nn.LSTMCell."""
    B, E, H = 3, 4, 5
    params = lstm_init(jax.random.PRNGKey(2), E, H, num_layers=1)
    rng = np.random.default_rng(2)
    x_t = rng.standard_normal((B, E)).astype(np.float32)
    h = rng.standard_normal((1, B, H)).astype(np.float32)
    c = rng.standard_normal((1, B, H)).astype(np.float32)

    top, h_new, c_new = lstm_step(params, jnp.asarray(x_t),
                                  jnp.asarray(h), jnp.asarray(c))

    cell = torch.nn.LSTMCell(E, H)
    w = np.asarray(params["layers"][0]["w"], np.float64)
    b = np.asarray(params["layers"][0]["b"], np.float64)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(w[:E].T.copy()).float())
        cell.weight_hh.copy_(torch.from_numpy(w[E:].T.copy()).float())
        cell.bias_ih.copy_(torch.from_numpy(b).float())
        cell.bias_hh.zero_()
        ht, ct = cell(torch.from_numpy(x_t),
                      (torch.from_numpy(h[0]), torch.from_numpy(c[0])))
    np.testing.assert_allclose(np.asarray(top), ht.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_new[0]), ht.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_new[0]), ct.numpy(), atol=2e-5)


def test_fused_lm_head_loss_matches_torch_cross_entropy():
    """The fused gen training loss (ops/lm_loss.py — online-logsumexp fwd,
    tile-softmax d-logits bwd) == torch's masked mean cross-entropy over
    the same logits, values AND grads (outs, w, b).  Independent
    cross-framework pin on the round-3 custom VJP."""
    from visdial_tpu.ops.lm_loss import masked_nll_fused

    N, T, H, V = 4, 5, 12, 29
    rng = np.random.default_rng(0)
    outs = rng.standard_normal((N, T, H)).astype(np.float32)
    w = (rng.standard_normal((H, V)) * 0.3).astype(np.float32)
    b = (rng.standard_normal(V) * 0.1).astype(np.float32)
    tgt = rng.integers(0, V, size=(N, T)).astype(np.int32)
    tgt[0, 3:] = 0          # trailing pad
    tgt[2] = 0              # fully-ignored row

    ours, g = jax.value_and_grad(masked_nll_fused, argnums=(0, 1, 2))(
        jnp.asarray(outs), jnp.asarray(w), jnp.asarray(b), jnp.asarray(tgt))

    t_outs = torch.tensor(outs, requires_grad=True)
    t_w = torch.tensor(w, requires_grad=True)
    t_b = torch.tensor(b, requires_grad=True)
    logits = (t_outs.reshape(N * T, H) @ t_w + t_b)
    theirs = torch.nn.functional.cross_entropy(
        logits, torch.tensor(tgt.reshape(N * T), dtype=torch.long),
        ignore_index=0, reduction="mean")
    theirs.backward()

    np.testing.assert_allclose(float(ours), float(theirs.detach()), atol=1e-5)
    for a, t in zip(g, (t_outs, t_w, t_b)):
        np.testing.assert_allclose(np.asarray(a), t.grad.numpy(), atol=1e-4)


# ---- whole-model cross-checks -------------------------------------------
# The strongest parity evidence available without a readable reference:
# an INDEPENDENT reimplementation of the full scoring pipeline — torch
# LSTMs over explicit per-row real-token slices, numpy wiring written as
# per-dialog/per-round loops with explicit slot slices — must reproduce
# our folded/masked/vectorized model_scores exactly.  Catches composition
# bugs (reshapes, round folding, causal masks, right-alignment readout)
# that per-module tests cannot.

def _twin_setup(encoder, decoder="disc"):
    from conftest import small_config

    from visdial_tpu.data.loader import EvalLoader
    from visdial_tpu.data.synthetic import make_synthetic_split
    from visdial_tpu.models.model import model_init, model_scores

    cfg = small_config(encoder=encoder, decoder=decoder, dropout=0.0)
    split, vocab = make_synthetic_split(cfg, num_dialogs=3, seed=9)
    cfg = cfg.replace(vocab_size=vocab.size)
    params = model_init(jax.random.PRNGKey(1), cfg)
    batch = next(iter(EvalLoader(split, vocab, cfg, batch_size=3)))
    ours = np.asarray(model_scores(params, batch.as_dict(), cfg, impl="xla"))
    return cfg, params, batch, ours


def _lstm_last(m, table, tokens, H):
    """Final top-layer h over a row's real tokens (zero state if none)."""
    toks = np.asarray(tokens)
    toks = toks[toks != 0]
    if toks.size == 0:
        return np.zeros(H, np.float32)
    x = torch.from_numpy(table[toks][None].astype(np.float32))
    with torch.no_grad():
        _, (h, _) = m(x)
    return h[-1, 0].numpy()


def _lin(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def test_mn_qih_disc_whole_model_matches_torch_twin():
    cfg, params, batch, ours = _twin_setup("mn-ques-im-hist")
    E, H, L = cfg.embed_size, cfg.rnn_hidden_size, cfg.num_layers
    table = np.asarray(params["embed"]["table"])
    enc, dec = params["encoder"], params["decoder"]
    m_q = _to_torch_lstm(enc["ques_lstm"], E, H, L)
    m_f = _to_torch_lstm(enc["fact_lstm"], E, H, L)
    m_o = _to_torch_lstm(dec["opt_lstm"], E, H, L)

    img_h = _lin(enc["img_proj"], np.asarray(batch.img, np.float32))
    B, R, K = batch.ques.shape[0], cfg.num_rounds, cfg.num_options
    twin = np.zeros((B, R, K), np.float32)
    for b in range(B):
        f_h = [_lstm_last(m_f, table, batch.facts[b, s], H) for s in range(R)]
        for r in range(R):
            q_h = _lstm_last(m_q, table, batch.ques[b, r], H)
            query = np.tanh(_lin(enc["query_fusion"],
                                 np.concatenate([q_h, img_h[b]])))
            logits = np.array([query @ f_h[s] for s in range(r + 1)])
            att = np.exp(logits - logits.max())
            att /= att.sum()
            mem = sum(att[s] * f_h[s] for s in range(r + 1))
            joint = np.tanh(_lin(enc["fusion"],
                                 np.concatenate([query, mem])))
            for k in range(K):
                twin[b, r, k] = joint @ _lstm_last(
                    m_o, table, batch.opt[b, r, k], H)
    np.testing.assert_allclose(ours, twin, atol=3e-4)


def _mn_joint(cfg, params, batch, b, r, m_q, m_f, f_h, img_h):
    """MN encoder joint embedding for one (dialog, round) — explicit loops."""
    H = cfg.rnn_hidden_size
    enc = params["encoder"]
    table = np.asarray(params["embed"]["table"])
    q_h = _lstm_last(m_q, table, batch.ques[b, r], H)
    query = np.tanh(_lin(enc["query_fusion"],
                         np.concatenate([q_h, img_h[b]])))
    logits = np.array([query @ f_h[s] for s in range(r + 1)])
    att = np.exp(logits - logits.max())
    att /= att.sum()
    mem = sum(att[s] * f_h[s] for s in range(r + 1))
    return np.tanh(_lin(enc["fusion"], np.concatenate([query, mem])))


def test_mn_qih_gen_whole_model_matches_torch_twin():
    """The full GEN scoring path — forwardConnect (h0=joint per layer,
    c0=0), teacher-forced candidate token log-probs summed over REAL tokens
    only — against an independent torch+numpy reimplementation.  Catches
    forwardConnect, answer masking, and candidate-fold bugs the
    self-referential golden fixture cannot."""
    cfg, params, batch, ours = _twin_setup("mn-ques-im-hist", decoder="gen")
    E, H, L = cfg.embed_size, cfg.rnn_hidden_size, cfg.num_layers
    table = np.asarray(params["embed"]["table"])
    enc, dec = params["encoder"], params["decoder"]
    m_q = _to_torch_lstm(enc["ques_lstm"], E, H, L)
    m_f = _to_torch_lstm(enc["fact_lstm"], E, H, L)
    m_lm = _to_torch_lstm(dec["lm_lstm"], E, H, L)
    w_out = np.asarray(dec["out_proj"]["w"], np.float32)
    b_out = np.asarray(dec["out_proj"]["b"], np.float32)

    img_h = _lin(enc["img_proj"], np.asarray(batch.img, np.float32))
    B, R, K = batch.ques.shape[0], cfg.num_rounds, cfg.num_options
    twin = np.zeros((B, R, K), np.float32)
    for b in range(B):
        f_h = [_lstm_last(m_f, table, batch.facts[b, s], H) for s in range(R)]
        for r in range(R):
            joint = _mn_joint(cfg, params, batch, b, r, m_q, m_f, f_h, img_h)
            h0 = torch.from_numpy(np.tile(joint, (L, 1, 1)).astype(np.float32))
            c0 = torch.zeros(L, 1, H)
            for k in range(K):
                tin = np.asarray(batch.opt_in[b, r, k])
                tout = np.asarray(batch.opt_out[b, r, k])
                n = int((tin != 0).sum())        # <START> + real tokens
                x = torch.from_numpy(table[tin[:n]][None].astype(np.float32))
                with torch.no_grad():
                    outs, _ = m_lm(x, (h0, c0))
                logits = outs[0].numpy() @ w_out + b_out        # (n, V)
                logp = logits - np.log(
                    np.exp(logits - logits.max(-1, keepdims=True)).sum(
                        -1, keepdims=True)) - logits.max(-1, keepdims=True)
                s = sum(logp[t, tout[t]] for t in range(n) if tout[t] != 0)
                twin[b, r, k] = s
    np.testing.assert_allclose(ours, twin, atol=3e-4)


def _hre_twin(encoder):
    """HRE/HREA-QIH-disc whole-model twin: per-dialog fact->dialog-LSTM
    chain (HRE: round state readout; HREA: softmax attention over dialog
    states), torch LSTMs + numpy wiring."""
    cfg, params, batch, ours = _twin_setup(encoder)
    E, H, L = cfg.embed_size, cfg.rnn_hidden_size, cfg.num_layers
    table = np.asarray(params["embed"]["table"])
    enc, dec = params["encoder"], params["decoder"]
    m_q = _to_torch_lstm(enc["ques_lstm"], E, H, L)
    m_f = _to_torch_lstm(enc["fact_lstm"], E, H, L)
    m_d = _to_torch_lstm(enc["dialog_lstm"], H, H, 1)
    m_o = _to_torch_lstm(dec["opt_lstm"], E, H, L)

    img_h = _lin(enc["img_proj"], np.asarray(batch.img, np.float32))
    B, R, K = batch.ques.shape[0], cfg.num_rounds, cfg.num_options
    twin = np.zeros((B, R, K), np.float32)
    for b in range(B):
        f_h = np.stack([_lstm_last(m_f, table, batch.facts[b, s], H)
                        for s in range(R)])                       # (R, H)
        with torch.no_grad():  # dialog-level LSTM over the R fact slots
            d_outs, _ = m_d(torch.from_numpy(f_h[None].astype(np.float32)))
        d_outs = d_outs[0].numpy()                                # (R, H)
        for r in range(R):
            q_h = _lstm_last(m_q, table, batch.ques[b, r], H)
            query = np.tanh(_lin(enc["query_fusion"],
                                 np.concatenate([q_h, img_h[b]])))
            if encoder.startswith("hrea"):
                logits = np.array([query @ d_outs[s] for s in range(r + 1)])
                att = np.exp(logits - logits.max())
                att /= att.sum()
                ctx = sum(att[s] * d_outs[s] for s in range(r + 1))
            else:   # HRE: history representation = dialog state after slot r
                ctx = d_outs[r]
            joint = np.tanh(_lin(enc["fusion"],
                                 np.concatenate([query, ctx])))
            for k in range(K):
                twin[b, r, k] = joint @ _lstm_last(
                    m_o, table, batch.opt[b, r, k], H)
    np.testing.assert_allclose(ours, twin, atol=3e-4)


def test_hre_qih_disc_whole_model_matches_torch_twin():
    _hre_twin("hre-ques-im-hist")


def test_hrea_qih_disc_whole_model_matches_torch_twin():
    _hre_twin("hrea-ques-im-hist")


def _gen_cand_score(m_lm, table, dec, joint, tin, tout, L, H):
    """One candidate's gen score: forwardConnect (h0 = joint per layer,
    c0 = 0), teacher-forced token log-probs summed over REAL targets."""
    w_out = np.asarray(dec["out_proj"]["w"], np.float32)
    b_out = np.asarray(dec["out_proj"]["b"], np.float32)
    h0 = torch.from_numpy(np.tile(joint, (L, 1, 1)).astype(np.float32))
    c0 = torch.zeros(L, 1, H)
    tin, tout = np.asarray(tin), np.asarray(tout)
    n = int((tin != 0).sum())            # <START> + real tokens
    x = torch.from_numpy(table[tin[:n]][None].astype(np.float32))
    with torch.no_grad():
        outs, _ = m_lm(x, (h0, c0))
    logits = outs[0].numpy() @ w_out + b_out                # (n, V)
    logp = logits - np.log(
        np.exp(logits - logits.max(-1, keepdims=True)).sum(
            -1, keepdims=True)) - logits.max(-1, keepdims=True)
    return sum(logp[t, tout[t]] for t in range(n) if tout[t] != 0)


def _hre_gen_twin(encoder):
    """HRE/HREA-QIH-gen whole-model twin — the last composition without
    independent evidence (round-3 verdict Weak #5): the dialog-LSTM context
    chain feeding forwardConnect + teacher-forced candidate scoring, as an
    explicit torch+numpy reimplementation vs our vectorized model_scores."""
    cfg, params, batch, ours = _twin_setup(encoder, decoder="gen")
    E, H, L = cfg.embed_size, cfg.rnn_hidden_size, cfg.num_layers
    table = np.asarray(params["embed"]["table"])
    enc, dec = params["encoder"], params["decoder"]
    m_q = _to_torch_lstm(enc["ques_lstm"], E, H, L)
    m_f = _to_torch_lstm(enc["fact_lstm"], E, H, L)
    m_d = _to_torch_lstm(enc["dialog_lstm"], H, H, 1)
    m_lm = _to_torch_lstm(dec["lm_lstm"], E, H, L)

    img_h = _lin(enc["img_proj"], np.asarray(batch.img, np.float32))
    B, R, K = batch.ques.shape[0], cfg.num_rounds, cfg.num_options
    twin = np.zeros((B, R, K), np.float32)
    for b in range(B):
        f_h = np.stack([_lstm_last(m_f, table, batch.facts[b, s], H)
                        for s in range(R)])                       # (R, H)
        with torch.no_grad():
            d_outs, _ = m_d(torch.from_numpy(f_h[None].astype(np.float32)))
        d_outs = d_outs[0].numpy()                                # (R, H)
        for r in range(R):
            q_h = _lstm_last(m_q, table, batch.ques[b, r], H)
            query = np.tanh(_lin(enc["query_fusion"],
                                 np.concatenate([q_h, img_h[b]])))
            if encoder.startswith("hrea"):
                logits = np.array([query @ d_outs[s] for s in range(r + 1)])
                att = np.exp(logits - logits.max())
                att /= att.sum()
                ctx = sum(att[s] * d_outs[s] for s in range(r + 1))
            else:
                ctx = d_outs[r]
            joint = np.tanh(_lin(enc["fusion"],
                                 np.concatenate([query, ctx])))
            for k in range(K):
                twin[b, r, k] = _gen_cand_score(
                    m_lm, table, dec, joint,
                    batch.opt_in[b, r, k], batch.opt_out[b, r, k], L, H)
    np.testing.assert_allclose(ours, twin, atol=3e-4)


def test_hre_qih_gen_whole_model_matches_torch_twin():
    _hre_gen_twin("hre-ques-im-hist")


def test_hrea_qih_gen_whole_model_matches_torch_twin():
    _hre_gen_twin("hrea-ques-im-hist")


def test_lf_qih_disc_whole_model_matches_torch_twin():
    """LF with the incremental-history path: round r's history state must
    equal a fresh torch LSTM run over the first hist_bounds[b, r] tokens
    of the left-aligned dialog concat."""
    cfg, params, batch, ours = _twin_setup("lf-ques-im-hist")
    E, H, L = cfg.embed_size, cfg.rnn_hidden_size, cfg.num_layers
    table = np.asarray(params["embed"]["table"])
    enc, dec = params["encoder"], params["decoder"]
    m_q = _to_torch_lstm(enc["ques_lstm"], E, H, L)
    m_h = _to_torch_lstm(enc["hist_lstm"], E, H, L)
    m_o = _to_torch_lstm(dec["opt_lstm"], E, H, L)

    img_h = _lin(enc["img_proj"], np.asarray(batch.img, np.float32))
    B, R, K = batch.ques.shape[0], cfg.num_rounds, cfg.num_options
    twin = np.zeros((B, R, K), np.float32)
    for b in range(B):
        for r in range(R):
            q_h = _lstm_last(m_q, table, batch.ques[b, r], H)
            n = int(batch.hist_bounds[b, r])
            h_h = _lstm_last(m_h, table, batch.hist_flat[b, :n], H)
            cat = np.concatenate([q_h, h_h, img_h[b]])
            joint = np.tanh(_lin(enc["fusion"], cat))
            for k in range(K):
                twin[b, r, k] = joint @ _lstm_last(
                    m_o, table, batch.opt[b, r, k], H)
    np.testing.assert_allclose(ours, twin, atol=3e-4)


def test_lf_qih_gen_whole_model_matches_torch_twin():
    """LF encoder feeding the gen decoder — the last encoder-decoder
    composition without cross-framework evidence (every other wiring has a
    whole-model twin): concat-history LF joint -> forwardConnect ->
    teacher-forced candidate scoring, vs our vectorized model_scores."""
    cfg, params, batch, ours = _twin_setup("lf-ques-im-hist", decoder="gen")
    E, H, L = cfg.embed_size, cfg.rnn_hidden_size, cfg.num_layers
    table = np.asarray(params["embed"]["table"])
    enc, dec = params["encoder"], params["decoder"]
    m_q = _to_torch_lstm(enc["ques_lstm"], E, H, L)
    m_h = _to_torch_lstm(enc["hist_lstm"], E, H, L)
    m_lm = _to_torch_lstm(dec["lm_lstm"], E, H, L)

    img_h = _lin(enc["img_proj"], np.asarray(batch.img, np.float32))
    B, R, K = batch.ques.shape[0], cfg.num_rounds, cfg.num_options
    twin = np.zeros((B, R, K), np.float32)
    for b in range(B):
        for r in range(R):
            q_h = _lstm_last(m_q, table, batch.ques[b, r], H)
            n = int(batch.hist_bounds[b, r])
            h_h = _lstm_last(m_h, table, batch.hist_flat[b, :n], H)
            cat = np.concatenate([q_h, h_h, img_h[b]])
            joint = np.tanh(_lin(enc["fusion"], cat))
            for k in range(K):
                twin[b, r, k] = _gen_cand_score(
                    m_lm, table, dec, joint,
                    batch.opt_in[b, r, k], batch.opt_out[b, r, k], L, H)
    np.testing.assert_allclose(ours, twin, atol=3e-4)

"""Answer decoders: generative LSTM LM and discriminative ranker.

Reference: decoders/gen.lua, decoders/disc.lua.

**gen** — 2-layer LSTM language model over answer tokens, teacher-forced
with a masked NLL loss; the encoder joint embedding seeds the decoder state.
forwardConnect scheme (SURVEY.md hard part #4, documented decision): each
decoder layer's initial hidden state h_l = joint embedding, initial cell
state c_l = 0.  Candidate scoring sums token log-probs over the candidate
(no length normalization — SURVEY.md marks this [P]; chosen behavior).

**disc** — a shared-weight option LSTM embeds each of the 100 candidates;
score_k = dot(option_k embedding, joint embedding); 100-way softmax + NLL
on the ground-truth index.

TPU-first: candidates fold into the batch axis (N*K rows through one LSTM
call — embarrassingly parallel, MXU-sized matmuls), never a Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.lstm import lstm_init, lstm_step, masked_lstm
from .core import embed, linear, linear_init


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def decoder_init(rng, cfg: Config) -> dict:
    H, E = cfg.rnn_hidden_size, cfg.embed_size
    k1, k2 = jax.random.split(rng)
    if cfg.decoder == "gen":
        return {
            "lm_lstm": lstm_init(k1, E, H, cfg.num_layers),
            "out_proj": linear_init(k2, H, cfg.vocab_size),
        }
    return {"opt_lstm": lstm_init(k1, E, H, cfg.num_layers)}


def _joint_to_state(joint: jnp.ndarray, num_layers: int):
    """forwardConnect: joint (N, H) -> (h0, c0), each (L, N, H)."""
    h0 = jnp.broadcast_to(joint[None], (num_layers,) + joint.shape)
    c0 = jnp.zeros_like(h0)
    return h0, c0


# ---------------------------------------------------------------------------
# gen
# ---------------------------------------------------------------------------

def _lm_hidden(params, embed_params, joint, tokens_in, cfg: Config,
               *, train=False, rng=None, impl="xla"):
    """Teacher-forced top-layer LSTM states (N, T, H) in the compute
    dtype; tokens_in (N, T) left-aligned."""
    vecs = embed(embed_params, tokens_in).astype(jnp.dtype(cfg.compute_dtype))
    mask = (tokens_in != 0).astype(vecs.dtype)
    h0, c0 = _joint_to_state(joint.astype(vecs.dtype), cfg.num_layers)
    outs, _ = masked_lstm(
        params["lm_lstm"], vecs, mask, h0, c0,
        impl=impl, dropout_rng=rng, dropout_rate=cfg.dropout if train else 0.0,
    )
    return outs


def gen_logits(params, embed_params, joint, tokens_in, cfg: Config,
               *, train=False, rng=None, impl="xla"):
    """Teacher-forced logits.  tokens_in (N, T) left-aligned; returns
    (N, T, V) in float32 (softmax stability), matmuls in the compute
    dtype."""
    outs = _lm_hidden(params, embed_params, joint, tokens_in, cfg,
                      train=train, rng=rng, impl=impl)
    return linear(params["out_proj"], outs, out_dtype=jnp.float32)


def masked_nll(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean NLL over non-pad target tokens (reference: masked seq
    ClassNLLCriterion).  logits (N,T,V), targets (N,T) with 0 = ignore."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != 0).astype(logits.dtype)
    return -jnp.sum(tok_lp * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def gen_loss(params, embed_params, joint, batch, cfg: Config,
             *, train=False, rng=None, impl="xla"):
    N = joint.shape[0]
    tokens_in = batch["ans_in"].reshape(N, -1)
    tokens_out = batch["ans_out"].reshape(N, -1)
    # Gen training needs only the answer, not the candidate list, so its
    # mask is "round has an answer" — NOT round_valid, which additionally
    # requires candidates+gt (rankability; that stricter mask belongs to
    # disc_loss and the metrics).  An answerless round (padded/truncated
    # v1.0 dialog, test-split round) has ans_in = [<START>, 0, ...]; its
    # lone <END> target is zeroed out here.  No-op for v0.9 data.
    has_answer = (tokens_in[:, 1] != 0).astype(tokens_out.dtype)
    tokens_out = tokens_out * has_answer[:, None]
    if impl == "pallas":
        # Fused LM-head loss: the (N, T, V) logits tensor never exists in
        # either direction (ops/lm_loss.py; same math as the twin below).
        from ..ops.lm_loss import masked_nll_fused

        outs = _lm_hidden(params, embed_params, joint, tokens_in, cfg,
                          train=train, rng=rng, impl=impl)
        return masked_nll_fused(outs, params["out_proj"]["w"],
                                params["out_proj"]["b"], tokens_out)
    logits = gen_logits(params, embed_params, joint, tokens_in, cfg,
                        train=train, rng=rng, impl=impl)
    return masked_nll(logits, tokens_out)


SCORE_CHUNK_ROWS = 8192  # candidate rows scored per lax.map step

# Row count above which candidate rows are length-sorted before the LSTM:
# the fused kernel skips whole grid steps outside each batch-tile's real
# token span (ops/lstm_pallas.py per-tile bounds), so sorting makes tiles
# length-homogeneous and most of the pad compute disappears — real VisDial
# answers average ~3 of the 9 padded steps.  Deterministic math is exact
# (stable argsort + gather/scatter); at train time the inter-layer dropout
# mask assignment is positional, so sorting changes WHICH mask element a
# row draws (noise-shape only, like Config.lf_hist_incremental).
LENGTH_SORT_MIN_ROWS = 2048


def _length_sorted(tokens):
    """(order, inverse) permutations sorting rows by descending real
    length; stable, so equal-length rows keep their relative order.

    Counting sort, not argsort: lengths take at most T+1 distinct values,
    so rank = (start of my length's span) + (equal-length rows before me)
    — a one-hot cumsum + scatter, ~3x cheaper than the 32k-row bitonic
    argsort on this chip."""
    N, T = tokens.shape
    lens = jnp.sum(tokens != 0, axis=-1)
    key = jax.nn.one_hot(T - lens, T + 1, dtype=jnp.int32)       # (N, T+1)
    before_me = jnp.cumsum(key, axis=0) - key                    # same-key rows < i
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(jnp.sum(key, axis=0))[:-1].astype(jnp.int32)])
    rank = jnp.sum((starts[None, :] + before_me) * key, axis=-1)  # (N,)
    order = jnp.zeros(N, jnp.int32).at[rank].set(
        jnp.arange(N, dtype=jnp.int32))
    return order, rank


def _maybe_length_norm(scores, targets, cfg: Config):
    """Optional per-token normalization of summed candidate log-probs
    (cfg.gen_score_length_norm; the behavior of record is the raw sum)."""
    if not cfg.gen_score_length_norm:
        return scores
    n_tok = jnp.maximum(jnp.sum((targets != 0), axis=-1), 1)
    return scores / n_tok


def gen_score_rows(params, embed_params, joint_rows, tokens_in, tgt,
                   cfg: Config, *, impl="xla", sort: bool = True):
    """Score candidate ROWS: sum of token log-probs per row.

    joint_rows (rows, H) — the per-row conditioning (the dialog round's
    joint embedding, one per candidate); tokens_in/tgt (rows, T) with T any
    static width >= the row's length+1 (masked steps contribute exactly
    zero, so scores are identical for any sufficient T — the bucketed eval
    fast path relies on this).  Returns (rows,) scores.

    sort=False skips the length grouping — callers whose rows are already
    length-homogeneous (the harness's bucketed eval path) pass it to avoid
    a pure-overhead permutation.

    The vocab projection + log-softmax is chunked over rows with lax.map —
    materializing all (rows, T, V) logits would be ~10GB at flagship shapes
    (32k rows x 9 steps x 8848 vocab f32), past HBM; per-chunk scoring
    keeps the transient bounded while each chunk matmul stays MXU-sized.
    """
    rows, T = tokens_in.shape
    inv = None
    if sort and impl == "pallas" and rows >= LENGTH_SORT_MIN_ROWS:
        # length-sort so the kernel's per-tile bounds skip pad steps; the
        # (rows,) scores are inverse-scattered at the end
        order, inv = _length_sorted(tokens_in)
        tokens_in = jnp.take(tokens_in, order, axis=0)
        tgt = jnp.take(tgt, order, axis=0)
        joint_rows = jnp.take(joint_rows, order, axis=0)
    vecs = embed(embed_params, tokens_in).astype(jnp.dtype(cfg.compute_dtype))
    mask = (tokens_in != 0).astype(vecs.dtype)
    h0, c0 = _joint_to_state(joint_rows.astype(vecs.dtype), cfg.num_layers)
    outs, _ = masked_lstm(params["lm_lstm"], vecs, mask, h0, c0, impl=impl)

    if impl == "pallas":
        # Fused online-logsumexp LM head: per-token log p without ever
        # materializing (rows*T, V) logits (ops/lm_score_pallas.py).
        from ..ops.lm_score_pallas import lm_token_logprobs_pallas

        tok_lp = lm_token_logprobs_pallas(
            outs.reshape(rows * T, -1),
            params["out_proj"]["w"], params["out_proj"]["b"],
            tgt.reshape(rows * T)).reshape(rows, T)
        s = _maybe_length_norm(jnp.sum(tok_lp * (tgt != 0), axis=-1),
                               tgt, cfg)
        return jnp.take(s, inv, axis=0) if inv is not None else s

    C = min(SCORE_CHUNK_ROWS, rows)
    pad = -rows % C
    if pad:
        outs = jnp.pad(outs, ((0, pad), (0, 0), (0, 0)))
        tgt = jnp.pad(tgt, ((0, pad), (0, 0)))

    def score_chunk(args):
        outs_c, tgt_c = args                                  # (C,T,H), (C,T)
        logits = linear(params["out_proj"], outs_c, out_dtype=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)               # (C, T)
        tgt_logit = jnp.take_along_axis(
            logits, tgt_c[..., None], axis=-1)[..., 0]
        lp = tgt_logit - lse
        s = jnp.sum(lp * (tgt_c != 0), axis=-1)               # (C,)
        return _maybe_length_norm(s, tgt_c, cfg)

    n_chunks = (rows + pad) // C
    scores = jax.lax.map(
        score_chunk,
        (outs.reshape(n_chunks, C, T, -1), tgt.reshape(n_chunks, C, T)))
    # (no inverse scatter here: length sorting only engages on the pallas
    # path above, which returns before reaching this chunked XLA twin)
    return scores.reshape(-1)[:rows]


def gen_candidate_scores(params, embed_params, joint, opt_in, opt_out,
                         cfg: Config, *, impl="xla"):
    """Sum of token log-probs per candidate (reference: evaluate.lua gen
    branch — the dominant eval cost).

    joint (N, H); opt_in/opt_out (N, K, T).  Returns (N, K) scores.
    Candidates fold into the batch: (N*K, T) rows through gen_score_rows.
    """
    N, K, T = opt_in.shape
    joint_k = jnp.repeat(joint, K, axis=0)                    # (N*K, H)
    scores = gen_score_rows(params, embed_params, joint_k,
                            opt_in.reshape(N * K, T),
                            opt_out.reshape(N * K, T), cfg, impl=impl)
    return scores.reshape(N, K)


def gen_decode(params, embed_params, joint, cfg: Config, *,
               start_token: int, end_token: int, max_len: int | None = None,
               greedy: bool = True, rng=None, temperature: float = 1.0):
    """Token-by-token answer decoding (reference: generate.lua step loop —
    feed <START>, argmax/sample, feed back until <END>/max length).

    joint (N, H).  Returns (tokens (N, max_len) int32 with 0 after <END>,
    log-probs (N,) summed over emitted tokens).  Greedy when `greedy`,
    else temperature sampling (rng required).  Batch-parallel: the whole
    batch decodes in one lax.scan, no Python loop.
    """
    N = joint.shape[0]
    max_len = max_len or cfg.max_ans_len
    h0, c0 = _joint_to_state(joint, cfg.num_layers)

    def step(carry, step_rng):
        tok, h, c, done, lp_sum = carry
        x_t = embed(embed_params, tok[:, None])[:, 0]       # (N, E)
        top, h, c = lstm_step(params["lm_lstm"], x_t, h, c)
        logits = linear(params["out_proj"], top,
                        out_dtype=jnp.float32)              # (N, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if greedy:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(
                step_rng, logits / temperature, axis=-1).astype(jnp.int32)
        tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        # emitting <END> or PAD (0 — never a training target) ends the row
        stop = (nxt == end_token) | (nxt == 0)
        emit = jnp.where(done | stop, 0, nxt)
        lp_sum = lp_sum + jnp.where(done, 0.0, tok_lp)
        done = done | stop
        return (jnp.where(emit == 0, end_token, emit), h, c, done, lp_sum), emit

    keys = (jax.random.split(rng, max_len) if rng is not None
            else jnp.zeros((max_len, 2), jnp.uint32))
    init = (jnp.full((N,), start_token, jnp.int32), h0, c0,
            jnp.zeros((N,), bool), jnp.zeros((N,), jnp.float32))
    (_, _, _, _, logp), toks = jax.lax.scan(step, init, keys)
    return jnp.swapaxes(toks, 0, 1), logp


def gen_beam_decode(params, embed_params, joint, cfg: Config, *,
                    start_token: int, end_token: int, beam_size: int = 5,
                    max_len: int | None = None):
    """Batched beam-search decoding (reference: generate.lua -beamSize
    option; SURVEY.md marks the exact reference behavior [U] — documented
    behavior of record: length-unnormalized log-prob, ended beams frozen).

    joint (N, H).  Returns (tokens (N, max_len) of the best beam, its
    summed log-prob (N,)).  Beams fold into the batch axis (N*W rows per
    LSTM step), whole search under one lax.scan.
    """
    N, H = joint.shape
    W = beam_size
    V = params["out_proj"]["w"].shape[1]
    max_len = max_len or cfg.max_ans_len
    L = cfg.num_layers

    h0, c0 = _joint_to_state(joint, L)                    # (L, N, H)
    h0 = jnp.repeat(h0, W, axis=1)                        # (L, N*W, H)
    c0 = jnp.repeat(c0, W, axis=1)
    NEG = -1e30

    def step(carry, _):
        tok, h, c, done, beam_lp, seqs, t = carry
        # tok (N, W); h/c (L, N*W, H); done (N, W); beam_lp (N, W);
        # seqs (N, W, max_len)
        x_t = embed(embed_params, tok.reshape(N * W, 1))[:, 0]
        top, h, c = lstm_step(params["lm_lstm"], x_t, h, c)
        logp = jax.nn.log_softmax(
            linear(params["out_proj"], top, out_dtype=jnp.float32), axis=-1)
        logp = logp.reshape(N, W, V)
        # ended beams may only "emit" pad at zero cost; live beams expand
        frozen = jnp.full((N, W, V), NEG).at[:, :, 0].set(0.0)
        logp = jnp.where(done[..., None], frozen, logp)
        # step 0: all beams are identical — keep only beam 0's expansions
        first = jnp.arange(W)[None, :, None] > 0
        logp = jnp.where((t == 0) & first, NEG, logp)
        cand = beam_lp[..., None] + logp                  # (N, W, V)
        flat = cand.reshape(N, W * V)
        new_lp, flat_idx = jax.lax.top_k(flat, W)         # (N, W)
        src_beam = flat_idx // V                          # (N, W)
        new_tok = (flat_idx % V).astype(jnp.int32)

        # gather parent state/seq/done for each surviving beam
        gidx = (jnp.arange(N)[:, None] * W + src_beam).reshape(-1)
        h = h[:, gidx]
        c = c[:, gidx]
        seqs = jnp.take_along_axis(seqs, src_beam[..., None], axis=1)
        done = jnp.take_along_axis(done, src_beam, axis=1)
        stop = (new_tok == end_token) | (new_tok == 0)
        emit = jnp.where(done | stop, 0, new_tok)
        seqs = jax.lax.dynamic_update_slice_in_dim(
            seqs, emit[..., None], t, axis=2)
        done = done | stop
        feed = jnp.where(emit == 0, end_token, emit)
        return (feed, h, c, done, new_lp, seqs, t + 1), None

    init = (jnp.full((N, W), start_token, jnp.int32), h0, c0,
            jnp.zeros((N, W), bool), jnp.zeros((N, W), jnp.float32),
            jnp.zeros((N, W, max_len), jnp.int32), jnp.zeros((), jnp.int32))
    (_, _, _, _, beam_lp, seqs, _), _ = jax.lax.scan(
        step, init, None, length=max_len)
    best = jnp.argmax(beam_lp, axis=1)                    # (N,)
    tokens = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
    return tokens, jnp.take_along_axis(beam_lp, best[:, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# disc
# ---------------------------------------------------------------------------

def disc_option_embeddings(params, embed_params, opt_tokens, cfg: Config,
                           *, train=False, rng=None, impl="xla"):
    """(N, K, T) candidate tokens -> (N, K, H) final LSTM states.

    Large row counts are length-sorted first (see LENGTH_SORT_MIN_ROWS) —
    the dominant train/eval cost at real answer lengths.
    """
    N, K, T = opt_tokens.shape
    flat = opt_tokens.reshape(N * K, T)
    inv = None
    if impl == "pallas" and N * K >= LENGTH_SORT_MIN_ROWS:
        order, inv = _length_sorted(flat)
        flat = jnp.take(flat, order, axis=0)
    vecs = embed(embed_params, flat).astype(jnp.dtype(cfg.compute_dtype))
    mask = (flat != 0).astype(vecs.dtype)
    _, (h_fin, _) = masked_lstm(
        params["opt_lstm"], vecs, mask,
        impl=impl, dropout_rng=rng, dropout_rate=cfg.dropout if train else 0.0,
    )
    h = h_fin[-1]
    if inv is not None:
        h = jnp.take(h, inv, axis=0)
    return h.reshape(N, K, -1)


def disc_option_table(params, embed_params, opt_list, cfg: Config,
                      *, impl="xla", chunk: int = 8192):
    """Embed the deduplicated global option list ONCE: (M, La) -> (M, H).

    Eval-time optimization with no reference analog: option embeddings
    depend only on their tokens (no dropout at eval), so the whole split's
    candidates need one LSTM pass over the ~M unique answers instead of
    N*K rows per batch (the reference re-encodes all 100 candidates every
    round — evaluate.lua disc branch).  Chunked via lax.map to bound the
    transient while keeping each chunk MXU-sized.
    """
    M, T = opt_list.shape
    chunk = min(chunk, M)
    pad = -M % chunk

    def embed_chunk(tokens):
        return disc_option_embeddings(params, embed_params,
                                      tokens[:, None, :], cfg,
                                      train=False, impl=impl)[:, 0]

    padded = jnp.pad(opt_list, ((0, pad), (0, 0)))
    table = jax.lax.map(embed_chunk,
                        padded.reshape(-1, chunk, T)).reshape(M + pad, -1)
    return table[:M]


def disc_scores_from_table(joint, table, opt_inds):
    """score_k = dot(table[opt_inds_k], joint).

    joint (N, H); table (M, H); opt_inds (N, K) rows into the table.
    """
    emb = jnp.take(table, opt_inds, axis=0)                # (N, K, H)
    return jnp.einsum("nh,nkh->nk", joint.astype(emb.dtype), emb,
                      preferred_element_type=jnp.float32)


def disc_scores(params, embed_params, joint, opt_tokens, cfg: Config,
                *, train=False, rng=None, impl="xla"):
    """score_k = dot(option_k, joint) — one batched matmul."""
    opt_emb = disc_option_embeddings(params, embed_params, opt_tokens, cfg,
                                     train=train, rng=rng, impl=impl)
    return jnp.einsum("nh,nkh->nk", joint.astype(opt_emb.dtype), opt_emb,
                      preferred_element_type=jnp.float32)


def disc_loss(params, embed_params, joint, batch, cfg: Config,
              *, train=False, rng=None, impl="xla"):
    N = joint.shape[0]
    if (uniq := batch.get("opt_uniq")) is not None:
        # Dedup'd train path (Config.disc_dedup_options): the option LSTM
        # runs once per UNIQUE candidate row in the batch; per-candidate
        # scores come back through a gather.  Exact for the deterministic
        # math (same tokens -> same embedding); the all-pad filler rows
        # sort to the end inside disc_option_embeddings, where the fused
        # kernel's per-tile step bounds skip their compute entirely.  At
        # train time duplicate candidates share dropout masks (noise-shape
        # only — see config.py).
        emb = disc_option_embeddings(params, embed_params, uniq[None], cfg,
                                     train=train, rng=rng, impl=impl)[0]
        scores = disc_scores_from_table(
            joint, emb, batch["opt_row"].reshape(N, cfg.num_options))
    else:
        opt_tokens = batch["opt"].reshape(N, cfg.num_options, -1)
        scores = disc_scores(params, embed_params, joint, opt_tokens, cfg,
                             train=train, rng=rng, impl=impl)
    gt = batch["gt_ind"].reshape(N)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, gt[:, None], axis=-1)[:, 0]
    if (valid := batch.get("round_valid")) is None:
        return jnp.mean(nll)
    # Mean over annotated rounds only (v1.0 short/test dialogs are padded
    # to the static round count and masked here).
    v = valid.reshape(N).astype(nll.dtype)
    return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)

"""Dialog encoders: Late Fusion, HRE, HREA, Memory Network.

Covers the reference's nine encoder variants (reference: encoders/lf-*.lua,
hre-*.lua, hrea-*.lua, mn-*.lua) with config-driven wiring of the same
builders (SURVEY.md §7 step 5): the encoder name selects the family and
which inputs (image / history) are fused.

All encoders map per-round inputs to one joint embedding of size H
(rnn_hidden_size) per dialog round; shapes below use
  B = dialogs/batch, R = rounds (10), N = B*R, H = hidden, E = embed.

TPU-first design notes:
  * Facts (caption + QA_j) are embedded ONCE per dialog — (B, R) fact slots —
    and every round reuses them under a causal slot mask (slot <= round),
    instead of re-encoding history per round: 10x less LSTM work than the
    reference's per-round history assembly.
  * The round axis folds into the batch axis everywhere (N = B*R rows), so
    all matmuls are large and MXU-friendly; nothing iterates over rounds.
  * Attention over <=10 slots is one small einsum + masked softmax — fused
    by the Pallas kernel in ops/attention_pallas.py on the fast path.

Documented decisions for SURVEY.md [P]/[U] items:
  * One word-embedding table is shared by questions, history, facts, and
    decoders (the reference's per-module LookupTable sharing is [U]).
  * HREA attention scores are unscaled dot products query . d_r, as is the
    MN attention (SURVEY.md §3.5 shows dot-product attention for MN).
  * Image features fuse into the *query* for HRE/HREA/MN (SURVEY.md: item
    "question+image fused into the query") and into the final concat for LF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config, encoder_family, encoder_uses_history, encoder_uses_image
from ..ops.attention import masked_slot_attention
from ..ops.lstm import lstm_init, masked_lstm
from .core import dropout, embed, linear, linear_init


def _flatten_rounds(x: jnp.ndarray) -> jnp.ndarray:
    """(B, R, ...) -> (B*R, ...)"""
    return x.reshape((-1,) + x.shape[2:])


def _dt(cfg: Config):
    return jnp.dtype(cfg.compute_dtype)


def _run_lstm(lstm_params, embed_params, tokens, cfg: Config, train, rng, impl):
    """Embed tokens and run the masked LSTM; return final top-layer h.

    tokens: (N, L) right-aligned. Returns (N, H) in the compute dtype.
    """
    vecs = embed(embed_params, tokens).astype(_dt(cfg))
    mask = (tokens != 0).astype(vecs.dtype)
    _, (h_fin, _) = masked_lstm(
        lstm_params, vecs, mask,
        impl=impl, dropout_rng=rng, dropout_rate=cfg.dropout if train else 0.0,
    )
    return h_fin[-1]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def encoder_init(rng, cfg: Config) -> dict:
    fam = encoder_family(cfg.encoder)
    use_img = encoder_uses_image(cfg.encoder)
    use_hist = encoder_uses_history(cfg.encoder)
    H, E = cfg.rnn_hidden_size, cfg.embed_size
    # spatial pathway projects per-location conv5 channels, not the fc7 vec
    F = cfg.img_spatial_channels if cfg.img_spatial else cfg.img_feat_size
    keys = iter(jax.random.split(rng, 10))
    p: dict = {"ques_lstm": lstm_init(next(keys), E, H, cfg.num_layers)}

    if fam == "lf":
        fusion_in = H
        if use_hist:
            p["hist_lstm"] = lstm_init(next(keys), E, H, cfg.num_layers)
            fusion_in += H
        if use_img:
            p["img_proj"] = linear_init(next(keys), F, H)
            fusion_in += H
        p["fusion"] = linear_init(next(keys), fusion_in, H)
    elif fam in ("hre", "hrea", "mn"):
        assert use_hist, f"{cfg.encoder}: {fam} encoders require history"
        p["fact_lstm"] = lstm_init(next(keys), E, H, cfg.num_layers)
        if fam in ("hre", "hrea"):
            p["dialog_lstm"] = lstm_init(next(keys), H, H, 1)
        if use_img:
            p["img_proj"] = linear_init(next(keys), F, H)
            p["query_fusion"] = linear_init(next(keys), 2 * H, H)
        p["fusion"] = linear_init(next(keys), 2 * H, H)
    else:  # pragma: no cover
        raise ValueError(fam)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _image_pathway(params, batch, q, cfg: Config, B: int, R: int,
                   impl: str) -> jnp.ndarray:
    """Image feature -> one (N, H) vector per round.

    fc7 default: project once per dialog, repeat per round (reference:
    encoders/*-im-*.lua image Linear).  img_spatial (beyond-reference,
    SURVEY.md §2 #12 conv5 note): project each of the S pool5 locations to
    H and attend over them with the question state as the query — one
    extra masked_slot_attention call (all slots valid), so the fused
    attention kernel serves both dialog memory and image space.
    """
    dt = _dt(cfg)
    if not cfg.img_spatial:
        img = linear(params["img_proj"], batch["img"].astype(dt))    # (B, H)
        return jnp.repeat(img, R, axis=0)                            # (N, H)
    S, C = cfg.img_spatial_slots, cfg.img_spatial_channels
    loc = batch["img"].reshape(B, S, C).astype(dt)
    loc_h = linear(params["img_proj"], loc)                          # (B,S,H)
    q_r = q.reshape(B, R, -1)
    valid = jnp.ones((B, R, S), loc_h.dtype)
    att = masked_slot_attention(q_r, loc_h, valid, impl=impl)        # (B,R,H)
    return att.reshape(B * R, -1)


def encoder_apply(
    params: dict,
    embed_params: dict,
    batch: dict,
    cfg: Config,
    *,
    train: bool = False,
    rng=None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Encode a batch to joint embeddings (N, H), N = B*R."""
    fam = encoder_family(cfg.encoder)
    use_img = encoder_uses_image(cfg.encoder)
    use_hist = encoder_uses_history(cfg.encoder)
    B, R = batch["ques"].shape[:2]
    rngs = iter(jax.random.split(rng, 8)) if rng is not None else iter([None] * 8)

    # Question pathway: (B*R, Lq) -> (N, H)
    q = _run_lstm(params["ques_lstm"], embed_params,
                  _flatten_rounds(batch["ques"]), cfg, train, next(rngs), impl)

    if fam == "lf":
        parts = [q]
        if use_hist:
            if "hist_flat" in batch:
                # Incremental path: ONE LSTM pass over the full left-aligned
                # dialog; round r's history state = the state at its prefix
                # boundary (causal LSTM => identical to re-encoding each
                # right-aligned prefix, ~10x fewer token-steps).
                flat = batch["hist_flat"]                     # (B, Lh)
                vecs = embed(embed_params, flat).astype(_dt(cfg))
                mask = (flat != 0).astype(vecs.dtype)
                outs, _ = masked_lstm(
                    params["hist_lstm"], vecs, mask, impl=impl,
                    dropout_rng=next(rngs),
                    dropout_rate=cfg.dropout if train else 0.0)
                bounds = batch["hist_bounds"]                 # (B, R)
                idx = jnp.clip(bounds - 1, 0, outs.shape[1] - 1)
                h = jnp.take_along_axis(
                    outs, idx[..., None].astype(jnp.int32), axis=1)
                h = jnp.where((bounds > 0)[..., None], h, 0.0)
                h = h.reshape(B * R, -1).astype(q.dtype)
            else:
                h = _run_lstm(params["hist_lstm"], embed_params,
                              _flatten_rounds(batch["hist_concat"]), cfg,
                              train, next(rngs), impl)
            parts.append(h)
        if use_img:
            parts.append(_image_pathway(params, batch, q, cfg, B, R, impl))
        cat = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        if train and rng is not None:
            cat = dropout(next(rngs), cat, cfg.dropout, train)
        return jnp.tanh(linear(params["fusion"], cat))

    # --- history-structured families -----------------------------------
    # Fact embeddings, once per dialog: (B*R slots, Lf) -> (B, R, H)
    facts = _run_lstm(params["fact_lstm"], embed_params,
                      _flatten_rounds(batch["facts"]), cfg, train,
                      next(rngs), impl).reshape(B, R, -1)

    # Query: question (+ image fused in)
    if use_img:
        img = _image_pathway(params, batch, q, cfg, B, R, impl)       # (N, H)
        query = jnp.tanh(linear(params["query_fusion"],
                                jnp.concatenate([q, img], axis=-1)))
    else:
        query = q
    query_r = query.reshape(B, R, -1)

    # Causal slot mask: round t may see fact slots 0..t
    slot = jnp.arange(R)
    valid = (slot[None, :] <= slot[:, None]).astype(facts.dtype)      # (R, R)
    valid = jnp.broadcast_to(valid[None], (B, R, R))

    # Fully-fused inference tail (attention chain + fusion MLP in one VMEM
    # pass — the 'fusion MLP' kernel; forward-only, so eval paths only).
    fused_tail = impl == "pallas" and not train and fam in ("mn", "hrea")

    if fam == "mn":
        if fused_tail:
            from ..ops.attention_pallas import attention_fusion_pallas

            joint = attention_fusion_pallas(
                query_r, facts, valid,
                params["fusion"]["w"], params["fusion"]["b"])
            return joint.reshape(B * R, -1)
        mem = masked_slot_attention(query_r, facts, valid, impl=impl)  # (B,R,H)
        ctx = mem.reshape(B * R, -1)
    else:  # hre / hrea: dialog-level LSTM over fact slots
        all_ones = jnp.ones((B, R), facts.dtype)
        d_outs, _ = masked_lstm(params["dialog_lstm"], facts, all_ones, impl=impl)
        if fam == "hrea":
            if fused_tail:
                from ..ops.attention_pallas import attention_fusion_pallas

                joint = attention_fusion_pallas(
                    query_r, d_outs, valid,
                    params["fusion"]["w"], params["fusion"]["b"])
                return joint.reshape(B * R, -1)
            mem = masked_slot_attention(query_r, d_outs, valid, impl=impl)
            ctx = mem.reshape(B * R, -1)
        else:
            # round t's history representation = dialog state after slot t
            ctx = d_outs.reshape(B * R, -1)

    cat = jnp.concatenate([query, ctx], axis=-1)
    if train and rng is not None:
        cat = dropout(next(rngs), cat, cfg.dropout, train)
    return jnp.tanh(linear(params["fusion"], cat))

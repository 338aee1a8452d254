"""Model assembly: params init, loss, and candidate scoring.

Replaces the reference's Model wrapper (reference: model.lua) minus the
imperative parts: no flat getParameters() (params stay a pytree; optimizers
are tree maps), no forward/backwardConnect mutation (the joint embedding is
passed functionally into the decoder init state).

The word-embedding table is shared across encoder and decoder pathways
(documented decision; see models/encoders.py docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from .core import embedding_init
from .decoders import (
    decoder_init,
    disc_loss,
    disc_option_table,
    disc_scores,
    disc_scores_from_table,
    gen_beam_decode,
    gen_candidate_scores,
    gen_decode,
    gen_loss,
)
from .encoders import encoder_apply, encoder_init


def model_init(rng, cfg: Config) -> dict:
    assert cfg.vocab_size > 1, "set Config.vocab_size from the data artifact"
    k_emb, k_enc, k_dec = jax.random.split(rng, 3)
    return {
        "embed": embedding_init(k_emb, cfg.vocab_size, cfg.embed_size),
        "encoder": encoder_init(k_enc, cfg),
        "decoder": decoder_init(k_dec, cfg),
    }


def _impl(cfg: Config) -> str:
    return "pallas" if cfg.use_pallas and jax.default_backend() == "tpu" else "xla"


def model_loss(params, batch, cfg: Config, *, train=True, rng=None,
               impl: str | None = None) -> jnp.ndarray:
    impl = impl or _impl(cfg)
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)

    def encode(enc_params, embed_params, batch):
        return encoder_apply(enc_params, embed_params, batch, cfg,
                             train=train, rng=enc_rng, impl=impl)

    if cfg.remat and train:
        # Rematerialize the encoder in the backward pass instead of storing
        # its activations (jax.checkpoint): ~1 extra encoder forward buys
        # headroom for much larger batches / longer histories.
        encode = jax.checkpoint(encode)
    joint = encode(params["encoder"], params["embed"], batch)
    if cfg.decoder == "gen":
        return gen_loss(params["decoder"], params["embed"], joint, batch, cfg,
                        train=train, rng=dec_rng, impl=impl)
    return disc_loss(params["decoder"], params["embed"], joint, batch, cfg,
                     train=train, rng=dec_rng, impl=impl)


def model_dense_loss(params, batch, cfg: Config, *, train=True, rng=None,
                     impl: str | None = None) -> jnp.ndarray:
    """v1.0 dense-annotation fine-tuning loss (disc decoder).

    Cross-entropy between the model's 100-way candidate-score softmax and
    the NORMALIZED human gt_relevance of each dialog's densely annotated
    round — the VisDial-v1.0 ecosystem's NDCG-optimization phase (the
    v0.9 reference predates it; protocol per the released
    visdial_1.0_val_dense_annotations.json schema).

    Batch fields beyond the encoder inputs:
      dense_opt   (B, K, La) candidate tokens of the annotated round
      dense_round (B,)       0-indexed annotated round
      dense_rel   (B, K)     raw gt_relevance (normalized here)
      dense_valid (B,)       0/1 — padded rows in the final batch
    """
    assert cfg.decoder == "disc", "dense fine-tuning targets disc scores"
    impl = impl or _impl(cfg)
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)

    def encode(enc_params, embed_params, batch):
        return encoder_apply(enc_params, embed_params, batch, cfg,
                             train=train, rng=enc_rng, impl=impl)

    if cfg.remat and train:
        # same policy as model_loss: rematerialize the encoder backward
        encode = jax.checkpoint(encode)
    joint = encode(params["encoder"], params["embed"], batch)
    B = batch["dense_rel"].shape[0]
    joint = joint.reshape(B, cfg.num_rounds, -1)
    joint_sel = jnp.take_along_axis(
        joint, batch["dense_round"][:, None, None], axis=1)[:, 0]   # (B, H)
    scores = disc_scores(params["decoder"], params["embed"], joint_sel,
                         batch["dense_opt"], cfg, train=train, rng=dec_rng,
                         impl=impl)                                 # (B, K)
    rel = batch["dense_rel"].astype(jnp.float32)
    total = jnp.sum(rel, axis=-1, keepdims=True)
    target = rel / jnp.maximum(total, 1e-9)
    ce = -jnp.sum(target * jax.nn.log_softmax(scores, axis=-1), axis=-1)
    v = (batch["dense_valid"].astype(jnp.float32)
         * (total[:, 0] > 0).astype(jnp.float32))
    return jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)


def model_scores(params, batch, cfg: Config, *, impl: str | None = None):
    """Candidate scores for retrieval eval: (B, R, K)."""
    impl = impl or _impl(cfg)
    joint = encoder_apply(params["encoder"], params["embed"], batch, cfg,
                          train=False, rng=None, impl=impl)
    N = joint.shape[0]
    K = cfg.num_options
    if cfg.decoder == "gen":
        scores = gen_candidate_scores(
            params["decoder"], params["embed"], joint,
            batch["opt_in"].reshape(N, K, -1),
            batch["opt_out"].reshape(N, K, -1), cfg, impl=impl)
    else:
        scores = disc_scores(params["decoder"], params["embed"], joint,
                             batch["opt"].reshape(N, K, -1), cfg, impl=impl)
    B = batch["ques"].shape[0]
    return scores.reshape(B, cfg.num_rounds, K)


def model_option_table(params, opt_list, cfg: Config, *, impl: str | None = None):
    """Embed the split's deduplicated option list once: (M, La) -> (M, H).
    Disc-decoder eval fast path (see decoders.disc_option_table)."""
    assert cfg.decoder == "disc"
    impl = impl or _impl(cfg)
    return disc_option_table(params["decoder"], params["embed"], opt_list,
                             cfg, impl=impl)


def model_scores_with_table(params, batch, table, cfg: Config, *,
                            impl: str | None = None):
    """Candidate scores via the precomputed option-embedding table:
    encoder forward + one gather + one batched dot per batch."""
    impl = impl or _impl(cfg)
    joint = encoder_apply(params["encoder"], params["embed"], batch, cfg,
                          train=False, rng=None, impl=impl)
    N = joint.shape[0]
    K = cfg.num_options
    scores = disc_scores_from_table(joint, table,
                                    batch["opt_inds"].reshape(N, K))
    B = batch["ques"].shape[0]
    return scores.reshape(B, cfg.num_rounds, K)


def model_generate(params, batch, cfg: Config, *, start_token: int,
                   end_token: int, greedy: bool = True, rng=None,
                   temperature: float = 1.0, beam_size: int = 0,
                   impl: str | None = None):
    """Decode answers for every (dialog, round): returns tokens (B, R, La)
    and summed log-probs (B, R).  Gen decoder only (reference: generate.lua
    loads gen checkpoints).  beam_size > 1 switches to beam search
    (reference -beamSize); otherwise greedy/sampling per `greedy`."""
    assert cfg.decoder == "gen", "generation requires the gen decoder"
    impl = impl or _impl(cfg)
    joint = encoder_apply(params["encoder"], params["embed"], batch, cfg,
                          train=False, rng=None, impl=impl)
    if beam_size and beam_size > 1:
        toks, logp = gen_beam_decode(
            params["decoder"], params["embed"], joint, cfg,
            start_token=start_token, end_token=end_token,
            beam_size=beam_size)
    else:
        toks, logp = gen_decode(
            params["decoder"], params["embed"], joint, cfg,
            start_token=start_token, end_token=end_token,
            greedy=greedy, rng=rng, temperature=temperature)
    B = batch["ques"].shape[0]
    return (toks.reshape(B, cfg.num_rounds, -1),
            logp.reshape(B, cfg.num_rounds))

"""Every encoder x decoder combination in the reference's 9x2 matrix
(reference: encoders/*.lua x decoders/{gen,disc}.lua) trains one step and
scores candidates end-to-end."""

import jax
import numpy as np
import pytest

from visdial_tpu.config import DECODERS, ENCODERS
from visdial_tpu.data.loader import BatchAssembler, EvalLoader
from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state,
    make_eval_fn,
    make_train_fn,
)
from tests.conftest import encoder_params, small_config


@pytest.mark.parametrize("encoder", encoder_params(ENCODERS))
@pytest.mark.parametrize("decoder", DECODERS)
def test_combo_trains_and_scores(encoder, decoder):
    cfg = small_config(encoder=encoder, decoder=decoder, batch_size=4,
                       embed_size=8, rnn_hidden_size=16, img_feat_size=16,
                       num_rounds=3, num_options=5,
                       max_ques_len=4, max_ans_len=3, max_cap_len=5)
    split, vocab = make_synthetic_split(cfg, num_dialogs=4, seed=1)
    cfg = cfg.replace(vocab_size=vocab.size)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])

    state = init_train_state(cfg)
    fn = make_train_fn(cfg, mesh)
    loader = BatchAssembler(split, vocab, cfg)
    batch = loader.assemble(np.arange(4),
                            with_options=cfg.decoder == "disc").as_dict()
    state, m = fn(state, shard_batch(batch, mesh))
    assert np.isfinite(float(m["loss"])), (encoder, decoder)

    eval_fn = make_eval_fn(cfg, mesh)
    ebatch = next(iter(EvalLoader(split, vocab, cfg, batch_size=4)))
    scores = eval_fn(state.params, shard_batch(ebatch.as_dict(), mesh))
    s = np.asarray(scores)
    assert s.shape == (4, cfg.num_rounds, cfg.num_options)
    assert np.isfinite(s).all(), (encoder, decoder)

"""Multi-chip-without-a-cluster tests (SURVEY.md §4 item 5): run the jitted
train/eval steps over an 8-virtual-device CPU mesh and assert the results
match the single-device run to fp tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visdial_tpu.data.loader import BatchAssembler
from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state,
    make_eval_fn,
    make_train_fn,
)
from tests.conftest import small_config


@pytest.fixture(scope="module")
def setup():
    cfg = small_config(encoder="lf-ques-im-hist", decoder="disc", batch_size=8)
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=3)
    cfg = cfg.replace(vocab_size=vocab.size)
    asm = BatchAssembler(split, vocab, cfg)
    batch = asm.assemble(np.arange(8)).as_dict()
    return cfg, batch, split


def test_eight_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


def test_sharded_train_step_matches_single_device(setup):
    cfg, batch, _ = setup
    mesh8 = make_mesh(data=8, model=1)
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])

    state8 = init_train_state(cfg)
    state1 = init_train_state(cfg)
    fn8 = make_train_fn(cfg, mesh8)
    fn1 = make_train_fn(cfg, mesh1)
    for _ in range(3):
        state8, m8 = fn8(state8, shard_batch(batch, mesh8))
        state1, m1 = fn1(state1, shard_batch(batch, mesh1))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state8.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_multistep_dispatch_matches_sequential(setup):
    """G steps through make_multistep_train_fn (stacked batches, on-device
    scan) == the same G batches through the per-step train fn — losses and
    final params, on the 8-device mesh."""
    from visdial_tpu.parallel.mesh import shard_batch_stack
    from visdial_tpu.parallel.train_step import make_multistep_train_fn

    cfg, batch, split = setup
    mesh = make_mesh(data=8, model=1)
    batches = [batch,
               {k: np.roll(v, 1, axis=0) for k, v in batch.items()},
               batch]

    state_m = init_train_state(cfg)
    multi_fn = make_multistep_train_fn(cfg, mesh)
    state_m, m = multi_fn(state_m, shard_batch_stack(batches, mesh))
    assert np.asarray(m["loss"]).shape == (3,)

    state_s = init_train_state(cfg)
    fn = make_train_fn(cfg, mesh)
    losses = []
    for b in batches:
        state_s, ms = fn(state_s, shard_batch(b, mesh))
        losses.append(float(ms["loss"]))
    np.testing.assert_allclose(np.asarray(m["loss"]), losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_m.params),
                    jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dedup_train_step_matches_plain_and_shards(setup):
    """The dedup'd disc train path (opt_uniq + opt_row gather) must land on
    the plain expanded-options path's loss/params (exact math, fp-order
    tolerance on accumulated duplicate-row grads), and the cross-shard
    gather of unique-row embeddings must match the single-device run."""
    cfg, _, split = setup
    # rebuild an assembler to get both layouts of the SAME batch
    from visdial_tpu.data.synthetic import synthetic_vocab

    asm = BatchAssembler(split, synthetic_vocab(), cfg)
    idx = np.arange(8)
    plain = asm.assemble(idx).as_dict()
    dd = asm.assemble(idx, dedup_options=True).as_dict()

    mesh8 = make_mesh(data=8, model=1)
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    outs = {}
    for name, (mesh, batch) in {
        "plain1": (mesh1, plain), "dd1": (mesh1, dd), "dd8": (mesh8, dd),
    }.items():
        state = init_train_state(cfg)
        fn = make_train_fn(cfg, mesh)
        for _ in range(2):
            state, m = fn(state, shard_batch(batch, mesh))
        outs[name] = (float(m["loss"]), state.params)
    for other in ("dd1", "dd8"):
        np.testing.assert_allclose(outs[other][0], outs["plain1"][0],
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(outs[other][1]),
                        jax.tree.leaves(outs["plain1"][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_sharded_eval_matches_single_device(setup):
    cfg, batch, _ = setup
    mesh8 = make_mesh(data=8, model=1)
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state = init_train_state(cfg)
    s8 = make_eval_fn(cfg, mesh8)(state.params, shard_batch(batch, mesh8))
    s1 = make_eval_fn(cfg, mesh1)(state.params, shard_batch(batch, mesh1))
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), atol=1e-4)


def test_batch_sharding_layout(setup):
    cfg, batch, _ = setup
    mesh8 = make_mesh(data=8, model=1)
    sharded = shard_batch(batch, mesh8)
    for k, v in sharded.items():
        shard_shapes = {s.data.shape for s in v.addressable_shards}
        assert len(shard_shapes) == 1
        per_dev = next(iter(shard_shapes))
        assert per_dev[0] == v.shape[0] // 8, (k, per_dev, v.shape)


@pytest.mark.parametrize("encoder,decoder,mesh_shape,vocab_words", [
    # attention (MN) path, pure data parallelism
    pytest.param("mn-ques-im-hist", "disc", (8, 1), 50),
    # attention + vocab-sharded embed/out_proj, with a vocab size NOT
    # divisible by the model axis (XLA handles the ragged shard)
    pytest.param("mn-ques-im-hist", "gen", (4, 2), 47,
                 marks=pytest.mark.slow),
    # HRE dialog-level RNN family on the mesh
    pytest.param("hre-ques-im-hist", "gen", (4, 2), 50,
                 marks=pytest.mark.slow),
])
def test_sharded_matches_single_device_matrix(encoder, decoder, mesh_shape,
                                              vocab_words):
    """Every encoder family (LF above, MN attention, HRE) and the gen
    decoder's vocab-sharded output projection must produce single-device
    math on the mesh (VERDICT r1 weak #6)."""
    from visdial_tpu.data.synthetic import synthetic_vocab
    from visdial_tpu.parallel.train_step import shard_train_state

    vocab = synthetic_vocab(vocab_words)
    cfg = small_config(encoder=encoder, decoder=decoder, batch_size=8)
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=3,
                                        vocab=vocab)
    cfg = cfg.replace(vocab_size=vocab.size)
    if mesh_shape[1] > 1:
        assert cfg.vocab_size % mesh_shape[1] != 0 or vocab_words == 50
    batch = BatchAssembler(split, vocab, cfg).assemble(
        np.arange(8), with_options=True,
        with_gen_options=(decoder == "gen")).as_dict()

    meshN = make_mesh(*mesh_shape)
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    stateN = shard_train_state(init_train_state(cfg), cfg, meshN)
    state1 = init_train_state(cfg)
    fnN, fn1 = make_train_fn(cfg, meshN), make_train_fn(cfg, mesh1)
    for _ in range(3):
        stateN, mN = fnN(stateN, shard_batch(batch, meshN))
        state1, m1 = fn1(state1, shard_batch(batch, mesh1))
    np.testing.assert_allclose(float(mN["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(stateN.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    sN = make_eval_fn(cfg, meshN)(stateN.params, shard_batch(batch, meshN))
    s1 = make_eval_fn(cfg, mesh1)(state1.params, shard_batch(batch, mesh1))
    np.testing.assert_allclose(np.asarray(sN), np.asarray(s1), atol=1e-4)


def test_table_eval_matches_direct_on_mesh(setup):
    """Disc table-path scoring over the 8-device mesh == direct scoring."""
    from visdial_tpu.data.synthetic import make_synthetic_split
    from visdial_tpu.parallel.train_step import make_disc_table_eval_fns

    cfg, batch, _ = setup
    split, vocab = make_synthetic_split(
        small_config(encoder="lf-ques-im-hist", decoder="disc", batch_size=8),
        num_dialogs=8, seed=3)
    mesh8 = make_mesh(data=8, model=1)
    state = init_train_state(cfg)
    direct = make_eval_fn(cfg, mesh8)(state.params, shard_batch(batch, mesh8))
    table_fn, score_fn = make_disc_table_eval_fns(cfg, mesh8)
    table = table_fn(state.params, jnp.asarray(split.opt_list))
    via = score_fn(state.params, table, shard_batch(batch, mesh8))
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via), atol=1e-4)

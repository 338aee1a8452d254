"""Checkpoint/resume (SURVEY.md §5: FULL state round trip — the reference's
torch.save kept only weights, so it could not truly resume) and the 2-axis
(data, model) mesh with vocab-sharded parameters."""

import jax
import numpy as np
import pytest

from visdial_tpu.data.synthetic import make_synthetic_split, random_batch
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state,
    make_train_fn,
    shard_train_state,
)
from visdial_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from tests.conftest import small_config, tree_allclose


def _cfg():
    return small_config(encoder="lf-ques-im", decoder="disc", batch_size=8,
                        vocab_size=64)


def test_checkpoint_roundtrip_full_state(tmp_path):
    cfg = _cfg()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state = init_train_state(cfg)
    fn = make_train_fn(cfg, mesh)
    batch = shard_batch(random_batch(cfg, seed=0), mesh)
    for _ in range(3):
        state, m = fn(state, batch)

    path = save_checkpoint(str(tmp_path), state, cfg)
    assert latest_checkpoint(str(tmp_path)) == path
    state2, cfg2, _ = load_checkpoint(path)

    assert cfg2 == cfg
    assert int(np.asarray(state2.opt.step)) == 3
    tree_allclose(state.params, state2.params, atol=0)
    tree_allclose(state.opt.m, state2.opt.m, atol=0)
    tree_allclose(state.opt.v, state2.opt.v, atol=0)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(state.rng)),
                                  np.asarray(jax.random.key_data(state2.rng)))


def _saved_checkpoint(tmp_path):
    cfg = _cfg()
    state = init_train_state(cfg)
    return save_checkpoint(str(tmp_path), state, cfg), cfg


def test_truncated_npz_fails_loudly(tmp_path):
    """A torn/corrupted params file must raise, never load garbage.  (The
    atomic tmp-dir+rename write makes torn checkpoints near-impossible in
    normal operation; this pins the failure mode for disk corruption.)"""
    import os

    path, _ = _saved_checkpoint(tmp_path)
    f = os.path.join(path, "params.npz")
    with open(f, "r+b") as fh:
        fh.truncate(os.path.getsize(f) // 2)
    with pytest.raises(Exception):
        load_checkpoint(path)


def test_missing_array_fails_with_named_key(tmp_path):
    """An npz that lost an array (foreign/hand-edited checkpoint) names the
    missing parameter instead of KeyError-ing opaquely."""
    import os

    path, _ = _saved_checkpoint(tmp_path)
    f = os.path.join(path, "params.npz")
    with np.load(f) as z:
        d = dict(z)
    dropped = sorted(d)[0]
    del d[dropped]
    np.savez(f, **d)
    with pytest.raises(ValueError, match="missing array"):
        load_checkpoint(path)


def test_shape_mismatch_fails_with_named_key(tmp_path):
    """Arrays that disagree with the embedded config (edited meta.json,
    mixed-up files) are rejected by name, not silently reshaped."""
    import os

    path, _ = _saved_checkpoint(tmp_path)
    f = os.path.join(path, "params.npz")
    with np.load(f) as z:
        d = dict(z)
    k = sorted(d)[0]
    d[k] = np.zeros(np.asarray(d[k]).size + 1, np.float32)
    np.savez(f, **d)
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path)


@pytest.mark.slow
def test_resume_continues_identically(tmp_path):
    """Train 6 steps straight vs 3 steps -> checkpoint -> 3 more: identical
    parameters (deterministic resume is the recovery story, SURVEY.md §5)."""
    cfg = _cfg()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    fn = make_train_fn(cfg, mesh)
    batch = shard_batch(random_batch(cfg, seed=0), mesh)

    state_a = init_train_state(cfg)
    for _ in range(6):
        state_a, _ = fn(state_a, batch)

    state_b = init_train_state(cfg)
    for _ in range(3):
        state_b, _ = fn(state_b, batch)
    path = save_checkpoint(str(tmp_path), state_b, cfg)
    state_b2, _, _ = load_checkpoint(path)
    for _ in range(3):
        state_b2, _ = fn(state_b2, batch)

    tree_allclose(state_a.params, state_b2.params, atol=1e-6)


@pytest.mark.slow
def test_two_axis_mesh_matches_data_parallel():
    """(data=4, model=2) with the vocab-sharded parameter layout produces
    the same step as (data=8, model=1)."""
    cfg = small_config(encoder="lf-ques-hist", decoder="gen", batch_size=8,
                       vocab_size=64)
    batch = random_batch(cfg, seed=1)

    results = []
    for data, model in ((8, 1), (4, 2)):
        mesh = make_mesh(data=data, model=model)
        state = shard_train_state(init_train_state(cfg), cfg, mesh)
        fn = make_train_fn(cfg, mesh)
        for _ in range(2):
            state, m = fn(state, shard_batch(batch, mesh))
        results.append((float(m["loss"]), state.params))

    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    tree_allclose(p1, p2, atol=1e-5)

"""Device-resident disc eval == the streaming harness, bit-for-bit ranks.

The resident path (eval_harness._ResidentDiscEval) stages the whole split
on device and scores it in one jitted lax.scan dispatch; it must produce
exactly the metrics of the streaming table path (same math, different
staging), reuse its cache across calls, and fall back to streaming when
the stacks exceed the byte cap.
"""

import numpy as np

import jax

from conftest import small_config

from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.eval_harness import evaluate_split
from visdial_tpu.parallel.mesh import make_mesh
from visdial_tpu.parallel.train_step import init_train_state

METRIC_KEYS = ("mrr", "r@1", "r@5", "r@10", "mean_rank", "num_examples")


def _setup(encoder, num_dialogs=20, batch_size=8, data=8, model=1):
    cfg = small_config(encoder=encoder, decoder="disc",
                       batch_size=batch_size)
    split, vocab = make_synthetic_split(cfg, num_dialogs=num_dialogs, seed=5)
    cfg = cfg.replace(vocab_size=vocab.size)
    n = data * model
    mesh = make_mesh(data=data, model=model, devices=jax.devices()[:n])
    return init_train_state(cfg).params, split, vocab, cfg, mesh


def test_resident_matches_streaming_on_mesh():
    params, split, vocab, cfg, mesh = _setup("mn-ques-im-hist")
    streamed = evaluate_split(params, split, vocab, cfg, mesh)
    res = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    assert "resident_cache_seconds" in res
    for k in METRIC_KEYS:
        assert np.isclose(res[k], streamed[k], atol=1e-9), k
    # second call reuses the cached stacks/program (no rebuild)
    again = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    assert again["resident_cache_seconds"] == res["resident_cache_seconds"]
    assert np.isclose(again["mrr"], res["mrr"], atol=1e-9)


def test_resident_lf_incremental_history_path():
    params, split, vocab, cfg, mesh = _setup("lf-ques-im-hist",
                                             data=1, batch_size=4)
    streamed = evaluate_split(params, split, vocab, cfg, mesh)
    res = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    for k in METRIC_KEYS:
        assert np.isclose(res[k], streamed[k], atol=1e-9), k


def test_resident_byte_cap_falls_back_to_streaming():
    params, split, vocab, cfg, mesh = _setup("lf-ques-hist",
                                             data=1, batch_size=4)
    res = evaluate_split(params, split, vocab, cfg, mesh, resident=True,
                         resident_max_bytes=16)
    assert "resident_cache_seconds" not in res       # streamed
    assert res["num_examples"] == 20 * cfg.num_rounds
    # a later call with a workable cap must NOT inherit the failed build
    # (the cache key includes max_bytes)
    res2 = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    assert "resident_cache_seconds" in res2
    assert np.isclose(res2["mrr"], res["mrr"], atol=1e-9)


def test_gen_resident_matches_streaming():
    """Gen resident path (bucketed scan, on-device candidates) == the
    streaming bucketed harness, which itself equals the direct path
    (tests/test_gen_bucketed.py)."""
    cfg = small_config(encoder="mn-ques-im-hist", decoder="gen",
                       batch_size=8)
    split, vocab = make_synthetic_split(cfg, num_dialogs=20, seed=7)
    cfg = cfg.replace(vocab_size=vocab.size)
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    params = init_train_state(cfg).params

    streamed = evaluate_split(params, split, vocab, cfg, mesh)
    res = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    assert "resident_cache_seconds" in res
    for k in METRIC_KEYS:
        assert np.isclose(res[k], streamed[k], atol=1e-6), k
    again = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    assert again["resident_cache_seconds"] == res["resident_cache_seconds"]


def test_resident_collect_rankings_matches_streaming():
    """resident + collect_rankings returns the identical (N, R, K) full
    permutations the streaming path collects per batch."""
    params, split, vocab, cfg, mesh = _setup("lf-ques-hist",
                                             data=1, batch_size=8)
    m1, c1 = evaluate_split(params, split, vocab, cfg, mesh,
                            collect_rankings=True)
    m2, c2 = evaluate_split(params, split, vocab, cfg, mesh,
                            collect_rankings=True, resident=True)
    assert "resident_cache_seconds" in m2
    np.testing.assert_array_equal(c1, c2)
    assert np.isclose(m1["mrr"], m2["mrr"], atol=1e-9)


def test_resident_on_two_axis_mesh_with_model_axis():
    """Resident disc eval over a (4,2) mesh — the vocab-sharded table and
    embedding rules active inside the scan — still matches streaming."""
    params, split, vocab, cfg, mesh = _setup("mn-ques-im-hist",
                                             data=4, model=2, batch_size=8)
    streamed = evaluate_split(params, split, vocab, cfg, mesh)
    res = evaluate_split(params, split, vocab, cfg, mesh, resident=True)
    assert "resident_cache_seconds" in res
    for k in METRIC_KEYS:
        assert np.isclose(res[k], streamed[k], atol=1e-9), k


def test_eval_any_batch_size_on_mesh():
    """The eval surfaces stay usable at ANY batch size on a multi-device
    mesh (mesh.shard_batch's documented degrade): a dialog count NOT
    divisible by the data axis replicates instead of tripping pjit's
    divisibility ValueError, in both the streaming and resident paths,
    and the metrics equal the divisible-batch run exactly."""
    params, split, vocab, cfg, mesh = _setup("mn-ques-im-hist",
                                             batch_size=8, data=8)
    ref = evaluate_split(params, split, vocab, cfg, mesh)
    odd = cfg.replace(batch_size=6)        # 6 % 8 != 0 -> replicated
    for resident in (False, True):
        got = evaluate_split(params, split, vocab, odd, mesh,
                             resident=resident, batch_size=6)
        for k in METRIC_KEYS:
            assert np.isclose(got[k], ref[k], atol=1e-9), (resident, k)


def test_gen_eval_any_batch_size_on_mesh():
    """Same degrade for the gen harness (encoder fn + resident stacks)."""
    cfg = small_config(encoder="lf-ques-im-hist", decoder="gen",
                       batch_size=8)
    split, vocab = make_synthetic_split(cfg, num_dialogs=12, seed=9)
    cfg = cfg.replace(vocab_size=vocab.size)
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    params = init_train_state(cfg).params
    ref = evaluate_split(params, split, vocab, cfg, mesh)
    odd = cfg.replace(batch_size=6)
    for resident in (False, True):
        got = evaluate_split(params, split, vocab, odd, mesh,
                             resident=resident, batch_size=6)
        for k in METRIC_KEYS:
            assert np.isclose(got[k], ref[k], atol=1e-9), (resident, k)

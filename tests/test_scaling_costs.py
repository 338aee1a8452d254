"""Compiler-level scaling evidence for the sharded train step.

The sharding tests (tests/test_sharding.py) prove the mesh programs are
CORRECT (sharded == single-device to fp tolerance); this file proves they
actually PARALLELIZE: XLA's post-SPMD-partitioning cost model
(`compiled.cost_analysis()["flops"]`) reports PER-DEVICE flops, so the
batch-proportional work of a data-parallel train step must divide by the
'data' axis size, with only the replicated tail (optimizer update on
replicated params, gradient all-reduce) as a constant floor.

Replaces: nothing in the reference — the reference is single-GPU
(SURVEY.md §2c: no multi-GPU support in train.lua); this pins the
TPU-native DP/TP design's compiler-visible work division (SURVEY.md §4
item 5, docs/SCALING.md).

Measured on this jax/XLA (small_config, batch 8): disc 1-dev 24.2 MF →
8-dev DP 3.53 MF (6.87x), (4,2) DP x TP 6.52 MF (3.72x); gen 6.30 MF →
1.31 MF (4.81x) / 1.86 MF (3.39x).  Bounds below leave margin for cost-
model drift across jax versions while still failing on any real
regression (e.g. an accidentally replicated batch would read ~1x).
"""

import jax
import numpy as np
import pytest

from visdial_tpu.data.loader import BatchAssembler
from visdial_tpu.data.synthetic import make_synthetic_split
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state,
    make_eval_fn,
    make_train_fn,
    shard_train_state,
)
from tests.conftest import small_config


def _per_device_flops(cfg, batch, data: int, model: int) -> float:
    mesh = make_mesh(data=data, model=model,
                     devices=jax.devices()[: data * model])
    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    b = shard_batch(batch, mesh)
    compiled = make_train_fn(cfg, mesh).lower(state, b).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


@pytest.mark.slow  # 6 mesh compiles, ~75 s on the 1-CPU host
@pytest.mark.parametrize("decoder,dp8_min,dp4tp2_min", [
    ("disc", 3.5, 2.5),
    ("gen", 3.5, 2.5),
])
def test_train_step_flops_divide_across_mesh(decoder, dp8_min, dp4tp2_min):
    cfg = small_config(encoder="lf-ques-im-hist", decoder=decoder,
                       batch_size=8)
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=3)
    cfg = cfg.replace(vocab_size=vocab.size)
    batch = BatchAssembler(split, vocab, cfg).assemble(np.arange(8)).as_dict()

    f1 = _per_device_flops(cfg, batch, 1, 1)
    f_dp8 = _per_device_flops(cfg, batch, 8, 1)
    f_dp4tp2 = _per_device_flops(cfg, batch, 4, 2)

    # Real work division (an accidentally replicated batch would be ~1x).
    assert f1 / f_dp8 >= dp8_min, (f1, f_dp8)
    assert f1 / f_dp4tp2 >= dp4tp2_min, (f1, f_dp4tp2)
    # Sanity: per-device work cannot beat perfect scaling by more than
    # cost-model slack — a reading far below 1/8 means the cost model (or
    # the lowering) changed out from under this test.
    assert f_dp8 >= f1 / 8 * 0.9, (f1, f_dp8)


@pytest.mark.slow  # mesh compiles, ~30 s on the 1-CPU host
def test_eval_scores_flops_divide_across_mesh():
    """The batch-scoring eval fn has no replicated optimizer tail, so its
    per-device flops divide ~perfectly by the data axis (measured 8.0x)."""
    cfg = small_config(encoder="lf-ques-im-hist", decoder="disc",
                       batch_size=8)
    split, vocab = make_synthetic_split(cfg, num_dialogs=8, seed=3)
    cfg = cfg.replace(vocab_size=vocab.size)
    batch = BatchAssembler(split, vocab, cfg).assemble(np.arange(8)).as_dict()

    flops = {}
    for ndev in (1, 8):
        mesh = make_mesh(data=ndev, model=1, devices=jax.devices()[:ndev])
        params = shard_train_state(init_train_state(cfg), cfg, mesh).params
        b = shard_batch(batch, mesh)
        compiled = make_eval_fn(cfg, mesh).lower(params, b).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops[ndev] = float(ca["flops"])
    assert flops[1] / flops[8] >= 6.0, flops
    assert flops[8] >= flops[1] / 8 * 0.9, flops

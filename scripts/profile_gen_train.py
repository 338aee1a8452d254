"""Micro-benchmark: where does the gen train step's time go?

Times (on the real chip, host-readback-synced):
  A. full gen train step (current materialized-logits loss)
  B. gen train step with the LM head removed (loss = masked mean of outs)
  C. head-only fwd+bwd at flagship shapes, materialized f32 logits
  D. head-only fwd+bwd, chunked-XLA custom-vjp fused loss (if present)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from visdial_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import flagship_config
from visdial_tpu.data.synthetic import random_batch
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state, make_train_fn, shard_train_state, train_step,
)


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / steps


def main():
    cfg = flagship_config(decoder="gen")
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    mesh = make_mesh()
    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    batch = shard_batch(random_batch(cfg, seed=0), mesh)

    # A: full step
    fn = make_train_fn(cfg, mesh)
    def step_a(state, batch):
        s, m = fn(state, batch)
        return m["loss"]
    # keep state fixed: donation means we must clone; simpler: re-jit without donation
    from functools import partial
    fn_nodonate = jax.jit(partial(train_step, cfg=cfg))
    for rep in range(3):
        dt = timeit(lambda: fn_nodonate(state, batch)[1]["loss"], steps=50)
        print(f"A full gen train step: {dt*1e3:.2f} ms "
              f"({cfg.batch_size*cfg.num_rounds/dt:.0f} rounds/s)")

    # B: no-head step (loss from LSTM outs directly)
    from visdial_tpu.models.encoders import encoder_apply
    from visdial_tpu.models.decoders import _joint_to_state
    from visdial_tpu.models.core import embed
    from visdial_tpu.ops.lstm import masked_lstm
    from visdial_tpu.models.model import _impl

    impl = _impl(cfg)
    print("impl:", impl)

    def nohead_loss(params, batch, cfg, train=True, rng=None, impl=impl):
        enc_rng, dec_rng = jax.random.split(rng)
        joint = encoder_apply(params["encoder"], params["embed"], batch, cfg,
                              train=train, rng=enc_rng, impl=impl)
        N = joint.shape[0]
        tokens_in = batch["ans_in"].reshape(N, -1)
        vecs = embed(params["embed"], tokens_in).astype(jnp.dtype(cfg.compute_dtype))
        mask = (tokens_in != 0).astype(vecs.dtype)
        h0, c0 = _joint_to_state(joint.astype(vecs.dtype), cfg.num_layers)
        outs, _ = masked_lstm(params["decoder"]["lm_lstm"], vecs, mask, h0, c0,
                              impl=impl, dropout_rng=dec_rng,
                              dropout_rate=cfg.dropout if train else 0.0)
        return jnp.sum(outs.astype(jnp.float32) ** 2) / outs.size

    fn_b = jax.jit(partial(train_step, cfg=cfg, loss_fn=nohead_loss))
    for rep in range(3):
        dt_b = timeit(lambda: fn_b(state, batch)[1]["loss"], steps=50)
        print(f"B no-head gen train step: {dt_b*1e3:.2f} ms")

    # C: head-only fwd+bwd, materialized logits
    from visdial_tpu.models.decoders import masked_nll
    N = cfg.batch_size * cfg.num_rounds
    T = cfg.max_ans_len + 1
    H, V = cfg.rnn_hidden_size, cfg.vocab_size
    key = jax.random.PRNGKey(0)
    outs = jax.random.normal(key, (N, T, H), jnp.bfloat16)
    tgt = jax.random.randint(key, (N, T), 0, V)
    w = jax.random.normal(key, (H, V), jnp.float32) * 0.02
    b = jnp.zeros((V,), jnp.float32)

    def head_loss(w, b, outs):
        logits = (jnp.dot(outs.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) + b)
        return masked_nll(logits, tgt)

    g_c = jax.jit(jax.value_and_grad(head_loss, argnums=(0, 1, 2)))
    for rep in range(3):
        dt_c = timeit(lambda: g_c(w, b, outs)[0], steps=50)
        print(f"C head-only fwd+bwd (materialized): {dt_c*1e3:.2f} ms")

    # D: fused, if available
    try:
        from visdial_tpu.ops.lm_loss import masked_nll_fused
        def head_loss_f(w, b, outs):
            return masked_nll_fused(outs, w, b, tgt)
        g_d = jax.jit(jax.value_and_grad(head_loss_f, argnums=(0, 1, 2)))
        dt_d = timeit(lambda: g_d(w, b, outs)[0])
        print(f"D head-only fwd+bwd (fused): {dt_d*1e3:.2f} ms")
    except ImportError:
        print("D fused loss not built yet")


if __name__ == "__main__":
    main()

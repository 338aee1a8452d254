"""Micro-benchmark: decompose the fused-LSTM backward cost (round-4).

The round-3 backward runs dgp through the fused Pallas kernel but leaves
the dW/dx contractions as full padded-width (N*T) XLA matmuls — at
realistic VisDial lengths ~2/3 of that contraction work is over all-zero
pad rows (VERDICT round 3, Weak #2 / Next #1).  Before building a bounded
contraction kernel, measure the share (on the real chip,
host-readback-synced):

  A. full flagship disc train step (context)           max + realistic
  B. option-LSTM layer: fused bwd kernel (dgp) alone   max + realistic
  C. option-LSTM layer: the three dW/dx XLA matmuls    (length-independent)
  D. fwd kernel alone (context)
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

from functools import partial

from bench import flagship_config
from visdial_tpu.data.synthetic import random_batch
from visdial_tpu.ops import lstm_pallas as lp
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state, shard_train_state, train_step,
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


def sorted_mask(N, T, realistic, seed=0):
    """Right-aligned mask at descending-sorted lengths (what the kernels
    see after the counting sort)."""
    rng = np.random.default_rng(seed)
    lens = (rng.integers(1, T + 1, N) if realistic
            else np.full(N, T))
    lens = np.sort(lens)[::-1].copy()
    m = (np.arange(T)[None, :] >= (T - lens)[:, None]).astype(np.float32)
    return jnp.asarray(m)


def main():
    cfg = flagship_config()           # MN-QIH-disc, bf16, pallas
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    mesh = make_mesh()
    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    fn = jax.jit(partial(train_step, cfg=cfg))

    for realistic in (False, True):
        batch = shard_batch(
            random_batch(cfg, seed=0, full_lengths=not realistic), mesh)
        dt = timeit(lambda: fn(state, batch)[1]["loss"], steps=30)
        print(f"A disc train step ({'realistic' if realistic else 'max'}): "
              f"{dt*1e3:.2f} ms "
              f"({cfg.batch_size*cfg.num_rounds/dt:.0f} rounds/s)")

    # option-LSTM layer shapes (the dominant bwd cost): N = B*R*K rows
    N = cfg.batch_size * cfg.num_rounds * cfg.num_options
    T = cfg.max_ans_len
    H = cfg.rnn_hidden_size
    key = jax.random.PRNGKey(0)
    for E, name in ((cfg.embed_size, "layer1 E=300"), (H, "layer2 E=512")):
        w = jax.random.normal(key, (E + H, 4 * H), jnp.float32) * 0.05
        b = jnp.zeros((4 * H,), jnp.float32)
        x = jax.random.normal(key, (N, T, E), jnp.bfloat16)
        hp = jax.random.normal(key, (N, T, H), jnp.bfloat16)
        cp = jax.random.normal(key, (N, T, H), jnp.bfloat16)
        ghs = jax.random.normal(key, (N, T, H), jnp.bfloat16)
        ght = jax.random.normal(key, (N, H), jnp.float32)
        gct = jnp.zeros((N, H), jnp.float32)

        # every timed fn returns ONE scalar: syncing on a full-size output
        # would time the ~30 MB/s tunnel readback, not the kernel
        def scalarize(f):
            return jax.jit(lambda *a: sum(jnp.sum(o.astype(jnp.float32))
                                          for o in jax.tree.leaves(f(*a))))

        bwd = scalarize(lambda w, b, x, m, hp, cp, ghs, ght, gct:
                        lp.lstm_layer_bwd_pallas(w, b, x, m, hp, cp,
                                                 ghs, ght, gct))
        for realistic in (False, True):
            mask = sorted_mask(N, T, realistic)
            dt = timeit(bwd, w, b, x, mask, hp, cp, ghs, ght, gct)
            tag = "realistic" if realistic else "max"
            print(f"B bwd dgp kernel {name} ({tag}): {dt*1e3:.2f} ms")

        dgp = jax.random.normal(key, (N, T, 4 * H), jnp.bfloat16)

        def mats(w, x, hp, dgp):
            f32 = jnp.float32
            dgp_flat = dgp.reshape(N * T, 4 * H)
            wx = w[:E].astype(jnp.bfloat16)
            dwx = jnp.dot(x.reshape(N * T, E).T, dgp_flat,
                          preferred_element_type=f32)
            dwh = jnp.dot(hp.reshape(N * T, H).T, dgp_flat,
                          preferred_element_type=f32)
            db = jnp.sum(dgp, axis=(0, 1), dtype=f32)
            dx = jnp.dot(dgp_flat, wx.T, preferred_element_type=f32)
            return dwx, dwh, db, dx.astype(jnp.bfloat16)

        dt = timeit(scalarize(mats), w, x, hp, dgp)
        print(f"C dW/dx XLA matmuls {name}: {dt*1e3:.2f} ms")

        fwd = scalarize(lambda w, b, x, m: lp.lstm_layer_pallas(
            w, b, x, m, jnp.zeros((N, H), jnp.float32),
            jnp.zeros((N, H), jnp.float32), save_cell=True))
        for realistic in (False, True):
            mask = sorted_mask(N, T, realistic)
            dt = timeit(fwd, w, b, x, mask)
            tag = "realistic" if realistic else "max"
            print(f"D fwd kernel {name} ({tag}): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()

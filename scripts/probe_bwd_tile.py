"""Probe: does the fused LSTM backward go faster with bigger batch tiles?

_pick_tile charges a conservative VMEM stack estimate, landing the bwd
kernel at TB=136 for flagship option-LSTM shapes -> 1888 grid steps at
~10 us each (floor-bound; compute is ~7 us).  Try overridden TBs and let
Mosaic tell us when VMEM actually runs out.
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

from visdial_tpu.ops import lstm_pallas as lp


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / steps


def sorted_mask(N, T, realistic, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, T + 1, N) if realistic else np.full(N, T)
    lens = np.sort(lens)[::-1].copy()
    return jnp.asarray(
        (np.arange(T)[None, :] >= (T - lens)[:, None]).astype(np.float32))


def main():
    N, T, H = 32000, 8, 512
    key = jax.random.PRNGKey(0)
    orig_pick = lp._pick_tile

    for E in (300, 512):
        w = jax.random.normal(key, (E + H, 4 * H), jnp.float32) * 0.05
        b = jnp.zeros((4 * H,), jnp.float32)
        x = jax.random.normal(key, (N, T, E), jnp.bfloat16)
        hp = jax.random.normal(key, (N, T, H), jnp.bfloat16)
        cp = jax.random.normal(key, (N, T, H), jnp.bfloat16)
        ghs = jax.random.normal(key, (N, T, H), jnp.bfloat16)
        ght = jax.random.normal(key, (N, H), jnp.float32)
        gct = jnp.zeros((N, H), jnp.float32)
        masks = {tag: sorted_mask(N, T, tag == "real")
                 for tag in ("max", "real")}

        default_tb = orig_pick(T, lp._round_up(E, lp.LANE), H, 2,
                               backward=True, N=N)
        print(f"E={E}: default TB={default_tb}")
        for tb in (default_tb, 200, 256, 320, 400, 512):
            def fake_pick(*a, **k):
                return tb
            lp._pick_tile = fake_pick
            try:
                f = jax.jit(lambda w, b, x, m, hp, cp, ghs, ght, gct: sum(
                    jnp.sum(o.astype(jnp.float32)) for o in
                    lp.lstm_layer_bwd_pallas(w, b, x, m, hp, cp,
                                             ghs, ght, gct)))
                for tag in ("max", "real"):
                    dt = timeit(f, w, b, x, masks[tag], hp, cp, ghs, ght, gct)
                    print(f"  TB={tb} ({tag}): {dt*1e3:.2f} ms", flush=True)
            except Exception as e:
                print(f"  TB={tb}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
            finally:
                lp._pick_tile = orig_pick


if __name__ == "__main__":
    main()

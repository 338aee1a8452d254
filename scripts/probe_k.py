"""Probe (TB, K) combos for the K-blocked LSTM kernels at gen-train
shapes (single-tile small-N calls) on the real chip.

Per-dispatch host overhead on the tunneled chip is 1-3 ms and NOISY —
larger than the kernels being measured — so each timing point runs the
kernel G times inside ONE on-device lax.scan (serialized through a scalar
carry), exactly how bench.py gets stable step times.

Usage: python scripts/probe_k.py [fwd|bwd|both]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from visdial_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from visdial_tpu.ops import lstm_pallas as lp

G = 50  # kernel invocations per dispatch


def scan_timer(build):
    """build(bump) -> scalar-dependent output; returns jitted G-loop."""
    def looped(*args):
        def body(carry, _):
            s = build(carry, *args)
            return s * 1e-30, None
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=G)
        return s
    return jax.jit(looped)


def timeit(fn, *args, reps=4):
    out = fn(*args)
    float(np.asarray(out))                       # compile + first dispatch
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(out))
        best = min(best, (time.time() - t0) / G)
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    N, H = 320, 512
    key = jax.random.PRNGKey(0)
    orig_tile, orig_k = lp._pick_tile, lp._pick_k

    for T in (16, 9):
        for E in (300, 512):
            w = jax.random.normal(key, (E + H, 4 * H), jnp.float32) * 0.05
            b = jnp.zeros((4 * H,), jnp.float32)
            x = jax.random.normal(key, (N, T, E), jnp.bfloat16)
            mask = jnp.ones((N, T), jnp.float32)
            h0 = jnp.zeros((N, H), jnp.float32)
            c0 = jnp.zeros((N, H), jnp.float32)
            hp = jax.random.normal(key, (N, T, H), jnp.bfloat16)
            cp = jax.random.normal(key, (N, T, H), jnp.bfloat16)
            ghs = jax.random.normal(key, (N, T, H), jnp.bfloat16)
            ght = jax.random.normal(key, (N, H), jnp.float32)
            gct = jnp.zeros((N, H), jnp.float32)

            def fwd_build(carry, w, b, x, mask, h0, c0):
                outs = lp.lstm_layer_pallas(
                    w, b, x + carry.astype(x.dtype), mask, h0, c0,
                    save_cell=True)
                return jnp.sum(outs[2][0].astype(jnp.float32))

            def bwd_build(carry, w, b, x, mask, hp, cp, ghs, ght, gct):
                outs = lp.lstm_layer_bwd_pallas(
                    w, b, x + carry.astype(x.dtype), mask, hp, cp,
                    ghs, ght, gct)
                return jnp.sum(outs[1][0].astype(jnp.float32))

            for TB in (320, 160):
                for K in (1, 2, 3, 4, 8):
                    if K > T:
                        continue
                    lp._pick_tile = lambda *a, **kw: TB
                    lp._pick_k = lambda *a, **kw: K
                    try:
                        if which in ("fwd", "both"):
                            dt = timeit(scan_timer(fwd_build),
                                        w, b, x, mask, h0, c0)
                            print(f"fwd T={T} E={E} TB={TB} K={K}: "
                                  f"{dt*1e6:.0f} us", flush=True)
                        if which in ("bwd", "both"):
                            dt = timeit(scan_timer(bwd_build),
                                        w, b, x, mask, hp, cp, ghs, ght, gct)
                            print(f"bwd T={T} E={E} TB={TB} K={K}: "
                                  f"{dt*1e6:.0f} us", flush=True)
                    except Exception as e:
                        print(f"T={T} E={E} TB={TB} K={K}: FAILED "
                              f"{str(e)[:90]}", flush=True)
                    finally:
                        lp._pick_tile, lp._pick_k = orig_tile, orig_k


if __name__ == "__main__":
    main()

"""Probe (TB, K) combos for K-BLOCKED LSTM kernel variants at gen-train
shapes (single-tile small-N calls) on the real chip.

HISTORICAL RECORD + RUNNABLE TB PROBE.  The K-blocked kernel variant
(K time steps statically unrolled per grid step, built to divide the
small-tile per-grid-step floor by K) was measured with this script in
round 4 and DROPPED — the committed kernels are K=1.  Measured on the
tunneled v5e chip (on-device lax.scan loops of G=50 serialized
invocations; per-invocation microseconds, best of 4):

    fwd  T=16 E=300: TB=320 K=1/2/3/4 -> 630/680/641/686
                     TB=160 K=1/2/3/4/8 -> 683/651/641/654/636
    bwd  T=16 E=300: TB=320 K=1 -> 717; TB=160 K=1/2 -> 713/718
    fwd  T=9  E=300: TB=320 K=1/2/3/4 -> 599/599/586/644
    bwd  T=9  E=512: TB=160 K=1/2 -> 668/676
    (T=16 E=512 and the remaining combos: same picture)

Timings are FLAT in K — the floor is DMA/per-invocation-bound, not
launch-count-bound — and the backward variant failed Mosaic compilation
(remote_compile HTTP 500) at K>=3 on every shape.  Conclusion recorded
in CLAUDE.md (round-4 facts) and docs/KERNELS.md §7: gen train's cure is
batch size (committed bench operating point batch 64), not kernel shape.

Running this script today probes the committed K=1 kernels over the TB
grid (still useful after tile-heuristic changes); K>1 rows print SKIPPED
unless a K-blocked variant is reintroduced (detected via lp._pick_k).

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
    has_k = hasattr(lp, "_pick_k")   # K-blocked variant present?
    orig_tile = lp._pick_tile
    orig_k = getattr(lp, "_pick_k", None)

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
                    if K > 1 and not has_k:
                        print(f"T={T} E={E} TB={TB} K={K}: SKIPPED "
                              "(K-blocked kernels not in tree — see "
                              "docstring for the measured record)",
                              flush=True)
                        continue
                    lp._pick_tile = lambda *a, **kw: TB
                    if has_k:
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
                        lp._pick_tile = orig_tile
                        if has_k:
                            lp._pick_k = orig_k


if __name__ == "__main__":
    main()

"""Device-looped timing of masked_lstm at gen-train shapes (one dispatch)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from visdial_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from visdial_tpu.ops.lstm import lstm_init, masked_lstm

jax.config.update("jax_default_prng_impl", "rbg")

ITERS = 50


def bench(name, N, T, E, H=512, L=2, dtype=jnp.bfloat16):
    params = lstm_init(jax.random.PRNGKey(0), E, H, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, T, E), dtype)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (N, T)) > 0.2)

    def fwd_once(p, x):
        outs, _ = masked_lstm(p, x, mask.astype(x.dtype), impl="pallas")
        return outs.astype(jnp.float32).sum()

    @jax.jit
    def fwd_loop(p, x):
        def body(i, acc):
            # acc-dependent input defeats loop-invariant hoisting
            return fwd_once(p, x + (acc * 1e-30).astype(x.dtype))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    @jax.jit
    def fb_loop(p, x):
        def body(i, acc):
            g = jax.grad(fwd_once)(p, x + (acc * 1e-30).astype(x.dtype))
            return jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    def run(fn):
        float(np.asarray(fn(params, x)))  # compile+warm
        t0 = time.time()
        float(np.asarray(fn(params, x)))
        return (time.time() - t0) / ITERS

    tf_ = run(fwd_loop)
    tb = run(fb_loop)
    flops_f = 2 * N * T * ((E + H) * 4 * H + 2 * H * 4 * H)
    print(f"{name:12s} N={N:6d} T={T:3d}: fwd {tf_*1e3:7.3f} ms "
          f"({flops_f/tf_/1e12:6.1f} TF/s)  f+b {tb*1e3:7.3f} ms "
          f"({3*flops_f/tb/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    bench("ques", 320, 16, 300)
    bench("fact", 320, 40, 300)
    bench("lm", 320, 9, 300)
    bench("fact@B256", 2560, 40, 300)

"""Time masked_lstm fwd and fwd+bwd at the gen-train component shapes."""
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


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, steps=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / steps


def bench(name, N, T, E, H=512, L=2, dtype=jnp.bfloat16):
    params = lstm_init(jax.random.PRNGKey(0), E, H, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, T, E), dtype)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (N, T)) > 0.2)

    @jax.jit
    def fwd(params, x):
        outs, (h, c) = masked_lstm(params, x, mask.astype(x.dtype),
                                   impl="pallas")
        return outs.astype(jnp.float32).sum()

    @jax.jit
    def fwdbwd(params, x):
        def loss(p):
            outs, (h, c) = masked_lstm(p, x, mask.astype(x.dtype),
                                       impl="pallas")
            return outs.astype(jnp.float32).sum()
        return jax.grad(loss)(params)

    tf_ = timeit(fwd, params, x)
    tb = timeit(fwdbwd, params, x)
    flops_f = 2 * N * T * ((E + H) * 4 * H + 2 * H * 4 * H)
    print(f"{name:14s} N={N:6d} T={T:3d} E={E:4d}: fwd {tf_*1e3:7.2f} ms "
          f"({flops_f/tf_/1e12:6.1f} TF/s)  f+b {tb*1e3:7.2f} ms "
          f"({3*flops_f/tb/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    bench("ques", 320, 16, 300)
    bench("fact", 320, 40, 300)
    bench("lm", 320, 9, 300)
    bench("opt(disc)", 32000, 9, 300)
    bench("fact@B256", 2560, 40, 300)

"""Where does the fixed per-call LSTM cost go?  Compare pallas vs xla scan
impls at the gen-train shapes, plus a trivial pallas kernel's launch cost."""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
from visdial_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visdial_tpu.ops.lstm import lstm_init, masked_lstm

jax.config.update("jax_default_prng_impl", "rbg")
ITERS = 100


def run_loop(body):
    @jax.jit
    def loop(x0):
        def it(i, acc):
            return body(acc)
        return jax.lax.fori_loop(0, ITERS, it, x0)
    x0 = jnp.float32(0.0)
    float(np.asarray(loop(x0)))
    t0 = time.time()
    float(np.asarray(loop(x0)))
    return (time.time() - t0) / ITERS


def trivial_kernel_cost():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.ones((8, 128), jnp.float32)

    def body(acc):
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x + acc * 1e-30)
        return y.sum()
    print(f"trivial pallas call: {run_loop(body)*1e6:.1f} us")


def lstm_cost(name, N, T, E, L=2, dtype=jnp.bfloat16):
    params = lstm_init(jax.random.PRNGKey(0), E, 512, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, T, E), dtype)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (N, T)) > 0.2)

    for impl in ("pallas", "xla"):
        def body(acc, impl=impl):
            outs, _ = masked_lstm(params, x + acc.astype(dtype) * 1e-30,
                                  mask.astype(x.dtype), impl=impl)
            return outs.astype(jnp.float32).sum()
        t = run_loop(body)
        print(f"{name:8s} N={N} T={T:3d} L={L} {impl:6s}: fwd {t*1e3:7.3f} ms")


if __name__ == "__main__":
    trivial_kernel_cost()
    lstm_cost("lm", 320, 9, 300)
    lstm_cost("ques", 320, 16, 300)
    lstm_cost("fact", 320, 40, 300)
    lstm_cost("lm1L", 320, 9, 300, L=1)
    # lstm_cost("opt", 32000, 9, 300)  # too slow to compile here

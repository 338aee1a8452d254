"""True device-time of the gen train step: lax.scan over 50 steps, one
dispatch, host-readback-synced."""
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
    init_train_state, shard_train_state, train_step,
)

ITERS = 50


def main(decoder="gen"):
    cfg = flagship_config(decoder=decoder)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    mesh = make_mesh()
    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    batch = shard_batch(random_batch(cfg, seed=0), mesh)

    @jax.jit
    def run(state, batch):
        def body(s, _):
            s2, m = train_step(s, batch, cfg)
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=ITERS)
        return losses[-1]

    t0 = time.time()
    float(np.asarray(run(state, batch)))
    print(f"compile+first: {time.time()-t0:.1f}s")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(run(state, batch)))
        dt = (time.time() - t0) / ITERS
        print(f"{decoder} train step: {dt*1e3:.3f} ms "
              f"({cfg.batch_size*cfg.num_rounds/dt:.0f} rounds/s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "gen")

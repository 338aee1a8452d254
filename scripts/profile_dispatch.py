"""Isolate per-step dispatch overhead: donated vs non-donated python-loop
vs on-device scan, for the gen train step."""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
from visdial_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax

from bench import flagship_config
from visdial_tpu.data.synthetic import random_batch
from visdial_tpu.parallel.mesh import make_mesh, shard_batch
from visdial_tpu.parallel.train_step import (
    init_train_state, make_train_fn, shard_train_state, train_step,
)


def main():
    cfg = flagship_config(decoder="gen")
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    mesh = make_mesh()
    state0 = shard_train_state(init_train_state(cfg), cfg, mesh)
    batch = shard_batch(random_batch(cfg, seed=0), mesh)

    # donated (bench's path)
    fn_d = make_train_fn(cfg, mesh)
    state = state0
    for _ in range(3):
        state, m = fn_d(state, batch)
    float(np.asarray(m["loss"]))
    t0 = time.time()
    for _ in range(30):
        state, m = fn_d(state, batch)
    float(np.asarray(m["loss"]))
    print(f"donated python loop:     {(time.time()-t0)/30*1e3:.2f} ms/step")

    # non-donated python loop
    fn_n = jax.jit(partial(train_step, cfg=cfg))
    state = shard_train_state(init_train_state(cfg), cfg, mesh)
    for _ in range(3):
        state, m = fn_n(state, batch)
    float(np.asarray(m["loss"]))
    state2 = state
    t0 = time.time()
    for _ in range(30):
        state2, m = fn_n(state2, batch)
    float(np.asarray(m["loss"]))
    print(f"non-donated python loop: {(time.time()-t0)/30*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()

"""Optimizers as pure pytree transforms.

Replaces the reference's in-place flat-tensor updates (reference:
model_utils/optim_updates.lua — adam / sgd / rmsprop over the single
getParameters() tensor).  Here state is a pytree mirroring the params tree;
updates are functional, so they jit, shard, and checkpoint like everything
else.  Gradient L2 clipping matches the reference's pre-update global clip
(reference: model.lua trainStep, clip norm ~5 [P]).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config


class OptState(NamedTuple):
    step: jnp.ndarray           # scalar int32
    m: Any                      # first moment / momentum (pytree or None-tree)
    v: Any                      # second moment (pytree or None-tree)


def init_opt_state(params, cfg: Config) -> OptState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    if cfg.optimizer == "sgd":
        return OptState(jnp.zeros((), jnp.int32), zeros,
                        jax.tree.map(lambda x: jnp.zeros((0,)), params))
    return OptState(jnp.zeros((), jnp.int32), zeros,
                    jax.tree.map(jnp.zeros_like, params))


def clip_by_global_norm(grads, max_norm: float):
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), gnorm


def apply_updates(params, grads, state: OptState, lr, cfg: Config):
    """One optimizer step.  Returns (new_params, new_state, grad_norm)."""
    grads, gnorm = clip_by_global_norm(grads, cfg.grad_clip)
    step = state.step + 1

    if cfg.optimizer == "adam":
        b1, b2, eps = cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
        t = step.astype(jnp.float32)
        mhat_scale = 1.0 / (1.0 - b1 ** t)
        vhat_scale = 1.0 / (1.0 - b2 ** t)
        new_params = jax.tree.map(
            lambda p, m_, v_: p - lr * (m_ * mhat_scale)
            / (jnp.sqrt(v_ * vhat_scale) + eps),
            params, m, v)
        return new_params, OptState(step, m, v), gnorm

    if cfg.optimizer == "rmsprop":
        alpha, eps = 0.99, 1e-8
        v = jax.tree.map(lambda v_, g: alpha * v_ + (1 - alpha) * g * g,
                         state.v, grads)
        new_params = jax.tree.map(
            lambda p, g, v_: p - lr * g / (jnp.sqrt(v_) + eps),
            params, grads, v)
        return new_params, OptState(step, state.m, v), gnorm

    # sgd with momentum 0.9 (documented choice; reference exposes plain sgd)
    mom = 0.9
    m = jax.tree.map(lambda m_, g: mom * m_ + g, state.m, grads)
    new_params = jax.tree.map(lambda p, m_: p - lr * m_, params, m)
    return new_params, OptState(step, m, state.v), gnorm


def lr_at_step(step, cfg: Config):
    """Multiplicative per-step decay with a floor (reference: train.lua
    -lrDecayRate; floor is our documented addition)."""
    lr = cfg.learning_rate * cfg.lr_decay_rate ** step.astype(jnp.float32)
    return jnp.maximum(lr, cfg.min_lr)

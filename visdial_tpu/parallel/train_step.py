"""The jitted training step and eval step, sharded over the mesh.

Replaces the reference's Model:trainStep (reference: model.lua — zero grads,
fwd, forwardConnect, loss, bwd, clip, in-place adam) with one functional
`train_step` traced once under jit: value_and_grad over the loss, global
clip, optimizer update, LR decay.  Under the ('data','model') mesh the batch
is sharded on 'data' and params are replicated, so XLA inserts the gradient
all-reduce (psum over ICI) automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import Config
from ..models.model import _impl, model_init, model_loss, model_scores
from .mesh import batch_sharding, replicated, tree_shardings
from .optim import OptState, apply_updates, init_opt_state, lr_at_step


class TrainState(NamedTuple):
    params: Any
    opt: OptState
    rng: jax.Array


def init_train_state(cfg: Config, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    init_rng, state_rng = jax.random.split(rng)
    params = model_init(init_rng, cfg)
    return TrainState(params, init_opt_state(params, cfg), state_rng)


def state_shardings(cfg: Config, mesh: Mesh) -> TrainState:
    """Pytree of NamedShardings mirroring TrainState: batch-independent
    parameters follow mesh.param_pspec (vocab-dim leaves on 'model', the
    rest replicated); optimizer moments mirror their parameters."""
    template = jax.eval_shape(lambda: init_train_state(cfg))
    return tree_shardings(template, mesh)


def shard_train_state(state: TrainState, cfg: Config, mesh: Mesh) -> TrainState:
    """device_put the whole state with its layout of record."""
    return jax.device_put(state, state_shardings(cfg, mesh))


def train_step(state: TrainState, batch: dict, cfg: Config,
               impl: str | None = None, loss_fn=model_loss):
    """One SGD step.  Returns (new_state, metrics dict of scalars)."""
    rng, step_rng = jax.random.split(state.rng)
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, batch, cfg, train=True, rng=step_rng, impl=impl)
    lr = lr_at_step(state.opt.step, cfg)
    params, opt, gnorm = apply_updates(state.params, grads, state.opt, lr, cfg)
    metrics = {"loss": loss, "lr": lr, "grad_norm": gnorm,
               "step": opt.step}
    return TrainState(params, opt, rng), metrics


def multi_train_step(state: TrainState, batches: dict, cfg: Config,
                     impl: str | None = None, loss_fn=model_loss):
    """G optimizer steps in one traced program: lax.scan of train_step over
    a stack of G batches (leading axis).  Returns (state, metrics) with
    every metric stacked to (G,).

    TPU-first dispatch amortization: one host->device dispatch (and one
    batch transfer) per G steps instead of per step.  Per-step host dispatch
    is pure overhead the chip idles through — measured 1-3 ms/step on a
    tunneled link against a 8 ms gen-decoder step (it also gives XLA a
    whole-group scheduling window).  No reference analog (train.lua
    dispatches per iteration by construction).
    """
    def body(s, b):
        return train_step(s, b, cfg, impl, loss_fn)

    return jax.lax.scan(body, state, batches)


def make_multistep_train_fn(cfg: Config, mesh: Mesh, impl: str | None = None,
                            loss_fn=model_loss):
    """jit(multi_train_step): batches carry a leading group axis, sharded
    (None, 'data'); state donated."""
    from .mesh import stacked_batch_sharding

    rep = replicated(mesh)
    ssh = state_shardings(cfg, mesh)
    fn = partial(multi_train_step, cfg=cfg, impl=impl, loss_fn=loss_fn)
    return jax.jit(
        fn,
        in_shardings=(ssh, stacked_batch_sharding(mesh)),
        out_shardings=(ssh, rep),
        donate_argnums=(0,),
    )


def make_train_fn(cfg: Config, mesh: Mesh, impl: str | None = None):
    """jit(train_step) with explicit shardings over the mesh.

    State laid out per state_shardings (vocab-dim params on 'model', rest
    replicated), batch sharded on 'data', donated state.  XLA inserts the
    gradient all-reduce over 'data' (ICI) from these annotations.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    ssh = state_shardings(cfg, mesh)

    fn = partial(train_step, cfg=cfg, impl=impl)
    return jax.jit(
        fn,
        in_shardings=(ssh, bsh),
        out_shardings=(ssh, rep),
        donate_argnums=(0,),
    )


def make_dense_train_fn(cfg: Config, mesh: Mesh, impl: str | None = None):
    """jit(train_step) over the dense-annotation fine-tuning loss
    (model_dense_loss): same optimizer/sharding machinery as make_train_fn,
    different objective."""
    from ..models.model import model_dense_loss

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    ssh = state_shardings(cfg, mesh)
    fn = partial(train_step, cfg=cfg, impl=impl, loss_fn=model_dense_loss)
    return jax.jit(fn, in_shardings=(ssh, bsh), out_shardings=(ssh, rep),
                   donate_argnums=(0,))


def _batch_adaptive_jit(fn, mesh: Mesh, shardings_for, batch_argnum: int,
                        **jit_kw):
    """jit with batch pins that honor shard_batch's degrade policy.

    The eval/generate surfaces stay usable at ANY batch size (documented
    in mesh.shard_batch): a dialog count not divisible by the data axis
    arrives replicated, and a blanket in_shardings pin of P('data') makes
    pjit reject that layout outright ("global size ... should be
    divisible by 8").  This wrapper pins per key exactly what shard_batch
    emits — P('data') where dim 0 divides the data axis, replicated where
    it doesn't — one compiled program per layout (static per split;
    divisible production batches get pins identical to a fixed
    batch_sharding(mesh)).  shardings_for(bsh, row) returns the
    (in_shardings, out_shardings) pair given the per-key batch-dict pin
    and the sharding for batch-row-shaped outputs."""
    n = mesh.shape["data"]
    sh, rep = batch_sharding(mesh), replicated(mesh)
    cache: dict = {}

    def call(*args):
        batch = args[batch_argnum]
        pat = tuple((k, np.shape(v)[0] % n == 0) for k, v in batch.items())
        fn_c = cache.get(pat)
        if fn_c is None:
            bsh = {k: (sh if div else rep) for k, div in pat}
            row = sh if all(d for _, d in pat) else rep
            ins, outs = shardings_for(bsh, row)
            fn_c = cache[pat] = jax.jit(fn, in_shardings=ins,
                                        out_shardings=outs, **jit_kw)
        return fn_c(*args)

    return call


def make_eval_fn(cfg: Config, mesh: Mesh, impl: str | None = None):
    """jit(model_scores): batch -> (B, R, K) candidate scores."""
    psh = state_shardings(cfg, mesh).params

    def score(params, batch):
        return model_scores(params, batch, cfg, impl=impl)

    return _batch_adaptive_jit(
        score, mesh, lambda bsh, row: ((psh, bsh), row), batch_argnum=1)


def make_gen_bucket_eval_fns(cfg: Config, mesh: Mesh, impl: str | None = None):
    """Gen eval fast path: (encoder_fn, row_score_fn).

    encoder_fn(params, batch) -> replicated joint (N, H).
    row_score_fn(params, joint, opt_list, opt_list_len, opt_rows (C,),
    row_idx (C,), width=T, start_token=, end_token=) -> (C,) scores.

    Two hosts of savings over the direct path, both exact:
      * FLOPs — rows whose length+1 <= T score IDENTICALLY at width T
        (masked steps contribute exactly zero), so the harness sorts
        candidate rows by length into buckets of shrinking T and runs most
        rows at a fraction of the padded step count (gen eval is
        roofline-bound at the padded width; see BASELINE.md).
      * host->device traffic — the candidate <START>/<END> rows are built
        ON DEVICE from the split's opt_list (uploaded once per eval), so a
        batch ships two tiny index vectors per bucket instead of ~3 MB of
        expanded candidate tokens (the dominant cost under high-latency
        transfer links, and fewer DMAs everywhere).

    jit recompiles once per (C, T) bucket shape.
    """
    from ..models.decoders import gen_score_rows
    from ..models.encoders import encoder_apply

    rep = replicated(mesh)
    psh = state_shardings(cfg, mesh).params
    impl_ = impl or _impl(cfg)

    def encode(params, batch):
        return encoder_apply(params["encoder"], params["embed"], batch, cfg,
                             train=False, rng=None, impl=impl_)

    encoder_fn = _batch_adaptive_jit(
        encode, mesh, lambda bsh, row: ((psh, bsh), rep), batch_argnum=1)

    def score(params, joint, opt_list, opt_list_len, opt_rows, row_idx,
              width, start_token, end_token):
        return gen_rows_score(params, joint, opt_list, opt_list_len,
                              opt_rows, row_idx, width, start_token,
                              end_token, cfg, impl=impl_)

    # width/start/end are static (positional: pjit forbids kwargs when
    # in_shardings is given)
    row_score_fn = jax.jit(
        score, in_shardings=(psh, rep, rep, rep, rep, rep),
        out_shardings=rep, static_argnums=(6, 7, 8))
    return encoder_fn, row_score_fn


def gen_rows_score(params, joint, opt_list, opt_list_len, opt_rows, row_idx,
                   width: int, start_token: int, end_token: int, cfg: Config,
                   *, impl: str | None = None):
    """Score candidate rows at a static width with ON-DEVICE candidate
    construction from the split's opt_list (pure function; used by the
    jitted streaming row_fn above and inside the resident gen scan).

    opt_rows (C,) rows into opt_list; row_idx (C,) rows into joint.
    Returns (C,) summed token log-probs.
    """
    from ..models.decoders import gen_score_rows

    tok = jnp.take(opt_list, opt_rows, axis=0)[:, : width - 1]   # (C, w-1)
    lens = jnp.take(opt_list_len, opt_rows)                      # (C,)
    # same construction as loader._with_start_end, on device:
    # in = <START> t1..t_{w-1}; out = t1..t_len <END> 0...
    opt_in = jnp.concatenate(
        [jnp.full((tok.shape[0], 1), start_token, jnp.int32), tok], axis=1)
    base = jnp.pad(tok, ((0, 0), (0, 1)))                        # (C, w)
    pos = jnp.arange(width, dtype=jnp.int32)[None, :]
    opt_out = jnp.where(pos == lens[:, None], end_token, base)
    joint_rows = jnp.take(joint, row_idx, axis=0)
    # rows arrive coarsely width-bucketed by the harness (3 buckets, not
    # length-homogeneous tiles); re-sorting inside the jit was measured as
    # a net loss, so skip it — per-tile kernel bounds stay exact either way
    return gen_score_rows(params["decoder"], params["embed"],
                          joint_rows, opt_in, opt_out, cfg, impl=impl,
                          sort=False)


def make_disc_table_eval_fns(cfg: Config, mesh: Mesh, impl: str | None = None):
    """Disc eval fast path: (option_table_fn, score_fn).

    option_table_fn(params, opt_list) embeds the split's dedup'd option
    list once (replicated (M, H) table); score_fn(params, table, batch)
    scores a batch via encoder forward + table gather — the option LSTM
    runs over ~M unique answers per split instead of N*K rows per batch.
    """
    from ..models.model import model_option_table, model_scores_with_table

    rep = replicated(mesh)
    psh = state_shardings(cfg, mesh).params

    table_fn = jax.jit(
        lambda params, opt_list: model_option_table(params, opt_list, cfg,
                                                    impl=impl),
        in_shardings=(psh, rep), out_shardings=rep)
    score_fn = _batch_adaptive_jit(
        lambda params, table, batch: model_scores_with_table(
            params, batch, table, cfg, impl=impl),
        mesh, lambda bsh, row: ((psh, rep, bsh), row), batch_argnum=2)
    return table_fn, score_fn

"""Fused Pallas TPU kernel for the masked multi-layer LSTM scan.

Replaces the per-timestep kernel-launch pattern of the reference's
Element-Research rnn SeqLSTM stack (reference: external dep; SURVEY.md §2b)
with one TPU kernel per layer: gate weights stay resident in VMEM, the time
loop runs inside the kernel, and hidden/cell state never round-trips HBM
between steps.  Mask semantics match ops/lstm.py exactly: padded steps carry
(h, c) through unchanged.

Layout choices (see /opt/skills/guides/pallas_guide.md):
  * grid over batch tiles; each program owns TB rows for the whole sequence;
  * weights are split W -> (Wx, Wh) and the input-feature dim is zero-padded
    to a lane multiple (128) so every matmul is MXU-tileable;
  * matmuls run in the input dtype (bfloat16 on the fast path, float32 in
    tests) with float32 accumulation; h/c carries are float32 always;
  * the batch tile TB adapts to T so x + hs + weights fit the ~16MB VMEM.

Gradients: `masked_lstm_pallas` carries a custom VJP.  On the bf16 TPU
fast path the backward runs as a second fused kernel (`_lstm_bwd_kernel`):
gate activations are recomputed from the streamed inputs, the chain rule is
applied in registers, and only dgates @ Wh^T is sequential; the dW/dx
contractions happen as three large XLA matmuls over the flattened (N*T)
axis.  Other dtypes/backends use a hand-written batched XLA backward with
the same structure (both are tested against autodiff of the twin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
VMEM_BUDGET = 13 * 1024 * 1024  # of the ~16MB scoped VMEM per program


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(T: int, E_pad: int, H: int, itemsize: int,
               backward: bool = False, N: int | None = None) -> int:
    """Largest batch tile (multiple of 8, <=512) such that everything a grid
    program holds fits the scoped VMEM budget: the weight scratch (single
    copy — weights are DMA'd once, outside the pipeline), the pipelined
    per-step blocks (x_t, hs_t, mask row, boundary state blocks; Mosaic
    double-buffers these), the h/c carry scratch, and the f32 gate
    temporaries.  The backward kernel additionally streams h_prev, c_prev,
    and g_hs blocks in and a 4H-wide dgp block out.

    When the call's row count N is smaller than the VMEM-sized tile, the
    tile shrinks to N rounded up to a sublane multiple — a 320-row call
    (flagship train: batch 32 dialogs x 10 rounds) otherwise pads to 512
    rows and wastes 37% of every gate matmul."""
    weights = (E_pad + H + 8) * 4 * H * itemsize + 4 * H * 4
    per_row = (
        2 * (E_pad + H) * itemsize                 # x_t + hs_t/dgp (x2 DB)
        + 2 * _round_up(T, LANE) * itemsize        # mask row (lane-padded)
        + 2 * 4 * H * 4                            # h0/c0/ht/ct blocks (x2 DB)
        + 2 * H * 4                                # h/c carry scratch
        + 4 * 4 * H * 4)                           # f32 gates + slices (stack)
    # The save_cell (train-mode) forward streams a second (1, TB, H)
    # output block — per-row 2*H*itemsize double-buffered — that is
    # DELIBERATELY not charged: the stack charge above already
    # over-reserves by more than that at every shape we can measure
    # (TB=160 at the flagship bf16 layer-2 shape compiles and runs WITH
    # the cs stream on the real chip; charging it would shrink the tile
    # to 152/128 and re-introduce the non-divisor pad-copy cost the
    # round-4 retune removed).  Like the backward's halved gates charge
    # below, the 13/16 MB budget is the conservatism knob of record.
    if backward:
        # h_prev + c_prev + g_hs inputs, and dgp out is 4H wide (vs hs's H)
        per_row += 2 * (3 * H + 3 * H) * itemsize
        # Mosaic's real live set is tighter than the fwd stack charge:
        # measured on-chip (round 4), TB=200 compiles at flagship bwd
        # shapes (E 300 and 512) while TB>=208 is a genuine VMEM OOM —
        # halve the gates-stack charge for the backward, landing TB~184.
        per_row -= 2 * 4 * H * 4
    tb = max(VMEM_BUDGET - weights, 0) // max(per_row, 1)
    tb = max(8, min(512, (tb // 8) * 8))
    if N is not None:
        if _round_up(N, 16) < tb:
            return _round_up(N, 16)  # 16 covers the bf16 sublane minimum
        # Prefer the largest tile within ~25% of the VMEM max that divides
        # N exactly: a non-divisor tile makes the wrapper jnp.pad-copy
        # EVERY (N, T, ·) operand (~1 GB of HBM traffic on the 32k-row
        # flagship backward — measured +18-21% per layer on v5e; divisor
        # tiles 160 and 200 tied at 15.6-16.0/13.0-13.2 ms max/realistic
        # vs 18.2-19.9 ms for 176/184/192/208).
        for cand in range(tb, max(tb * 3 // 4, 8) - 1, -8):
            if N % cand == 0:
                return cand
    return tb


def _lstm_layer_kernel(bounds_ref, x_ref, mask_ref, wx_hbm, wh_hbm, b_hbm,
                       h0_ref, c0_ref, *refs, T: int, save_cell: bool):
    """One LSTM step for one batch tile: grid = (batch tiles, time).

    Time is the *grid's* minor dimension — the canonical Mosaic recurrence
    shape: Mosaic streams the per-step x block in and the per-step hs block
    out (double-buffered DMA overlapped with compute) while the recurrent
    (h, c) carry lives in VMEM scratch that persists across grid steps.

    Blocks: x_t (1,TB,Ep) of time-major x; hs_t (1,TB,H); mask (TB,T);
    bounds (n_tiles, 2) int32, scalar-prefetched — each tile's [start,
    stop) span of steps
    where ANY row has a real token (outside it every row is a mask-0
    carry-through, so the gate matmuls are skipped and the carried state is
    emitted: identical results, no compute — the win behind length-sorted
    batching at real VisDial answer lengths); h0/c0/ht/ct (TB,H) f32.
    Weights arrive in ANY memory space and are DMA'd once into VMEM scratch
    (pipelined inputs would be double-buffered, wasting 2x the weight
    footprint).  The mask column for step t is extracted with a one-hot
    matmul rather than a dynamic lane slice (lane-alignment constraint).

    With save_cell the per-step (post-mask) cell state streams out too —
    the training path saves it so the backward kernel never has to rebuild
    the cell recurrence.
    """
    if save_cell:
        (hs_ref, cs_ref, ht_ref, ct_ref,
         wx_ref, wh_ref, b_ref, h_scr, c_scr, dma_sems) = refs
    else:
        (hs_ref, ht_ref, ct_ref,
         wx_ref, wh_ref, b_ref, h_scr, c_scr, dma_sems) = refs
    t = pl.program_id(1)
    TB = x_ref.shape[1]
    H = wh_ref.shape[0]

    @pl.when((pl.program_id(0) == 0) & (t == 0))
    def _load_weights():
        copies = [pltpu.make_async_copy(src, dst, dma_sems.at[i])
                  for i, (src, dst) in enumerate(
                      ((wx_hbm, wx_ref), (wh_hbm, wh_ref), (b_hbm, b_ref)))]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    @pl.when(t == 0)
    def _init_state():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    i_tile = pl.program_id(0)

    @pl.when((t >= bounds_ref[i_tile, 0]) & (t < bounds_ref[i_tile, 1]))
    def _active_step():
        h, c = h_scr[:], c_scr[:]                           # f32 (TB, H)
        x_t = x_ref[0]                                      # (TB, E_pad)
        gates = (
            jnp.dot(x_t, wx_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                      preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        onehot = (t_ids == t).astype(jnp.float32)           # (T, 1)
        m = jnp.dot(mask_ref[:].astype(jnp.float32), onehot,
                    preferred_element_type=jnp.float32)     # (TB, 1)
        h_scr[:] = m * h_new + (1.0 - m) * h
        c_scr[:] = m * c_new + (1.0 - m) * c

    # skipped steps emit the carried state — exactly the all-pad semantics
    hs_ref[0] = h_scr[:].astype(hs_ref.dtype)
    if save_cell:
        cs_ref[0] = c_scr[:].astype(cs_ref.dtype)

    @pl.when(t == T - 1)
    def _final():
        ht_ref[:] = h_scr[:]
        ct_ref[:] = c_scr[:]


def _tile_bounds(mask, TB: int, T: int):
    """Per-tile [start, stop) span of time steps where any row has a real
    token: (n_tiles, 2) int32.  All-pad rows contribute an empty span (the
    kernel then emits their initial state — the carry-through semantics).
    Cheap mask reductions; exactness does not depend on row order, but
    length-sorted rows make tiles length-homogeneous and the spans tight
    (gen/disc candidate scoring at real answer lengths)."""
    n_tiles = mask.shape[0] // TB
    m = (mask.reshape(n_tiles, TB, T) > 0)
    any_row = m.any(axis=2)
    first = jnp.argmax(m, axis=2)                            # 0 if all-pad
    last = T - jnp.argmax(m[:, :, ::-1], axis=2)             # T if all-pad
    first = jnp.where(any_row, first, T)
    last = jnp.where(any_row, last, 0)
    return jnp.stack([jnp.min(first, axis=1), jnp.max(last, axis=1)],
                     axis=1).astype(jnp.int32)


def lstm_layer_pallas(w, b, x, mask, h0, c0, *, interpret: bool | None = None,
                      save_cell: bool = False):
    """One masked LSTM layer.  w (E+H, 4H) packed [x; h] like ops/lstm.py.

    x (N, T, E) in compute dtype; mask (N, T); h0/c0 (N, H) f32.
    Returns hs (N, T, H) in x.dtype and (hT, cT) f32; with save_cell also
    cs (N, T, H) in x.dtype (per-step post-mask cell states, consumed by
    the fused backward).
    """
    if interpret is None:  # run compiled on TPU, interpreted elsewhere
        interpret = jax.default_backend() != "tpu"
    N, T, E = x.shape
    H = w.shape[1] // 4
    dtype = x.dtype
    E_pad = _round_up(E, LANE)

    wx = w[:E].astype(dtype)
    if E_pad != E:
        wx = jnp.pad(wx, ((0, E_pad - E), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, E_pad - E)))
    wh = w[E:].astype(dtype)
    b2 = b.reshape(1, -1).astype(jnp.float32)

    TB = _pick_tile(T, E_pad, H, jnp.dtype(dtype).itemsize, N=N)
    N_pad = _round_up(N, TB)
    if N_pad != N:
        pad = ((0, N_pad - N), (0, 0))
        x = jnp.pad(x, pad + ((0, 0),))
        mask = jnp.pad(mask, pad)
        h0 = jnp.pad(h0, pad)
        c0 = jnp.pad(c0, pad)

    x_tm = jnp.swapaxes(x, 0, 1)                 # (T, N_pad, E_pad)
    grid = (N_pad // TB, T)
    # index maps receive the scalar-prefetch ref as an extra trailing arg
    step_blk = lambda i, t, *_: (t, i, 0)
    row_blk = lambda i, t, *_: (i, 0)
    bounds = _tile_bounds(mask, TB, T)

    step_out = [pl.BlockSpec((1, TB, H), step_blk, memory_space=pltpu.VMEM)]
    step_shape = [jax.ShapeDtypeStruct((T, N_pad, H), dtype)]
    if save_cell:
        step_out *= 2
        step_shape *= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # the (n_tiles, 2) step bounds
        grid=grid,
        in_specs=[
            # x fetches are span-clamped: skipped steps re-address the
            # previous block and trigger no DMA (outputs stay unclamped —
            # every step emits its carried state)
            pl.BlockSpec((1, TB, E_pad), _clamped_step_map(T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, T), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # wx — DMA'd to scratch
            pl.BlockSpec(memory_space=pl.ANY),   # wh
            pl.BlockSpec(memory_space=pl.ANY),   # b
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=step_out + [
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((E_pad, 4 * H), dtype),
            pltpu.VMEM((H, 4 * H), dtype),
            pltpu.VMEM((1, 4 * H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_lstm_layer_kernel, T=T, save_cell=save_cell),
        grid_spec=grid_spec,
        out_shape=step_shape + [
            jax.ShapeDtypeStruct((N_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((N_pad, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the time axis carries the recurrence through scratch — both
            # grid dims must run sequentially on one core
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N_pad * T * (E_pad + H) * 4 * H,
            bytes_accessed=(N_pad * T * (E_pad + H)
                            + (E_pad + H) * 4 * H) * 4,
            transcendentals=N_pad * T * 4 * H,
        ),
        interpret=interpret,
    )(bounds, x_tm, mask.astype(dtype), wx, wh, b2, h0, c0)
    if save_cell:
        hs, cs, ht, ct = outs
        return (jnp.swapaxes(hs, 0, 1)[:N], jnp.swapaxes(cs, 0, 1)[:N],
                ht[:N], ct[:N])
    hs, ht, ct = outs
    return jnp.swapaxes(hs, 0, 1)[:N], ht[:N], ct[:N]


def _lstm_bwd_kernel(bounds_ref, x_ref, hprev_ref, cprev_ref, mask_ref,
                     wx_hbm, wh_hbm, b_hbm, ghs_ref, ght_ref, gct_ref,
                     dgp_ref, dh0_ref, dc0_ref,
                     wx_ref, wh_ref, b_ref, dh_scr, dc_scr, dma_sems,
                     *, T: int):
    """Fused LSTM backward: one grid step per (batch tile, REVERSED time).

    Recomputes the gate activations from the streamed x_t / h_{t-1} blocks
    (2 matmuls — same as forward), applies the gate/cell chain rule in
    registers, and carries (dh, dc) in VMEM scratch; only dgates @ Wh^T is
    sequential.  Emits the gate-pre-activation grads dgp (streamed out in
    the compute dtype); the dW/dx contractions over the flattened (N*T)
    axis happen outside in XLA where they are single large MXU matmuls.
    This keeps every (T, N, ·) f32 intermediate of the pure-XLA backward
    (gate activations, rebuilt cell states, scan temporaries) out of HBM.

    Steps outside the tile's bounds (every row mask-0 there — see the
    forward kernel) skip the three matmuls and reduce to the exact m=0
    algebra: dh += g_hs[t] (the carried state's cotangent flows to
    h_{t-1}), dc unchanged, dgp[t] = 0.
    """
    t_rev = pl.program_id(1)
    t = (T - 1) - t_rev
    TB = x_ref.shape[1]
    H = wh_ref.shape[0]
    f32 = jnp.float32

    @pl.when((pl.program_id(0) == 0) & (t_rev == 0))
    def _load_weights():
        copies = [pltpu.make_async_copy(src, dst, dma_sems.at[i])
                  for i, (src, dst) in enumerate(
                      ((wx_hbm, wx_ref), (wh_hbm, wh_ref), (b_hbm, b_ref)))]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    @pl.when(t_rev == 0)
    def _init_carries():
        dh_scr[:] = ght_ref[:]
        dc_scr[:] = gct_ref[:]

    i_tile = pl.program_id(0)
    active = (t >= bounds_ref[i_tile, 0]) & (t < bounds_ref[i_tile, 1])

    @pl.when(active)
    def _active_step():
        x_t = x_ref[0]                                      # (TB, Ep) cdt
        h_prev = hprev_ref[0]                               # (TB, H) cdt
        c_prev = cprev_ref[0].astype(f32)                   # (TB, H)
        gates = (
            jnp.dot(x_t, wx_ref[:], preferred_element_type=f32)
            + jnp.dot(h_prev, wh_ref[:], preferred_element_type=f32)
            + b_ref[:].astype(f32)
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        cn = f * c_prev + i * g
        tcn = jnp.tanh(cn)

        t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        onehot = (t_ids == t).astype(f32)
        m = jnp.dot(mask_ref[:].astype(f32), onehot,
                    preferred_element_type=f32)             # (TB, 1)

        Dh = ghs_ref[0].astype(f32) + dh_scr[:]
        Dc = dc_scr[:]
        dhn = m * Dh
        dcn = m * Dc + dhn * o * (1.0 - tcn * tcn)
        dc_prev = (1.0 - m) * Dc + dcn * f
        dgp = jnp.concatenate([
            (dcn * g) * i * (1.0 - i),
            (dcn * c_prev) * f * (1.0 - f),
            (dcn * i) * (1.0 - g * g),
            (dhn * tcn) * o * (1.0 - o),
        ], axis=-1)                                         # (TB, 4H) f32
        dgp_c = dgp.astype(dgp_ref.dtype)
        # dh_{t-1} = passthrough + dgates @ Wh^T (contract the 4H axis)
        dh_scr[:] = ((1.0 - m) * Dh
                     + jax.lax.dot_general(
                         dgp_c, wh_ref[:], (((1,), (1,)), ((), ())),
                         preferred_element_type=f32))
        dc_scr[:] = dc_prev
        dgp_ref[0] = dgp_c

    @pl.when(jnp.logical_not(active))
    def _skipped_step():
        dh_scr[:] = ghs_ref[0].astype(f32) + dh_scr[:]
        dgp_ref[0] = jnp.zeros((1, TB, 4 * H), dgp_ref.dtype)[0]

    @pl.when(t_rev == T - 1)
    def _final():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def lstm_layer_bwd_pallas(w, b, x, mask, h_prev_all, c_prev_all,
                          g_hs, g_ht, g_ct, *,
                          interpret: bool | None = None):
    """Run the fused backward kernel; returns (dgp (N,T,4H) in x.dtype,
    dh0 (N,H) f32, dc0 (N,H) f32).

    h_prev_all / c_prev_all are the (N, T, H) PRE-step states (slot t holds
    the state that fed step t, i.e. [init, state_0, ..., state_{T-2}]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, T, E = x.shape
    H = w.shape[1] // 4
    dtype = x.dtype
    E_pad = _round_up(E, LANE)

    wx = w[:E].astype(dtype)
    if E_pad != E:
        wx = jnp.pad(wx, ((0, E_pad - E), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, E_pad - E)))
    wh = w[E:].astype(dtype)
    b2 = b.reshape(1, -1).astype(jnp.float32)

    TB = _pick_tile(T, E_pad, H, jnp.dtype(dtype).itemsize, backward=True,
                    N=N)
    N_pad = _round_up(N, TB)
    if N_pad != N:
        pad2 = ((0, N_pad - N), (0, 0))
        pad3 = pad2 + ((0, 0),)
        x = jnp.pad(x, pad3)
        mask = jnp.pad(mask, pad2)
        h_prev_all = jnp.pad(h_prev_all, pad3)
        c_prev_all = jnp.pad(c_prev_all, pad3)
        g_hs = jnp.pad(g_hs, pad3)
        g_ht = jnp.pad(g_ht, pad2)
        g_ct = jnp.pad(g_ct, pad2)

    tm = lambda a: jnp.swapaxes(a, 0, 1)
    grid = (N_pad // TB, T)
    # index maps receive the scalar-prefetch ref as an extra trailing arg
    rev_blk = lambda i, t, *_: ((T - 1) - t, i, 0)
    row_blk = lambda i, t, *_: (i, 0)
    bounds = _tile_bounds(mask, TB, T)

    # span-clamped reverse fetch: skipped steps (all rows mask-0 there)
    # re-address the nearest in-span block — no DMA.  g_hs stays
    # UNclamped: skipped steps still consume its cotangent.
    rev_clamped = _clamped_step_map(T, reverse=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # the (n_tiles, 2) step bounds
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB, E_pad), rev_clamped,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), rev_clamped, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), rev_clamped, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, T), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # wx
            pl.BlockSpec(memory_space=pl.ANY),   # wh
            pl.BlockSpec(memory_space=pl.ANY),   # b
            pl.BlockSpec((1, TB, H), rev_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, 4 * H), rev_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), row_blk, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((E_pad, 4 * H), dtype),
            pltpu.VMEM((H, 4 * H), dtype),
            pltpu.VMEM((1, 4 * H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    dgp, dh0, dc0 = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, T=T),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, N_pad, 4 * H), dtype),
            jax.ShapeDtypeStruct((N_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((N_pad, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * N_pad * T * (E_pad + H) * 4 * H,
            bytes_accessed=(N_pad * T * (E_pad + 3 * H + 4 * H)) * 2,
            transcendentals=N_pad * T * 4 * H,
        ),
        interpret=interpret,
    )(bounds, tm(x), tm(h_prev_all), tm(c_prev_all), mask.astype(dtype),
      wx, wh, b2, tm(g_hs), g_ht.astype(jnp.float32),
      g_ct.astype(jnp.float32))
    return jnp.swapaxes(dgp, 0, 1)[:N], dh0[:N], dc0[:N]


def _clamped_step_map(T, reverse: bool = False):
    """Block index map over time-major (T, N, ·) arrays that pins
    out-of-span steps to the nearest in-span block: consecutive repeats of
    a block index skip the fetch entirely, so tiles whose rows are shorter
    than T pay DMA only for their real span.  With reverse=True the grid
    index walks time backwards (the backward kernel's convention); the
    clamp algebra is shared so the two directions cannot desynchronize."""
    def index_map(i, t, bounds):
        lo = jnp.minimum(bounds[i, 0], T - 1)
        hi = jnp.maximum(bounds[i, 1] - 1, lo)
        tt = (T - 1) - t if reverse else t
        return (jnp.clip(tt, lo, hi), i, 0)
    return index_map


def _layer_xla(w, b, x, mask, h0, c0):
    """Single-layer pure-JAX twin matching lstm_layer_pallas's numerics:
    f32 carries, matmuls in x.dtype with f32 accumulation."""
    H = w.shape[1] // 4
    E = x.shape[-1]
    wx, wh = w[:E].astype(x.dtype), w[E:].astype(x.dtype)
    bf = b.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)

    def step(carry, xs):
        h, c = carry
        x_t, m_t = xs
        gates = (jnp.dot(x_t, wx, preferred_element_type=jnp.float32)
                 + jnp.dot(h.astype(wh.dtype), wh,
                           preferred_element_type=jnp.float32) + bf)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), h.astype(x.dtype)

    (ht, ct), hs = jax.lax.scan(
        step, (h0, c0),
        (jnp.swapaxes(x, 0, 1), jnp.swapaxes(mask_f, 0, 1)))
    return jnp.swapaxes(hs, 0, 1), ht, ct


# Tests flip this to exercise the fused backward kernel in interpreter
# mode; in production it engages for bf16 compute on TPU.
FORCE_BWD_KERNEL = False


def _use_bwd_kernel(dtype) -> bool:
    if FORCE_BWD_KERNEL:
        return True
    return dtype == jnp.bfloat16 and jax.default_backend() == "tpu"


@jax.custom_vjp
def _layer(w, b, x, mask, h0, c0):
    return lstm_layer_pallas(w, b, x, mask, h0, c0)


def _layer_fwd(w, b, x, mask, h0, c0):
    if _use_bwd_kernel(x.dtype):
        hs, cs, ht, ct = lstm_layer_pallas(w, b, x, mask, h0, c0,
                                           save_cell=True)
    else:
        hs, ht, ct = lstm_layer_pallas(w, b, x, mask, h0, c0)
        cs = None
    return (hs, ht, ct), (w, b, x, mask, h0, c0, hs, cs)


def _layer_bwd_kernel_path(residuals, g):
    """dgp via the fused Pallas kernel; dW/dx as three dense XLA matmuls.

    The dense contraction is a MEASURED decision (round 4): a bounded
    Pallas contraction kernel (span-clamped fetches, revisited f32
    accumulator blocks — skipping the ~2/3 all-zero pad rows at real
    answer lengths) lost to these full padded-width matmuls at flagship
    shapes on v5e — 16.0/13.7 ms (max/realistic) vs 9.9 ms dense for the
    E=300 layer — because the per-grid-step read-modify-write of the
    ~7 MB f32 accumulators plus the grid floor cost more than the padded
    rows, which the MXU contracts at full tilt.  A lax.cond picking per
    batch regressed the full train step further (fusion barrier around
    the operands).  The pad-skip win lives where work is SEQUENTIAL (the
    recurrence kernels' per-tile bounds), not in the contractions.
    """
    w, b, x, mask, h0, c0, hs, cs = residuals
    g_hs, g_ht, g_ct = g
    N, T, E = x.shape
    H = w.shape[1] // 4
    f32 = jnp.float32
    cdt = x.dtype

    h_prev = jnp.concatenate([h0.astype(cdt)[:, None], hs[:, :-1]], axis=1)
    c_prev = jnp.concatenate([c0.astype(cdt)[:, None], cs[:, :-1]], axis=1)
    dgp, dh0, dc0 = lstm_layer_bwd_pallas(
        w, b, x, mask, h_prev, c_prev,
        g_hs.astype(cdt), g_ht, g_ct)

    dgp_flat = dgp.reshape(N * T, 4 * H)
    wx = w[:E].astype(cdt)
    dwx = jnp.dot(x.reshape(N * T, E).T, dgp_flat, preferred_element_type=f32)
    dwh = jnp.dot(h_prev.reshape(N * T, H).T, dgp_flat,
                  preferred_element_type=f32)
    dw = jnp.concatenate([dwx, dwh], axis=0).astype(w.dtype)
    db = jnp.sum(dgp, axis=(0, 1), dtype=f32).astype(b.dtype)
    dx = jnp.dot(dgp_flat, wx.T, preferred_element_type=f32)
    dx = dx.reshape(N, T, E).astype(x.dtype)
    return (dw, db, dx, jnp.zeros_like(mask),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


def _layer_bwd(residuals, g):
    if residuals[-1] is not None:   # cs saved => fused kernel path
        return _layer_bwd_kernel_path(residuals, g)
    residuals = residuals[:-1]
    """Hand-written batched LSTM backward.

    XLA's autodiff of the forward scan accumulates dWx/dWh with one matmul
    pair per timestep inside the transposed scan — measured ~5x the forward
    cost at VisDial shapes.  Here only the true recurrence (dh flowing back
    through Wh) runs sequentially; gate pre-activations and cell states are
    REBUILT from the saved hidden states with one batched matmul + an
    elementwise scan, and all weight/input gradients collapse into three
    big MXU matmuls over the flattened (N*T) axis.
    """
    w, b, x, mask, h0, c0, hs = residuals
    g_hs, g_ht, g_ct = g
    N, T, E = x.shape
    H = w.shape[1] // 4
    f32 = jnp.float32
    cdt = x.dtype                                   # compute dtype

    wx, wh = w[:E].astype(cdt), w[E:].astype(cdt)
    m_all = jnp.swapaxes(mask, 0, 1).astype(f32)[..., None]     # (T, N, 1)
    x_tm = jnp.swapaxes(x, 0, 1)                                # (T, N, E)
    hs_tm = jnp.swapaxes(hs, 0, 1).astype(f32)                  # (T, N, H)
    h_prev = jnp.concatenate([h0[None].astype(f32), hs_tm[:-1]], 0)

    # Rebuild gate activations with ONE batched matmul over N*T rows.
    # Stored (T,N,·) intermediates stay in the compute dtype (bf16 fast
    # path) — this backward is HBM-bandwidth-bound, not FLOP-bound; math
    # happens in f32 after register upcasts.
    gp = (jnp.dot(x_tm.reshape(T * N, E), wx,
                  preferred_element_type=f32).reshape(T, N, 4 * H)
          + jnp.dot(h_prev.astype(cdt).reshape(T * N, H), wh,
                    preferred_element_type=f32).reshape(T, N, 4 * H)
          + b.astype(f32))
    i_g = jax.nn.sigmoid(gp[..., :H]).astype(cdt)
    f_g = jax.nn.sigmoid(gp[..., H:2 * H]).astype(cdt)
    g_g = jnp.tanh(gp[..., 2 * H:3 * H]).astype(cdt)
    o_g = jax.nn.sigmoid(gp[..., 3 * H:]).astype(cdt)

    # Rebuild pre-mask cell states with a cheap elementwise scan.
    def c_step(c_prev, ins):
        i_t, f_t, g_t, m_t = ins
        cn = (f_t.astype(f32) * c_prev + i_t.astype(f32) * g_t.astype(f32))
        c_t = m_t * cn + (1.0 - m_t) * c_prev
        return c_t, (c_prev.astype(cdt), jnp.tanh(cn).astype(cdt))

    _, (c_prev_all, tanh_cn) = jax.lax.scan(
        c_step, c0.astype(f32), (i_g, f_g, g_g, m_all))

    # Reverse scan: only dgates @ Wh^T is sequential.
    wh_T = wh.T                                              # (4H, H)
    g_hs_tm = jnp.swapaxes(g_hs, 0, 1).astype(cdt)           # (T, N, H)
    m_all_c = m_all.astype(cdt)

    def bwd_step(carry, ins):
        dh_rec, dc_rec = carry
        g_h, m_c, i_c, f_c, g_c, o_c, cp_c, tcn_c = ins
        m_t = m_c.astype(f32)
        i_t, f_t, g_t, o_t = (i_c.astype(f32), f_c.astype(f32),
                              g_c.astype(f32), o_c.astype(f32))
        cp, tcn = cp_c.astype(f32), tcn_c.astype(f32)
        Dh = g_h.astype(f32) + dh_rec
        Dc = dc_rec
        dhn = m_t * Dh
        dcn = m_t * Dc + dhn * o_t * (1.0 - tcn * tcn)
        dc_prev = (1.0 - m_t) * Dc + dcn * f_t
        dgp = jnp.concatenate([
            (dcn * g_t) * i_t * (1.0 - i_t),
            (dcn * cp) * f_t * (1.0 - f_t),
            (dcn * i_t) * (1.0 - g_t * g_t),
            (dhn * tcn) * o_t * (1.0 - o_t),
        ], axis=-1).astype(cdt)                              # (N, 4H)
        dh_prev = ((1.0 - m_t) * Dh
                   + jnp.dot(dgp, wh_T, preferred_element_type=f32))
        return (dh_prev, dc_prev), dgp

    (dh0, dc0), dgp_all = jax.lax.scan(
        bwd_step,
        (g_ht.astype(f32), g_ct.astype(f32)),
        (g_hs_tm, m_all_c, i_g, f_g, g_g, o_g, c_prev_all, tanh_cn),
        reverse=True)

    # All weight/input grads as three big matmuls.
    dgp_flat = dgp_all.reshape(T * N, 4 * H)
    dwx = jnp.dot(x_tm.reshape(T * N, E).T, dgp_flat,
                  preferred_element_type=f32)
    dwh = jnp.dot(h_prev.astype(cdt).reshape(T * N, H).T, dgp_flat,
                  preferred_element_type=f32)
    dw = jnp.concatenate([dwx, dwh], axis=0).astype(w.dtype)
    db = jnp.sum(dgp_all, axis=(0, 1), dtype=f32).astype(b.dtype)
    dx = jnp.dot(dgp_flat, wx.T, preferred_element_type=f32)
    dx = jnp.swapaxes(dx.reshape(T, N, E), 0, 1).astype(x.dtype)
    return (dw, db, dx, jnp.zeros_like(mask),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


_layer.defvjp(_layer_fwd, _layer_bwd)


def masked_lstm_pallas(params, x, mask, h0=None, c0=None, *,
                       dropout_rng=None, dropout_rate: float = 0.0,
                       interpret: bool = False):
    """Drop-in fused twin of ops.lstm.masked_lstm(impl='xla').

    Returns (outputs (N,T,H) in x.dtype, (h_final, c_final) each (L,N,H)
    in x.dtype).  Inter-layer dropout happens between kernel calls at the
    XLA level, exactly like the pure twin.
    """
    layers = params["layers"]
    num_layers = len(layers)
    N = x.shape[0]
    H = layers[0]["w"].shape[1] // 4
    mask_f = mask.astype(jnp.float32)
    if h0 is None:
        h0 = jnp.zeros((num_layers, N, H), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((num_layers, N, H), jnp.float32)

    layer_in = x
    h_fin, c_fin = [], []
    for li, lp in enumerate(layers):
        args = (lp["w"], lp["b"], layer_in, mask_f,
                h0[li].astype(jnp.float32), c0[li].astype(jnp.float32))
        if interpret:  # test path: direct kernel call in interpreter mode
            hs, ht, ct = lstm_layer_pallas(*args, interpret=True)
        else:
            hs, ht, ct = _layer(*args)
        h_fin.append(ht)
        c_fin.append(ct)
        layer_in = hs
        if li < num_layers - 1 and dropout_rate > 0.0 and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - dropout_rate
            dm = jax.random.bernoulli(sub, keep, layer_in.shape)
            layer_in = jnp.where(dm, layer_in / keep, 0.0)

    out_dtype = x.dtype
    return (layer_in,
            (jnp.stack(h_fin).astype(out_dtype),
             jnp.stack(c_fin).astype(out_dtype)))

"""Retrieval evaluation harness.

Implements the reference protocol exactly (reference: evaluate.lua main
loop; SURVEY.md §3.2 invariants): 100 candidates per round, 10 rounds per
dialog, ground truth always among the candidates, rank from raw scores,
then MRR / R@1 / R@5 / R@10 / mean rank over every (dialog, round).
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from .config import Config
from .data.dataset import VisDialSplit, Vocabulary
from .data.loader import EvalLoader
from .parallel.mesh import shard_batch


from .parallel.train_step import (
    make_disc_table_eval_fns,
    make_eval_fn,
    make_gen_bucket_eval_fns,
)
from .utils.metrics import (
    candidate_rankings,
    ranks_from_scores,
    retrieval_metrics,
)


@functools.lru_cache(maxsize=16)
def _cached_disc_table_fns(cfg: Config, mesh):
    """One compiled (table_fn, score_fn) pair per (cfg, mesh): repeated
    evaluate_split calls without explicit table_fns (finetune's periodic
    NDCG, sweeps) reuse the jitted programs instead of re-jitting fresh
    lambdas each call (advisor finding, round 2)."""
    return make_disc_table_eval_fns(cfg, mesh)


@functools.lru_cache(maxsize=16)
def _cached_gen_bucket_fns(cfg: Config, mesh):
    return make_gen_bucket_eval_fns(cfg, mesh)

# Batch fields any encoder reads; everything else an eval fast path needs
# stays on the host or is gathered on device from once-uploaded tables.
# (fact_len intentionally absent: encoders derive the fact mask from
# facts != 0, so shipping/caching it on device would be dead weight.)
_ENCODER_BATCH_KEYS = ("ques", "hist_concat", "hist_flat", "hist_bounds",
                       "facts", "img")


@functools.lru_cache(maxsize=None)
def _rank_fn(ties: str):
    """Jitted on-device rank computation; memoized so repeated evals in a
    training run reuse the compiled program."""
    return jax.jit(functools.partial(ranks_from_scores, ties=ties))


@functools.lru_cache(maxsize=None)
def _cand_rank_fn():
    """Jitted full-permutation ranking (v1.0 dump/NDCG path)."""
    return jax.jit(candidate_rankings)


@functools.lru_cache(maxsize=None)
def _combine_fn(brk: int):
    """Jitted bucket-score scatter (index brk = dumpster slot for padded
    rows); memoized per flat size."""

    def combine(parts, scatter_idxs):
        flat = jnp.zeros(brk + 1, jnp.float32)
        for s, i in zip(parts, scatter_idxs):
            flat = flat.at[i].set(s.astype(jnp.float32))
        return flat[:brk]

    return jax.jit(combine)


def _staged(iterable, stage):
    """Yield stage(item) one ahead of consumption (background thread).

    The producer checks a stop flag around its bounded put so that a
    consumer abandoning the generator mid-split (an exception downstream)
    releases the thread and the staged device buffers it holds instead of
    leaking them blocked on a full queue.
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=2)
    stop = threading.Event()

    def produce():
        try:
            for item in iterable:
                staged = stage(item)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(None)
        except BaseException as e:  # surface in the consumer, don't hang it
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # drop staged leftovers so buffers free
            q.get_nowait()


class _GenBucketPlan:
    """Length-bucket plan for gen candidate scoring over one split.

    Scoring a candidate at any static width >= its length+1 is exact
    (masked steps contribute zero), so rows are assigned to the narrowest
    sufficient bucket.  Bucket capacities are the exact per-batch maxima
    over the split's deterministic batch sequence (rounded up to the
    128-lane width), making every score call a static shape: no overflow,
    no recompilation after the first epoch of shapes.
    """

    def __init__(self, data: VisDialSplit, batch_size: int):
        T_full = int(data.opt_list.shape[1]) + 1   # tokens + <END>
        self.T_full = T_full
        widths = sorted({max(2, (T_full + 2) // 3),
                         max(3, (2 * T_full + 2) // 3), T_full})
        self.widths = widths
        n, bs = data.num_dialogs, batch_size
        edges = np.asarray(widths)
        caps = np.zeros(len(widths), np.int64)
        # one batch of the (N, R, K) lens at a time — the full array is
        # ~160 MB at v0.9-val scale and this runs once per (split, bs)
        for s in range(0, n, bs):
            idx = np.arange(s, min(s + bs, n))
            if len(idx) < bs:                                # pad_to repeats
                idx = np.concatenate([idx, np.repeat(idx[-1:], bs - len(idx))])
            lens = data.opt_list_len[data.opt_inds[idx]] + 1
            b = np.searchsorted(edges, lens.reshape(-1))
            caps = np.maximum(caps, np.bincount(b, minlength=len(widths)))
        self.caps = [int(-(-c // 128) * 128) for c in caps]

    @classmethod
    def cached(cls, data: VisDialSplit, batch_size: int) -> "_GenBucketPlan":
        """Reuse the plan across evaluate_split calls (it is a pure
        function of the split's option arrays and the batch size)."""
        cache = data.__dict__.setdefault("_gen_bucket_plans", {})
        key = (batch_size, int(data.opt_list.shape[1]))
        if key not in cache:
            cache[key] = cls(data, batch_size)
        return cache[key]

    def assign(self, opt_len: np.ndarray) -> list[np.ndarray]:
        """Flat row positions per bucket for one batch (opt_len (B,R,K))."""
        need = opt_len.reshape(-1) + 1
        b = np.searchsorted(np.asarray(self.widths), need)
        return [np.flatnonzero(b == i) for i in range(len(self.widths))]


class _ResidentEvalBase:
    """Shared staging for the device-resident whole-split evaluators.

    The streaming harness below re-ships every batch from the host each
    eval; on a high-latency host<->device link (this box's tunneled chip:
    ~30 ms/sync, ~30 MB/s put) that transfer bounds end-to-end throughput
    well under the device's compute roofline.  The resident path assembles
    every eval batch once, uploads the stacked arrays once — (nb, bs, ...)
    with the dialog axis sharded over 'data' — and scores the entire split
    in ONE dispatch: a jitted lax.scan over batches with a single
    (nb, bs, R) int32 ranks readback (plus the (nb, bs, R, K) full
    permutations when collecting rankings).  Repeated evals (the train
    loop's periodic eval, sweeps, benchmarks) then run at pure-device
    speed.  Memory is gated by `max_bytes` with a streaming fallback;
    scores are bit-identical to the streaming paths
    (tests/test_resident_eval.py).  Subclasses provide the decoder-
    specific stacking tail + scan body and set self._make_run/self.run.
    """

    @classmethod
    def cached(cls, data, vocab, cfg, mesh, batch_size, ties, max_bytes):
        cache = data.__dict__.setdefault("_resident_eval", {})
        key = (cls.__name__, batch_size, cfg,
               tuple(sorted(mesh.shape.items())), ties, max_bytes)
        if key not in cache:
            cache[key] = cls(data, vocab, cfg, mesh, batch_size, ties,
                             max_bytes)
        return cache[key]

    @property
    def run_cand(self):
        """Lazily compiled variant also returning full candidate rankings
        (the v1.0 dump/NDCG payload) from the same single dispatch."""
        if getattr(self, "_run_cand", None) is None:
            self._run_cand = self._make_run(True)
        return self._run_cand

    def _stack_split(self, data, vocab, cfg, batch_size, extra_keys,
                     per_batch=None) -> dict:
        """Assemble the whole split into (nb, bs, ...) host stacks and set
        the metrics (keep) / dump (keep_dump) masks; per_batch hooks
        decoder-specific staging (the gen bucket tensors)."""
        loader = EvalLoader(data, vocab, cfg, batch_size=batch_size,
                            option_tokens=False)
        keys, host, valids, dumps = None, [], [], []
        for b in loader:
            d = b.as_dict()
            if keys is None:
                keys = tuple(k for k in _ENCODER_BATCH_KEYS + extra_keys
                             if k in d)
            host.append([d[k] for k in keys])
            valids.append(b.dialog_valid.astype(bool)[:, None]
                          & b.round_valid.astype(bool))
            dumps.append(b.dialog_valid.astype(bool)[:, None]
                         & b.round_scoreable.astype(bool))
            if per_batch is not None:
                per_batch(b)
        self.keep = np.stack(valids)                    # (nb, bs, R)
        self.keep_dump = np.stack(dumps)
        return {k: np.stack([h[i] for h in host])
                for i, k in enumerate(keys)}

    def _finish_build(self, t0: float) -> None:
        # wait for the uploads so build time is accounted here, not in the
        # first timed eval (block_until_ready is a no-op under the tunnel —
        # a 1-element readback is the documented sync)
        probe = next(iter(self.stacks.values()))
        np.asarray(jax.device_get(probe[(0,) * probe.ndim]))
        self.build_seconds = time.time() - t0
        # per-variant run counts (keyed by collect_rankings): the first run
        # of each compiled variant pays the one-off scan compile and gets
        # tagged cold_compile by evaluate_split
        self._runs: dict = {}


class _ResidentDiscEval(_ResidentEvalBase):
    """Disc variant: scan body = encoder forward + option-table gather +
    on-device GT ranks.  The opt_list rows are uploaded once here; only
    the option-embedding table is rebuilt per call (it depends on params).
    """

    def __init__(self, data: VisDialSplit, vocab: Vocabulary, cfg: Config,
                 mesh, batch_size: int, ties: str, max_bytes: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import replicated
        from .parallel.train_step import state_shardings

        t0 = time.time()
        stacks_np = self._stack_split(data, vocab, cfg, batch_size,
                                      ("opt_inds", "gt_ind"))
        self.nbytes = (sum(v.nbytes for v in stacks_np.values())
                       + data.opt_list.nbytes)
        self.ok = self.nbytes <= max_bytes
        if not self.ok:
            return
        rep = replicated(mesh)
        # same degrade policy as mesh.shard_batch: a per-batch dialog
        # count not divisible by the data axis stages replicated
        bs = next(iter(stacks_np.values())).shape[1]
        stk = (NamedSharding(mesh, P(None, "data"))
               if bs % mesh.shape["data"] == 0 else rep)
        self.stacks = {k: jax.device_put(v, stk) for k, v in stacks_np.items()}
        self.opt_list = jax.device_put(data.opt_list.astype(np.int32), rep)
        shardings = (state_shardings(cfg, mesh).params, rep,
                     {k: stk for k in self.stacks})

        def make_run(with_cand: bool):
            def run(params, table, stacks):
                from .models.model import model_scores_with_table

                def body(_, batch):
                    gt = batch.pop("gt_ind")
                    scores = model_scores_with_table(params, batch, table,
                                                     cfg)
                    r = ranks_from_scores(scores, gt, ties=ties)
                    return _, ((r, candidate_rankings(scores)) if with_cand
                               else r)

                _, out = jax.lax.scan(body, None, stacks)
                return out                            # (nb, bs, R) [+ ..K]

            return jax.jit(run, in_shardings=shardings)

        self._make_run = make_run
        self.run = make_run(False)
        self._finish_build(t0)


class _ResidentGenEval(_ResidentEvalBase):
    """Gen variant: the length-bucket structure of the streaming fast path
    is preserved — every candidate row scores at the narrowest sufficient
    static width (_GenBucketPlan, exact by construction) — but the
    per-batch bucket index tensors are precomputed for the whole split,
    uploaded once, and the scan body scores all buckets + scatters +
    ranks on device.  The opt_list/opt_len upload is part of the cache
    (params-free), so warm evals ship NOTHING to the device."""

    def __init__(self, data: VisDialSplit, vocab: Vocabulary, cfg: Config,
                 mesh, batch_size: int, ties: str, max_bytes: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .models.encoders import encoder_apply
        from .models.model import _impl
        from .parallel.mesh import replicated
        from .parallel.train_step import gen_rows_score, state_shardings

        t0 = time.time()
        plan = _GenBucketPlan.cached(data, batch_size)
        active = [(w, c) for w, c in zip(plan.widths, plan.caps) if c > 0]
        K = cfg.num_options
        R = cfg.num_rounds
        BRK = batch_size * R * K
        bucket_host = [{"rows": [], "ridx": [], "scat": []} for _ in active]

        def stage_buckets(b):
            flat_rows = b.opt_inds.reshape(-1)
            assign = plan.assign(b.opt_len)
            ai = 0
            for i, (width, cap) in enumerate(zip(plan.widths, plan.caps)):
                if cap == 0:
                    continue
                rows = assign[i]
                pad = cap - len(rows)
                assert pad >= 0, (cap, len(rows))
                rpad = np.pad(rows, (0, pad))
                bucket_host[ai]["rows"].append(
                    flat_rows[rpad].astype(np.int32))
                bucket_host[ai]["ridx"].append((rpad // K).astype(np.int32))
                bucket_host[ai]["scat"].append(np.concatenate(
                    [rows, np.full(pad, BRK)]).astype(np.int32))
                ai += 1

        stacks_np = self._stack_split(data, vocab, cfg, batch_size,
                                      ("gt_ind",), per_batch=stage_buckets)
        buckets_np = tuple({k: np.stack(v) for k, v in bh.items()}
                           for bh in bucket_host)
        self.nbytes = (sum(v.nbytes for v in stacks_np.values())
                       + sum(v.nbytes for bh in buckets_np
                             for v in bh.values())
                       + data.opt_list.nbytes + data.opt_list_len.nbytes)
        self.ok = self.nbytes <= max_bytes
        if not self.ok:
            return

        rep = replicated(mesh)
        # same degrade policy as mesh.shard_batch (see _ResidentDiscEval)
        bs = next(iter(stacks_np.values())).shape[1]
        stk = (NamedSharding(mesh, P(None, "data"))
               if bs % mesh.shape["data"] == 0 else rep)
        self.stacks = {k: jax.device_put(v, stk) for k, v in stacks_np.items()}
        self.buckets = jax.tree.map(lambda v: jax.device_put(v, rep),
                                    buckets_np)
        self.opt_list = jax.device_put(data.opt_list.astype(np.int32), rep)
        self.opt_len = jax.device_put(data.opt_list_len.astype(np.int32), rep)
        impl_ = _impl(cfg)
        start, end = vocab.start, vocab.end

        shardings = (state_shardings(cfg, mesh).params, rep, rep,
                     {k: stk for k in self.stacks},
                     jax.tree.map(lambda _: rep, buckets_np))

        def make_run(with_cand: bool):
            def run(params, opt_list, opt_len, stacks, buckets):
                def body(_, xs):
                    batch, bks = xs
                    gt = batch.pop("gt_ind")
                    joint = encoder_apply(params["encoder"], params["embed"],
                                          batch, cfg, train=False, rng=None,
                                          impl=impl_)
                    flat = jnp.zeros(BRK + 1, jnp.float32)
                    for (width, _cap), bk in zip(active, bks):
                        s = gen_rows_score(params, joint, opt_list, opt_len,
                                           bk["rows"], bk["ridx"], width,
                                           start, end, cfg, impl=impl_)
                        flat = flat.at[bk["scat"]].set(s.astype(jnp.float32))
                    scores = flat[:BRK].reshape(-1, R, K)
                    r = ranks_from_scores(scores, gt, ties=ties)
                    return _, ((r, candidate_rankings(scores)) if with_cand
                               else r)

                _, out = jax.lax.scan(body, None, (stacks, buckets))
                return out

            return jax.jit(run, in_shardings=shardings)

        self._make_run = make_run
        self.run = make_run(False)
        self._finish_build(t0)


def evaluate_split(params, data: VisDialSplit, vocab: Vocabulary,
                   cfg: Config, mesh, eval_fn=None, table_fns=None,
                   gen_fns=None, batch_size: int | None = None,
                   ties: str = "optimistic",
                   collect_rankings: bool = False,
                   resident: bool = False,
                   resident_max_bytes: int = 4 << 30):
    """Score all candidates over a split and compute retrieval metrics.

    Disc decoder takes the table fast path: the dedup'd option list is
    embedded once per call, then every batch is encoder-forward + a table
    gather (exact same scores as the direct path — no dropout at eval).
    Gen takes the length-bucketed path when cfg.gen_eval_bucketed (exact
    same scores; ~40% fewer FLOPs at real answer lengths).  Pass table_fns
    (make_disc_table_eval_fns) / gen_fns (make_gen_bucket_eval_fns) to
    reuse compiled fns across evals; pass False (or an explicit eval_fn)
    to force the direct path.

    Returns the metric dict plus throughput: 'evals_per_sec' counts
    100-candidate ranking evaluations (i.e. dialog rounds scored) per
    second — the eval north-star in BASELINE.json.

    collect_rankings=True additionally returns the full per-candidate
    rankings as an (N, R, K) int32 array (1-indexed permutations; padded /
    invalid rounds hold zeros) — the v1.0 challenge-dump / NDCG payload —
    i.e. the return becomes ``(metrics, cand_ranks)``.

    resident=True caches the split's eval batches ON DEVICE and scores the
    whole split in one dispatch (_ResidentDiscEval / _ResidentGenEval;
    composes with collect_rankings via a second compiled variant) —
    identical scores, pure-device throughput on repeated evals.  Falls
    back to streaming when the stacks exceed resident_max_bytes or when
    the caller forces a specific path (explicit eval_fn, table_fns=False,
    gen_fns=False, or an unbucketed gen config).
    """
    resident_ok = (resident and eval_fn is None
                   and ((cfg.decoder == "disc" and table_fns is not False)
                        or (cfg.decoder == "gen" and cfg.gen_eval_bucketed
                            and gen_fns is not False)))
    if resident_ok:
        cls = _ResidentDiscEval if cfg.decoder == "disc" else _ResidentGenEval
        res = cls.cached(data, vocab, cfg, mesh,
                         batch_size or cfg.batch_size, ties,
                         resident_max_bytes)
        if res.ok:
            run = res.run_cand if collect_rankings else res.run
            t0 = time.time()
            if cfg.decoder == "disc":
                table_fn, _ = table_fns or _cached_disc_table_fns(cfg, mesh)
                table = table_fn(params, res.opt_list)
                out_dev = run(params, table, res.stacks)
            else:
                out_dev = run(params, res.opt_list, res.opt_len,
                              res.stacks, res.buckets)
            ranks_dev, cand_dev = out_dev if collect_rankings \
                else (out_dev, None)
            ranks = np.asarray(ranks_dev)
            cand = np.asarray(cand_dev) if collect_rankings else None
            elapsed = time.time() - t0      # includes BOTH readbacks
            metrics = retrieval_metrics(ranks[res.keep])
            metrics["evals_per_sec"] = int(res.keep.sum()) / max(elapsed, 1e-9)
            metrics["eval_seconds"] = elapsed
            metrics["resident_cache_seconds"] = res.build_seconds
            metrics["resident_cache_bytes"] = res.nbytes
            # The first run of each compiled variant pays the one-off scan
            # compile (minutes cold on a 1-CPU host); tag it so logged eval
            # throughput isn't read as steady state (advisor finding).
            res._runs[collect_rankings] = \
                res._runs.get(collect_rankings, 0) + 1
            if res._runs[collect_rankings] == 1:
                metrics["cold_compile"] = True
            if collect_rankings:
                cand = np.where(res.keep_dump[..., None], cand, 0)
                return metrics, cand.reshape(
                    -1, cfg.num_rounds, cfg.num_options)[:data.num_dialogs]
            return metrics
    # An explicitly supplied eval_fn wins (callers forcing the direct path);
    # otherwise each decoder defaults to its fast path.
    use_table = (cfg.decoder == "disc" and table_fns is not False
                 and (table_fns is not None or eval_fn is None))
    use_buckets = (cfg.decoder == "gen" and cfg.gen_eval_bucketed
                   and gen_fns is not False
                   and (gen_fns is not None or eval_fn is None))
    # Fast paths gather candidate tokens on device from the split's
    # opt_list (uploaded once) — neither assemble nor ship the ~3 MB/batch
    # expanded rows; only the direct twin still takes them.
    loader = EvalLoader(data, vocab, cfg, batch_size=batch_size,
                        option_tokens=not (use_table or use_buckets))
    device_keys = None                 # None = ship the whole batch
    if use_table:
        table_fn, score_fn = table_fns or _cached_disc_table_fns(cfg, mesh)
        table = table_fn(params, jnp.asarray(data.opt_list))
        device_keys = _ENCODER_BATCH_KEYS + ("opt_inds", "gt_ind")
        score = lambda dev, _batch: score_fn(params, table, dev)
    elif use_buckets:
        from .parallel.mesh import replicated

        encoder_fn, row_fn = gen_fns or _cached_gen_bucket_fns(cfg, mesh)
        plan = _GenBucketPlan.cached(data, loader.bs)
        rep = replicated(mesh)
        opt_list_dev = jax.device_put(data.opt_list, rep)
        opt_len_dev = jax.device_put(data.opt_list_len.astype(np.int32), rep)
        device_keys = _ENCODER_BATCH_KEYS + ("gt_ind",)
        K = cfg.num_options
        BRK = loader.bs * cfg.num_rounds * K
        combine = _combine_fn(BRK)   # one readback per batch

        def stage_buckets(batch):
            """Per-bucket index tensors, device_put from the staging thread
            (overlapped with the previous batch's compute — tiny-array put
            latency dominates on high-latency links)."""
            flat_rows = batch.opt_inds.reshape(-1)
            out = []
            for width, cap, rows in zip(plan.widths, plan.caps,
                                        plan.assign(batch.opt_len)):
                if cap == 0:
                    continue
                pad = cap - len(rows)                         # exact caps:
                assert pad >= 0, (cap, len(rows))             # never overflow
                rpad = np.pad(rows, (0, pad))
                # padded slots repeat row 0 (possibly truncated) and scatter
                # into the dumpster slot — correctness is unaffected
                scatter = np.concatenate(
                    [rows, np.full(pad, BRK)]).astype(np.int32)
                out.append((
                    width,
                    jax.device_put(flat_rows[rpad].astype(np.int32), rep),
                    jax.device_put((rpad // K).astype(np.int32), rep),
                    jax.device_put(scatter, rep),
                ))
            return out

        def score(dev, batch):
            joint = encoder_fn(params, dev)                   # (N, H)
            B, R = batch.gt_ind.shape
            parts, idxs = [], []
            for width, rows_dev, ridx_dev, scat_dev in batch._buckets:
                parts.append(row_fn(params, joint, opt_list_dev, opt_len_dev,
                                    rows_dev, ridx_dev,
                                    width, vocab.start, vocab.end))
                idxs.append(scat_dev)
            return combine(tuple(parts), tuple(idxs)).reshape(B, R, K)
    else:
        direct_fn = eval_fn or make_eval_fn(cfg, mesh)
        score = lambda dev, _batch: direct_fn(params, dev)

    def stage(batch):
        d = batch.as_dict()
        if device_keys is not None:
            d = {k: d[k] for k in device_keys if k in d}
        if use_buckets:
            batch._buckets = stage_buckets(batch)
        return shard_batch(d, mesh), batch

    rank_fn = _rank_fn(ties)
    cand_fn = _cand_rank_fn() if collect_rankings else None
    cand_ranks_out = (
        np.zeros((data.num_dialogs, cfg.num_rounds, cfg.num_options),
                 np.int32) if collect_rankings else None)

    all_ranks = []
    t0 = time.time()
    n_rounds = 0

    def consume(pending):
        ranks_dev, cand_dev, start, batch = pending
        ranks = np.asarray(ranks_dev)   # tiny (B, R) readback
        keep = (batch.dialog_valid.astype(bool)[:, None]
                & batch.round_valid.astype(bool))
        all_ranks.append(ranks[keep])
        if cand_dev is not None:
            cand = np.asarray(cand_dev)            # (B, R, K)
            # dump gate: scoreable (full candidate list), not rankable —
            # the v1.0 test split's submission rounds have no ground truth
            dump = (batch.dialog_valid.astype(bool)[:, None]
                    & batch.round_scoreable.astype(bool))
            n_real = min(start + cand.shape[0], data.num_dialogs) - start
            cand_ranks_out[start:start + n_real] = np.where(
                dump[:n_real, :, None], cand[:n_real], 0)
        return int(keep.sum())

    # Pipeline (3 stages deep): the staging thread assembles + device_puts
    # batch i+1 while the device scores batch i, and batch i-1's tiny rank
    # readback (the only host sync) happens while batch i computes — the
    # async-feed design of record (SURVEY.md §5 comm backend row).  Ranks
    # are computed ON DEVICE: the per-batch readback is (B, R) int32, not
    # the (B, R, K) score tensor.
    pending = None
    for bi, (dev, batch) in enumerate(_staged(loader, stage)):
        scores = score(dev, batch)
        gt_dev = dev["gt_ind"] if "gt_ind" in dev else jnp.asarray(batch.gt_ind)
        ranks_dev = rank_fn(scores, gt_dev)
        cand_dev = cand_fn(scores) if cand_fn is not None else None
        if pending is not None:
            n_rounds += consume(pending)
        pending = (ranks_dev, cand_dev, bi * loader.bs, batch)
    if pending is not None:
        n_rounds += consume(pending)
    elapsed = time.time() - t0
    metrics = retrieval_metrics(np.concatenate(all_ranks))
    metrics["evals_per_sec"] = n_rounds / max(elapsed, 1e-9)
    metrics["eval_seconds"] = elapsed
    if collect_rankings:
        return metrics, cand_ranks_out
    return metrics

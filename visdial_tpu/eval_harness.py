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
from .utils.metrics import ranks_from_scores, retrieval_metrics

# Batch fields any encoder reads; everything else an eval fast path needs
# stays on the host or is gathered on device from once-uploaded tables.
_ENCODER_BATCH_KEYS = ("ques", "hist_concat", "hist_flat", "hist_bounds",
                       "facts", "fact_len", "img")


@functools.lru_cache(maxsize=None)
def _rank_fn(ties: str):
    """Jitted on-device rank computation; memoized so repeated evals in a
    training run reuse the compiled program."""
    return jax.jit(functools.partial(ranks_from_scores, ties=ties))


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

    def __init__(self, data: VisDialSplit, cfg: Config, batch_size: int):
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
    def cached(cls, data: VisDialSplit, cfg: Config,
               batch_size: int) -> "_GenBucketPlan":
        """Reuse the plan across evaluate_split calls (it is a pure
        function of the split's option arrays and the batch size)."""
        cache = data.__dict__.setdefault("_gen_bucket_plans", {})
        key = (batch_size, int(data.opt_list.shape[1]))
        if key not in cache:
            cache[key] = cls(data, cfg, batch_size)
        return cache[key]

    def assign(self, opt_len: np.ndarray) -> list[np.ndarray]:
        """Flat row positions per bucket for one batch (opt_len (B,R,K))."""
        need = opt_len.reshape(-1) + 1
        b = np.searchsorted(np.asarray(self.widths), need)
        return [np.flatnonzero(b == i) for i in range(len(self.widths))]


def evaluate_split(params, data: VisDialSplit, vocab: Vocabulary,
                   cfg: Config, mesh, eval_fn=None, table_fns=None,
                   gen_fns=None, batch_size: int | None = None,
                   ties: str = "optimistic") -> dict:
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
    """
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
        table_fn, score_fn = table_fns or make_disc_table_eval_fns(cfg, mesh)
        table = table_fn(params, jnp.asarray(data.opt_list))
        device_keys = _ENCODER_BATCH_KEYS + ("opt_inds", "gt_ind")
        score = lambda dev, _batch: score_fn(params, table, dev)
    elif use_buckets:
        from .parallel.mesh import replicated

        encoder_fn, row_fn = gen_fns or make_gen_bucket_eval_fns(cfg, mesh)
        plan = _GenBucketPlan.cached(data, cfg, loader.bs)
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

    all_ranks = []
    t0 = time.time()
    n_rounds = 0

    def consume(pending):
        ranks_dev, batch = pending
        ranks = np.asarray(ranks_dev)   # tiny (B, R) readback
        keep = (batch.dialog_valid.astype(bool)[:, None]
                & batch.round_valid.astype(bool))
        all_ranks.append(ranks[keep])
        return int(keep.sum())

    # Pipeline (3 stages deep): the staging thread assembles + device_puts
    # batch i+1 while the device scores batch i, and batch i-1's tiny rank
    # readback (the only host sync) happens while batch i computes — the
    # async-feed design of record (SURVEY.md §5 comm backend row).  Ranks
    # are computed ON DEVICE: the per-batch readback is (B, R) int32, not
    # the (B, R, K) score tensor.
    pending = None
    for dev, batch in _staged(loader, stage):
        scores = score(dev, batch)
        gt_dev = dev["gt_ind"] if "gt_ind" in dev else jnp.asarray(batch.gt_ind)
        ranks_dev = rank_fn(scores, gt_dev)
        if pending is not None:
            n_rounds += consume(pending)
        pending = (ranks_dev, batch)
    if pending is not None:
        n_rounds += consume(pending)
    elapsed = time.time() - t0
    metrics = retrieval_metrics(np.concatenate(all_ranks))
    metrics["evals_per_sec"] = n_rounds / max(elapsed, 1e-9)
    metrics["eval_seconds"] = elapsed
    return metrics

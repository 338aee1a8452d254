"""Golden numeric regression fixtures (SURVEY.md §4 items 1-3, hard part #5).

Real-data parity (MRR +-0.002 vs the published table, SURVEY.md §6) is
blocked on this box: no VisDial JSON, no network.  The best available
substitute is a frozen numeric contract: for every one of the 18
encoder x decoder combos, exact expected values on f32 CPU — loss at init,
loss after 5 train steps, the full candidate-score matrix, and the derived
ranks — computed once and checked in.  Any kernel/optimization/refactor
that silently changes the math fails this test.

Regenerate (only when an INTENTIONAL math change lands, and say so in the
commit message):

    python tests/test_golden.py --write
"""

import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden", "golden_v1.npz")

# Frozen fixture hyperparameters — changing any of these invalidates the
# checked-in numbers.
FIXTURE = dict(
    vocab_size=0,  # filled from the synthetic vocab
    embed_size=16, rnn_hidden_size=24, num_layers=2,
    img_feat_size=32, img_embed_size=16,
    max_ques_len=6, max_ans_len=4, max_cap_len=8,
    num_rounds=3, num_options=8, batch_size=4,
    dropout=0.0, use_pallas=False, seed=0,
    learning_rate=0.004,
)
NUM_DIALOGS = 8
TRAIN_STEPS = 5


def _all_combos():
    from visdial_tpu.config import DECODERS, ENCODERS

    return [(e, d) for e in ENCODERS for d in DECODERS]


def _compute_combo(encoder: str, decoder: str) -> dict:
    """Deterministic numbers for one combo on the current backend (f32)."""
    from functools import partial

    import jax

    # The fixture was generated under jax's default threefry PRNG; pin it
    # so an earlier in-process CLI run (train.py sets the global impl)
    # cannot change what PRNGKey(seed) means here.
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    from visdial_tpu.config import Config
    from visdial_tpu.data.loader import EvalLoader, TrainLoader
    from visdial_tpu.data.synthetic import make_synthetic_split
    from visdial_tpu.models.model import model_loss, model_scores
    from visdial_tpu.parallel.train_step import init_train_state, train_step
    from visdial_tpu.utils.metrics import ranks_from_scores

    cfg = Config(**{**FIXTURE, "encoder": encoder, "decoder": decoder})
    split, vocab = make_synthetic_split(cfg, num_dialogs=NUM_DIALOGS, seed=0)
    cfg = cfg.replace(vocab_size=vocab.size)

    state = init_train_state(cfg)
    eval_batch = next(iter(EvalLoader(split, vocab, cfg))).as_dict()

    loss_fn = jax.jit(partial(model_loss, cfg=cfg, train=False, impl="xla"))
    loss0 = float(np.asarray(loss_fn(state.params, eval_batch)))

    step_fn = jax.jit(partial(train_step, cfg=cfg, impl="xla"))
    loader = TrainLoader(split, vocab, cfg)

    def batches():
        epoch = 0
        while True:  # tiny split: cycle deterministic epochs
            yield from loader.epoch(seed=epoch)
            epoch += 1

    it = batches()
    for _ in range(TRAIN_STEPS):
        state, metrics = step_fn(state, next(it).as_dict())
    loss5 = float(np.asarray(metrics["loss"]))

    scores = np.asarray(
        jax.jit(partial(model_scores, cfg=cfg, impl="xla"))(
            state.params, eval_batch),
        dtype=np.float32)
    gt = eval_batch["gt_ind"][: scores.shape[0]]
    ranks = np.asarray(ranks_from_scores(scores, gt), dtype=np.int32)
    return {"loss0": np.float32(loss0), "loss5": np.float32(loss5),
            "scores": scores, "ranks": ranks}


def compute_all() -> dict:
    out = {}
    for enc, dec in _all_combos():
        combo = _compute_combo(enc, dec)
        for k, v in combo.items():
            out[f"{enc}|{dec}|{k}"] = v
    return out


def test_golden_numbers():
    assert os.path.exists(GOLDEN_PATH), (
        f"missing fixture {GOLDEN_PATH}; regenerate with "
        "`python tests/test_golden.py --write`")
    golden = dict(np.load(GOLDEN_PATH))
    got = compute_all()
    assert set(golden) == set(got), (
        f"fixture/model-matrix mismatch: only-in-fixture="
        f"{sorted(set(golden) - set(got))} "
        f"only-computed={sorted(set(got) - set(golden))}")
    failures = []
    for key in sorted(golden):
        want, have = golden[key], got[key]
        if key.endswith("|ranks"):
            if not np.array_equal(want, have):
                failures.append(f"{key}: ranks moved\n want={want}\n have={have}")
        else:
            if not np.allclose(want, have, atol=1e-5, rtol=1e-5):
                err = float(np.max(np.abs(want - have)))
                failures.append(f"{key}: max|diff|={err:.3g}")
    assert not failures, (
        "golden numbers moved (intentional math change? regenerate with "
        "`python tests/test_golden.py --write` and say so in the commit):\n"
        + "\n".join(failures))


if __name__ == "__main__":
    if "--write" not in sys.argv:
        sys.exit("usage: python tests/test_golden.py --write")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    values = compute_all()
    np.savez(GOLDEN_PATH, **values)
    losses = {k: float(v) for k, v in values.items() if k.endswith("loss5")}
    print(f"wrote {GOLDEN_PATH}: {len(values)} arrays")
    for k, v in sorted(losses.items()):
        print(f"  {k} = {v:.6f}")

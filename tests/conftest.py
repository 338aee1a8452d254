"""Test harness config: force an 8-device virtual CPU platform.

SURVEY.md §4 item 5: multi-chip behavior is tested without a cluster via
XLA's host-platform device-count flag — all mesh/pjit tests run against 8
fake CPU devices and assert sharded == single-device results.

Must run before jax initializes its backends, hence the env mutation at
import time of this conftest (pytest imports it before test modules).
"""

import os

# Force CPU for the test suite even when a TPU platform is configured in the
# environment: unit tolerances assume f32 CPU math, and the mesh tests need
# the 8 virtual host devices.  (Real-TPU checks live in bench.py / scripts/.)
# The env var alone is not enough here — the machine's sitecustomize imports
# jax at interpreter startup, latching JAX_PLATFORMS before conftest runs —
# so also update the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from visdial_tpu.config import Config  # noqa: E402
from visdial_tpu.data.synthetic import make_synthetic_split  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test — excluded from the quick set")
    config.addinivalue_line(
        "markers", "quick: fast test (auto-applied to everything not slow); "
                   "`pytest -m quick` is the ~5-min iteration loop on this "
                   "1-CPU box, the full suite stays the pre-commit bar")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True)
def _restore_default_prng_impl():
    """CLI mains legitimately set jax_default_prng_impl for their process
    (train.py); in-process tests calling them must not leak that global
    into later tests (it changes what PRNGKey() means — test_golden's
    frozen numbers depend on the default threefry impl)."""
    before = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != before:
        jax.config.update("jax_default_prng_impl", before)


# Quick-set representative encoders (one per family + the flagship); the
# full 9x2 matrix runs in the full (pre-commit) suite.  Single definition —
# test_all_combos.py and test_models.py both parametrize from here.
QUICK_ENCODERS = frozenset({"lf-ques-im-hist", "mn-ques-im-hist",
                            "hre-ques-hist", "hrea-ques-im-hist"})


def encoder_params(encoders):
    return [pytest.param(e, marks=() if e in QUICK_ENCODERS
                         else (pytest.mark.slow,)) for e in encoders]


def small_config(**kw) -> Config:
    base = dict(
        vocab_size=0, embed_size=16, rnn_hidden_size=24, num_layers=2,
        img_feat_size=32, img_embed_size=16,
        max_ques_len=6, max_ans_len=4, max_cap_len=8,
        num_rounds=4, num_options=12, batch_size=4,
        dropout=0.0, use_pallas=False,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    return small_config()


@pytest.fixture(scope="session")
def tiny_data(tiny_cfg):
    split, vocab = make_synthetic_split(tiny_cfg, num_dialogs=16, seed=0)
    return split, vocab, tiny_cfg.replace(vocab_size=vocab.size)


def tree_allclose(a, b, atol=1e-5):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)

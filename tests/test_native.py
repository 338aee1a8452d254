"""C++ loader core vs the numpy behavioral reference — byte-identical.

Skipped when the shared library cannot be built (the binding auto-builds
via `make -C native` on first use; g++ is in the image).
"""

import numpy as np
import pytest

from visdial_tpu.data import loader as loader_mod
from visdial_tpu.data import native
from visdial_tpu.data.loader import BatchAssembler
from visdial_tpu.data.synthetic import make_synthetic_split

from conftest import small_config

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_right_align_matches_python():
    rng = np.random.default_rng(0)
    seq = rng.integers(1, 50, size=(64, 12)).astype(np.int32)
    lens = rng.integers(0, 13, size=64).astype(np.int32)
    mask = np.arange(12)[None, :] < lens[:, None]
    seq = np.where(mask, seq, 0)
    np.testing.assert_array_equal(
        native.right_align(seq, lens), loader_mod.right_align(seq, lens))


def _assemblers(encoder):
    cfg = small_config(encoder=encoder)
    split, vocab = make_synthetic_split(cfg, num_dialogs=12, seed=3)
    cfg = cfg.replace(vocab_size=vocab.size)
    return BatchAssembler(split, vocab, cfg), cfg


def test_hist_concat_matches_python(monkeypatch):
    asm, cfg = _assemblers("lf-ques-im-hist")
    idx = np.arange(8)
    fast = asm._hist_concat(idx)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)  # force available() False
    slow = asm._hist_concat(idx)
    np.testing.assert_array_equal(fast, slow)


def test_facts_match_python(monkeypatch):
    asm, cfg = _assemblers("mn-ques-im-hist")
    idx = np.arange(8)
    fast, fast_len = asm._facts(idx)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    slow, slow_len = asm._facts(idx)
    np.testing.assert_array_equal(fast, slow)
    np.testing.assert_array_equal(fast_len, slow_len)


def test_gather_options_matches_numpy():
    rng = np.random.default_rng(1)
    opt_list = rng.integers(0, 50, size=(37, 5)).astype(np.int32)
    inds = rng.integers(0, 37, size=(4, 3, 6)).astype(np.int32)
    np.testing.assert_array_equal(
        native.gather_options(opt_list, inds), opt_list[inds])

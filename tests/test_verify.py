"""CPU rehearsal of the on-chip kernel equivalence gate (visdial_tpu/verify)
plus its tolerance-FAILURE path: the gate must actually be able to fail —
a perturbed kernel, a crash, a NaN, or a shape mismatch each flip ok=False.

The real gate runs at flagship shapes on the TPU inside bench.py; here the
same check functions run at tiny shapes on the interpreter-mode kernels."""

import numpy as np
import pytest

from visdial_tpu import verify


def test_record_flags_out_of_tolerance():
    ok = verify._record("x", np.ones(4), np.ones(4), rel_tol=1e-3)
    assert ok["ok"] and ok["max_rel_err"] == 0.0
    bad = verify._record("x", np.ones(4) * 1.01, np.ones(4), rel_tol=1e-3)
    assert not bad["ok"]
    assert bad["max_rel_err"] == pytest.approx(0.01, rel=1e-6)


def test_record_flags_nan_and_shape_mismatch():
    nan = verify._record("x", np.array([np.nan]), np.array([1.0]), 1e-3)
    assert not nan["ok"]
    # a NaN in the TWIN must fail too — np.max over it is NaN, and
    # max(0.0, nan) would otherwise keep 0.0, masking the finite mismatch
    nan_want = verify._record("x", np.array([5.0, 5.0]),
                              np.array([1.0, np.nan]), 1e-3)
    assert not nan_want["ok"]
    mis = verify._record("x", np.ones(3), np.ones(4), 1e-3)
    assert not mis["ok"]
    # tree-arity mismatch is also a failure, not a crash
    tree = verify._record("x", {"a": np.ones(2)},
                          {"a": np.ones(2), "b": np.ones(2)}, 1e-3)
    assert not tree["ok"]


def test_aggregate_requires_every_check():
    good = {"ok": True}
    bad = {"ok": False}
    assert verify._aggregate([good, good])["ok"]
    assert not verify._aggregate([good, bad])["ok"]


def test_run_checks_tiny_passes_on_cpu():
    """The full check inventory at tiny shapes, interpreter-mode kernels
    (the CPU twin of the on-chip run bench.py makes)."""
    res = verify.run_checks("tiny")
    failed = [c for c in res["checks"] if not c["ok"]]
    assert res["ok"], failed
    assert len(res["checks"]) == 11


def test_run_checks_catches_perturbed_kernel(monkeypatch):
    """A miscompiled kernel (simulated: +0.1 on the forward's outputs) must
    fail the gate, proving the comparison has teeth."""
    from visdial_tpu.ops import lstm_pallas

    orig = lstm_pallas.lstm_layer_pallas

    def broken(*args, **kwargs):
        outs = orig(*args, **kwargs)
        return (outs[0] + 0.1,) + tuple(outs[1:])

    monkeypatch.setattr(lstm_pallas, "lstm_layer_pallas", broken)
    res = verify.run_checks("tiny", include={"lstm_fwd_f32"})
    assert len(res["checks"]) == 1
    assert not res["ok"]


def test_run_checks_turns_crash_into_failure(monkeypatch):
    """A kernel that fails to compile (the observed Mosaic failure mode)
    must surface as a failing check with the error recorded, not crash the
    bench."""
    from visdial_tpu.ops import attention_pallas

    def crash(*args, **kwargs):
        raise RuntimeError("mosaic says no")

    monkeypatch.setattr(attention_pallas, "masked_slot_attention_pallas",
                        crash)
    res = verify.run_checks("tiny", include={"attention_bf16"})
    assert not res["ok"]
    assert "mosaic says no" in res["checks"][0]["error"]

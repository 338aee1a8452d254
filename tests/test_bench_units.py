"""Unit tests for bench.py's pure helpers.

bench.py is the committed measurement tool of record (the driver runs it
once per round), so its host-side logic gets the same twin-style pinning
as the kernels: the stall-rejecting median_rate sampler and the flagship
config builder (incl. the --img_spatial wiring) are cheap to test without
a device.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_median_rate_rejects_single_stall():
    """One stalled (slow) window out of three must not move the median."""
    draws = iter([100.0, 3.0, 98.0])   # middle window ate a stall
    assert bench.median_rate(lambda: next(draws)) == 98.0


def test_median_rate_runs_n_windows():
    calls = []
    bench.median_rate(lambda: calls.append(1) or float(len(calls)), n=5)
    assert len(calls) == 5


def test_wait_for_device_success_fast(monkeypatch):
    """A healthy platform answers the subprocess probe on attempt 1 (the
    conftest pins JAX_PLATFORMS=cpu, which the probe child inherits).
    Budgets sized for a cold jax import in the child on this 1-CPU host
    (can exceed 60s under concurrent suite load)."""
    assert bench.wait_for_device(max_wait_s=300.0, probe_timeout_s=180.0)


def test_wait_for_device_short_circuits_crashing_probe(monkeypatch):
    """A probe that CRASHES (nonzero exit, not a hang) means the probe is
    broken, not the tunnel: give up after a few fast attempts instead of
    burning the multi-hour outage budget."""
    import time
    monkeypatch.setattr(bench, "_PROBE_SRC", "import sys; sys.exit(2)")
    t0 = time.time()
    assert not bench.wait_for_device(max_wait_s=3600.0, probe_timeout_s=30.0,
                                     retry_sleep_s=0.1)
    assert time.time() - t0 < 60.0


def test_wait_for_device_budget_runs_out(monkeypatch):
    """A hung device (probe never returns) must exhaust the budget and
    come back False — never hang the bench process itself."""
    monkeypatch.setattr(bench, "_PROBE_SRC",
                        "import time; time.sleep(3600)")
    assert not bench.wait_for_device(max_wait_s=1.0, probe_timeout_s=0.5,
                                     retry_sleep_s=0.2)


def test_wait_for_device_recovers_after_failures(monkeypatch, tmp_path):
    """A probe that fails then succeeds (tunnel coming back) returns True."""
    flag = tmp_path / "probe_flag"
    monkeypatch.setattr(
        bench, "_PROBE_SRC",
        f"import pathlib, sys\n"
        f"p = pathlib.Path({str(flag)!r})\n"
        f"if p.exists(): sys.exit(0)\n"
        f"p.touch(); sys.exit(1)\n")
    assert bench.wait_for_device(max_wait_s=30.0, probe_timeout_s=10.0,
                                 retry_sleep_s=0.1)


def test_flagship_config_defaults():
    cfg = bench.flagship_config()
    assert (cfg.encoder, cfg.decoder) == ("mn-ques-im-hist", "disc")
    assert cfg.batch_size == 32
    assert cfg.compute_dtype == "bfloat16"
    assert not cfg.img_spatial


def test_flagship_config_img_spatial():
    """--img_spatial must produce a config the validator accepts, with the
    49x512 pool5 geometry (PARITY row 29)."""
    cfg = bench.flagship_config(img_spatial=True)
    assert cfg.img_spatial
    assert cfg.img_feat_size == 49 * 512
    assert cfg.img_spatial_slots * cfg.img_spatial_channels \
        == cfg.img_feat_size


def test_flagship_config_img_spatial_geometry_validated():
    """The Config validator rejects a feat size that doesn't factor into
    slots x channels — the guard the bench flag relies on.  (Validation
    runs via .validate(), which from_dict/replace — the CLI paths — call;
    bare construction is unvalidated by design.)"""
    from visdial_tpu.config import Config

    with pytest.raises(ValueError):
        Config(img_spatial=True, img_feat_size=100).validate()


def _load_tunnel_watch():
    """Import scripts/tunnel_watch.py by path (scripts/ is not a package)."""
    import importlib.util

    path = Path(__file__).resolve().parent.parent / "scripts" / "tunnel_watch.py"
    spec = importlib.util.spec_from_file_location("tunnel_watch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tunnel_watch_exits_zero_when_device_up(monkeypatch, tmp_path):
    """An answering device ends the watch immediately with exit 0 and an
    'UP' status line — the contract `tunnel_watch.py && bench.py` chains on."""
    tw = _load_tunnel_watch()
    monkeypatch.setattr(tw, "STATUS", tmp_path / "status")
    monkeypatch.setattr(tw.bench, "wait_for_device", lambda **kw: True)
    assert tw.main() == 0
    assert tw.STATUS.read_text().startswith("UP at ")


def test_tunnel_watch_polls_through_outage(monkeypatch, tmp_path):
    """While the tunnel is down the watcher keeps the status file current
    ('down as of ...') and keeps polling; it exits the moment a probe
    answers."""
    tw = _load_tunnel_watch()
    monkeypatch.setattr(tw, "STATUS", tmp_path / "status")
    seen_down = []
    answers = iter([False, False, True])
    monkeypatch.setattr(tw.bench, "wait_for_device",
                        lambda **kw: next(answers))
    monkeypatch.setattr(
        tw.time, "sleep",
        lambda s: seen_down.append(tw.STATUS.read_text()))
    assert tw.main() == 0
    assert len(seen_down) == 2
    assert all(t.startswith("down as of ") for t in seen_down)
    assert tw.STATUS.read_text().startswith("UP at ")


def test_main_gate_failure_aborts_before_measuring(monkeypatch, capsys):
    """A failed kernel equivalence gate must abort the run BEFORE the
    measurement suite (and before the torch baseline) — the JSON record
    carries the gate block with value 0, and the invocation exits 1."""
    import json

    failed_stats = {
        "backend": "tpu", "n_chips": 1,
        "kernel_check": {
            "ok": False,
            "checks": [{"name": "lstm_fwd_f32", "ok": False,
                        "max_abs_err": 9.9, "max_rel_err": 9.9,
                        "rel_tol": 0.003}],
        },
    }
    monkeypatch.setattr(bench, "bench_jax", lambda args: failed_stats)

    def boom():
        raise AssertionError("torch_baseline must not run on gate failure")

    monkeypatch.setattr(bench, "torch_baseline", boom)
    with pytest.raises(SystemExit) as e:
        bench.main([])
    assert e.value.code == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0.0
    assert rec["kernel_gate_failed"] == ["lstm_fwd_f32"]
    assert rec["kernel_check"]["ok"] is False

"""Driver-contract tests for __graft_entry__ (SURVEY.md §4 item 5).

Round-1 regression: the driver's multichip dryrun failed because this host's
sitecustomize latches the TPU platform at interpreter start and the entry
point relied on the driver's env vars taking effect.  These tests run the
contract in fresh subprocesses with XLA_FLAGS stripped — the exact scenario
that failed — so the entry point must force the virtual CPU platform itself.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> str:
    env = dict(os.environ)
    # Simulate the driver environment where conftest's forcing is absent:
    # no multi-device XLA_FLAGS; platform latched by sitecustomize.
    env.pop("XLA_FLAGS", None)
    # Keep the test off the real TPU chip.  The env var alone is NOT enough
    # on this host (sitecustomize latches the TPU platform before user code
    # runs — CLAUDE.md), and a latched test silently compiles over the
    # tunnel: minutes of wall-clock at ~0 CPU, load-dependent flakes.  The
    # config update below actually forces CPU.
    env["JAX_PLATFORMS"] = "cpu"
    code = ("import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n") + code
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        # Generous: ~60 s standalone, but the full suite shares this host's
        # single CPU and a loaded box has pushed the subprocess past 560 s.
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    return proc.stdout


def test_entry_compiles_and_runs():
    out = _run(
        "import jax, numpy as np\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "loss = float(np.asarray(jax.jit(fn)(*args)))\n"
        "assert np.isfinite(loss), loss\n"
        "print('ENTRY_OK', loss)\n"
    )
    assert "ENTRY_OK" in out


def test_dryrun_multichip_forces_virtual_devices():
    out = _run(
        "import jax\n"
        "assert len(jax.devices()) < 8, 'test premise: starts under-provisioned'\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK', len(jax.devices()), jax.default_backend())\n"
    )
    assert "DRYRUN_OK 8 cpu" in out

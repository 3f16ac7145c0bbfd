"""Multi-process (multi-host stand-in) correctness: the 2-process CPU
rehearsal must reproduce the single-process solve statistics.

Runs scripts/multiprocess_harness.py --spawn 2 in subprocesses (each child
is its own JAX runtime with Gloo cross-process collectives) — the identical
code path a TPU pod slice takes, minus the hardware."""
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.timeout(420)
def test_two_process_matches_single():
    env = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/bin:/bin", "HOME": "/root"}
    import os

    env = {**os.environ, **env}
    env.pop("XLA_FLAGS", None)  # children set their own device counts
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "multiprocess_harness.py"),
         "--spawn", "2", "--n", "24", "--t-end", "0.15", "--shards", "4",
         "--local-devices", "2"],
        env=env, capture_output=True, text=True, timeout=400)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK: 2-process solve matches single-process" in proc.stdout

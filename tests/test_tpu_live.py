"""Gated live-backend kernel tests.

The rest of the suite runs on the virtual CPU mesh (conftest pins
jax_platforms=cpu), which exercises the Pallas kernels only in interpret
mode.  This module subprocesses the kernel self-tests WITHOUT the CPU pin so
Mosaic lowering regressions are caught by pytest on machines with a live TPU
— and skips cleanly everywhere else (SURVEY.md §4; VERDICT r1 item 9).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_without_cpu_pin(argv, timeout=420):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # drop the virtual-device flag; keep any other XLA flags
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    return subprocess.run([sys.executable] + argv, capture_output=True,
                          text=True, timeout=timeout, env=env, cwd=REPO)


def test_mxu_hist_parity_live_backend():
    r = _run_without_cpu_pin(["-m", "slimm_tpu.ops.hist"])
    out = r.stdout + r.stderr
    if "backend=cpu" in r.stdout or r.returncode != 0 and "backend=" not in r.stdout:
        pytest.skip(f"no live TPU backend (rc={r.returncode})")
    assert r.returncode == 0, out
    assert "mxu_hist parity ok" in r.stdout, out

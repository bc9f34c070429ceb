"""Examples run as smoke tests (reference pattern: examples/ are buildable
drivers exercised by CI, SURVEY.md §4.4)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
ALL = [
    "minimum.py",
    "driver.py",
    "defaults.py",
    "test_barrier.py",
    "test_qp.py",
    "parametrics_example.py",
    "batched_scenarios.py",
    "add_rows_columns.py",
    "network_example.py",
    "gub_example.py",
    "make_dual.py",
    "piecewise_example.py",
    "event_handler.py",
    "basis_io.py",
    "pdco_example.py",
    "driver2.py",
    "dual_cuts.py",
    "iis.py",
    "modify.py",
    "markowitz_frontier.py",
    "sparse_barrier.py",
    "serving.py",
]


def _env():
    env = dict(os.environ)
    env["CLPTPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    return env


@pytest.mark.parametrize("script", ALL)
def test_example_runs(script):
    r = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        capture_output=True,
        text=True,
        timeout=420,
        env=_env(),
        cwd=os.path.join(EXAMPLES, ".."),
    )
    assert r.returncode == 0, (script, r.stdout[-500:], r.stderr[-2000:])

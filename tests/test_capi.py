"""C API end-to-end: compile a C client against libclptpu_capi and run it."""

import os
import shutil
import subprocess
import sys

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")
BUILD = os.path.join(NATIVE, "build")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no compiler")
def test_c_client_solves_lp(tmp_path):
    # build the capi lib + the C client
    r = subprocess.run(["make", "-C", NATIVE, "capi", "-s"], capture_output=True,
                       text=True, timeout=180)
    assert r.returncode == 0, r.stderr
    exe = str(tmp_path / "test_capi")
    r = subprocess.run(
        ["gcc", os.path.join(NATIVE, "test_capi.c"), "-I", NATIVE,
         "-L", BUILD, "-lclptpu_capi", "-lm", "-o", exe],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = BUILD + ":" + env.get("LD_LIBRARY_PATH", "")
    env["CLPTPU_ROOT"] = os.path.abspath(os.path.join(NATIVE, ".."))
    env["CLPTPU_PLATFORM"] = "cpu"
    r = subprocess.run([exe], capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "C API test OK" in r.stdout

"""CLI smoke tests (the ClpSolver/ClpMain surface)."""

import subprocess
import sys
import os

import numpy as np
import pytest

from clp_tpu.cli import CLI
from clp_tpu.constants import ProblemStatus


def _env():
    env = dict(os.environ)
    env["CLPTPU_PLATFORM"] = "cpu"
    return env


def test_cli_inprocess_solve(afiro_path, capsys):
    cli = CLI()
    rc = cli.run_args([afiro_path, "-dualsimplex", "-printsol"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Optimal" in out
    assert cli.model.solution.status == ProblemStatus.OPTIMAL


def test_cli_export_import(tmp_path, afiro_path, capsys):
    cli = CLI()
    out = str(tmp_path / "re.mps")
    cli.run_args([afiro_path, "-export", out])
    cli2 = CLI()
    cli2.run_args([out, "-barrier"])
    assert cli2.model.solution.status == ProblemStatus.OPTIMAL


def test_cli_basis_roundtrip(tmp_path, afiro_path):
    cli = CLI()
    bas = str(tmp_path / "b.bas")
    cli.run_args([afiro_path, "-dualsimplex", "-basisO", bas])
    assert os.path.exists(bas)
    cli2 = CLI()
    cli2.run_args([afiro_path, "-basisI", bas])
    cs, rs = cli2.model.get_basis_status()
    cs0, rs0 = cli.model.get_basis_status()
    np.testing.assert_array_equal(cs, cs0)
    np.testing.assert_array_equal(rs, rs0)


def test_cli_unittest(capsys):
    cli = CLI()
    rc = cli.unit_test()
    assert rc == 0
    assert "OK" in capsys.readouterr().out


def test_cli_solution_file(tmp_path, afiro_path):
    cli = CLI()
    solfile = str(tmp_path / "sol.txt")
    cli.run_args([afiro_path, "-primalsimplex", "-solution", solfile])
    text = open(solfile).read()
    assert "objective" in text


def test_cli_subprocess(afiro_path):
    """Full out-of-process run: python -m clp_tpu file -dualsimplex."""
    r = subprocess.run(
        [sys.executable, "-m", "clp_tpu", afiro_path, "-dualsimplex"],
        capture_output=True,
        text=True,
        timeout=300,
        env=_env(),
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert "Optimal" in r.stdout


def test_netlib_harness_empty_dir(tmp_path, capsys):
    """Harness runs cleanly when no data files exist (data not bundled)."""
    from clp_tpu.netlib import run_netlib

    rc = run_netlib(str(tmp_path))
    assert rc == 0
    assert "no data files found" in capsys.readouterr().out


def test_file_parameter_defaults(tmp_path):
    """FILE parameters (reference FIRSTFILEPARAM group) set the default
    filename their matching action uses when none follows."""
    from clp_tpu.cli import CLI
    from clp_tpu.utils.generators import random_lp

    m = random_lp(4, 6, seed=0)
    mps = str(tmp_path / "m.mps")
    m.write_mps(mps)
    sol_file = str(tmp_path / "sol.txt")
    bas_file = str(tmp_path / "b.bas")
    cli = CLI()
    rc = cli.run_args([
        "-import", mps,
        "-solutionFile", sol_file,
        "-basisFile", bas_file,
        "-dualsimplex",
        "-solution",       # no filename -> uses solutionFile
        "-basisOut",       # no filename -> uses basisFile
    ])
    assert rc == 0
    assert "objective" in open(sol_file).read()
    assert open(bas_file).read().strip()


def test_write_gmpl_solution(tmp_path):
    from clp_tpu.cli import CLI
    from clp_tpu.utils.generators import random_lp

    m = random_lp(4, 6, seed=1)
    mps = str(tmp_path / "m.mps")
    m.write_mps(mps)
    out = str(tmp_path / "s.gmpl")
    cli = CLI()
    rc = cli.run_args(["-import", mps, "-dualsimplex", "-writeGmplSol", out])
    assert rc == 0
    txt = open(out).read()
    assert "param solution :=" in txt and txt.strip().endswith("end;")


def test_full_general_query_lists_params(capsys):
    from clp_tpu.cli import CLI

    CLI().run_args(["???"])
    out = capsys.readouterr().out
    assert "Parameters (Clp-style names" in out and "basisFile" in out

"""Parameter-surface parity: registry coverage + real effects of new params.

Reference checklist: ClpParam.hpp ClpParamCode enum (~100 codes). Every
registered 'real' parameter must change behavior; 'compat' ones must be
accepted without error and say so in help.
"""

import io
import sys

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import INF, Model, ProblemStatus, SolveMethod, SolveOptions
from clp_tpu.cli import CLI
from clp_tpu.params import REGISTRY, help_text, lookup, parity_table
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog


def test_registry_size_and_parity_table():
    assert len(REGISTRY) >= 95, len(REGISTRY)
    tab = parity_table()
    assert "| dualBound |" in tab
    assert "compat" in tab and "real" in tab
    # every reference dbl/int family name we claim is present
    for name in ("dualbound", "dualtolerance", "primaltolerance", "objscale",
                 "rhsscale", "presolvetolerance", "zerotolerance", "psi",
                 "maxfactor", "maxiterations", "substitution", "dualize",
                 "sprint", "idiotcrash", "perturbation", "randomseed",
                 "scaling", "crash", "crossover", "direction", "gamma",
                 "cholesky", "factorization", "autoscale", "printmask",
                 "directory", "dirnetlib"):
        assert name in REGISTRY, name


def test_prefix_lookup():
    assert lookup("dualB").name == "dualBound"
    assert lookup("maxIt").name == "maxIterations"
    assert lookup("xyz") is None


def _solve_cli(args):
    cli = CLI()
    rc = cli.run_args(args)
    return cli, rc


def test_objscale_rhsscale_roundtrip(tmp_path):
    model = random_lp(6, 10, seed=4)
    ref = _linprog(model)
    p = tmp_path / "m.mps"
    model.write_mps(str(p))
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        cli, rc = _solve_cli([str(p), "-objScale", "3.5", "-rhsScale", "0.25",
                              "-dualsimplex"])
    finally:
        sys.stdout = old
    sol = cli.model.solution
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    # duals/primal unscaled back to the original frame
    d = cli.model.objective - cli.model.matrix.T @ sol.duals
    np.testing.assert_allclose(d, sol.reduced_costs, atol=1e-6)


def test_dualize_param():
    model = random_lp(12, 6, seed=5)  # tall: dualize pays
    ref = _linprog(model)
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX, dualize=1)
    sol = model.initial_solve(opts)
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    assert sol.primal.size == model.num_cols


def test_substitution_levels():
    cli = CLI()
    cli.run_args(["-substitution", "0"])
    assert not cli.options.presolve.doubleton
    assert not cli.options.presolve.tripleton
    cli.run_args(["-substitution", "2"])
    assert cli.options.presolve.doubleton
    assert cli.options.presolve.tripleton
    assert not cli.options.presolve.singleton_cols
    cli.run_args(["-substitution", "3"])
    assert cli.options.presolve.singleton_cols


def test_compat_params_accepted():
    cli = CLI()
    rc = cli.run_args(["-threads", "4", "-sparseFactor", "on", "-cholesky",
                       "dense", "-abcWanted", "decide", "-biasLU", "UU"])
    assert rc == 0
    assert cli.compat_params["threads"] == 4


def test_statistics_and_guess(tmp_path, capsys):
    model = random_lp(6, 30, seed=0)
    p = tmp_path / "m.mps"
    model.write_mps(str(p))
    cli = CLI()
    cli.run_args([str(p), "-statistics", "-guess"])
    out = capsys.readouterr().out
    assert "rows" in out and "elements" in out
    assert "suggest" in out.lower()


def test_tighten_action(capsys):
    # x + y <= 4 with x,y in [0, 10]: tighten pulls uppers to 4
    A = sp.csc_matrix(np.array([[1.0, 1.0]]))
    m = Model()
    m.load_problem(A, col_lower=[0, 0], col_upper=[10, 10],
                   objective=[-1, -1], row_lower=[-INF], row_upper=[4.0])
    cli = CLI()
    cli.model = m
    cli.have_model = True
    cli.tighten()
    assert np.all(m.col_upper <= 4.0 + 1e-9)


def test_write_read_solution_file(tmp_path):
    model = random_lp(5, 8, seed=1)
    p = tmp_path / "m.mps"
    model.write_mps(str(p))
    sol_file = tmp_path / "s.sol"
    cli, _ = _solve_cli([str(p), "-dualsimplex", "-writeSol", str(sol_file)])
    obj1 = cli.model.solution.objective_value
    cli2 = CLI()
    cli2.run_args([str(p), "-readSol", str(sol_file)])
    assert cli2.model.solution.primal is not None
    np.testing.assert_allclose(cli2.model.solution.primal,
                               cli.model.solution.primal, atol=1e-9)


def test_save_restore_model_actions(tmp_path):
    model = random_lp(5, 8, seed=2)
    mps = tmp_path / "m.mps"
    model.write_mps(str(mps))
    binf = tmp_path / "m.bin"
    cli, _ = _solve_cli([str(mps), "-writeModel", str(binf)])
    cli2 = CLI()
    cli2.run_args(["-readModel", str(binf), "-dualsimplex"])
    assert cli2.model.solution.status == ProblemStatus.OPTIMAL


def test_parametrics_file(tmp_path):
    # 2-var LP; move row upper bound with theta
    A = sp.csc_matrix(np.array([[1.0, 1.0]]))
    m = Model()
    m.load_problem(A, col_lower=[0, 0], col_upper=[INF, INF],
                   objective=[-1.0, -2.0], row_lower=[-INF], row_upper=[1.0])
    m.row_names = ["R0"]
    m.col_names = ["x", "y"]
    mps = tmp_path / "m.mps"
    m.write_mps(str(mps))
    pf = tmp_path / "p.csv"
    pf.write_text("ROWS,0,2\nname,lower,upper\nR0,0,1\n")
    cli = CLI()
    import io as _io, sys as _sys

    buf = _io.StringIO()
    old = _sys.stdout
    _sys.stdout = buf
    try:
        rc = cli.run_args([str(mps), "-parametrics", str(pf)])
    finally:
        _sys.stdout = old
    out = buf.getvalue()
    assert rc == 0
    # obj(theta) = -2*(1+theta): theta=0 -> -2, theta=2 -> -6
    assert "objective -2" in out
    assert "objective -6" in out


def test_genpy_action(tmp_path):
    model = random_lp(4, 6, seed=3)
    mps = tmp_path / "m.mps"
    model.write_mps(str(mps))
    script = tmp_path / "gen.py"
    _solve_cli([str(mps), "-genPy", str(script)])
    assert script.exists() and "load_problem" in script.read_text()


def test_message_catalog_parity():
    """~100-name CLP_Message coverage (ClpMessage.hpp:16-113)."""
    import io

    from clp_tpu.events import CATALOG, MessageHandler

    names = [k for k in CATALOG if isinstance(k, str) and k.startswith("CLP_")]
    assert len(names) >= 95, len(names)
    buf = io.StringIO()
    mh = MessageHandler(log_level=3, stream=buf)
    # missing kwargs must render '?' rather than raising
    mh.message("CLP_TIMING")
    mh.message("CLP_BARRIER_ITERATION", it=3, gap=1e-9)
    mh.message("CLP_SPRINT", it=1, n=200, obj=-5.0)
    out = buf.getvalue()
    assert "?" in out and "Sprint pass 1" in out
    assert len(mh.messages_seen) == 3


def test_interval_timing_messages(capsys):
    model = random_lp(5, 8, seed=6)
    model.initial_solve(SolveOptions(log_level=2))
    out = capsys.readouterr().out
    assert "took" in out  # CLP_INTERVAL_TIMING lines
    assert "iterations time" in out  # CLP_TIMING line


def test_psi_selects_positive_edge():
    """psi > 0 sets the PE threshold and switches to PE pricing
    (reference: ClpPESimplex psi semantics)."""
    cli = CLI()
    cli.run_args(["-psi", "0.4"])
    assert cli.options.pe_psi == pytest.approx(0.4)
    assert cli.options.dual_pivot == "pesteepest"
    assert cli.options.primal_pivot == "pesteepest"
    # negative value: threshold magnitude stored, pricing untouched
    cli2 = CLI()
    cli2.run_args(["-psi", "-0.3"])
    assert cli2.options.pe_psi == pytest.approx(0.3)
    assert cli2.options.dual_pivot != "pesteepest"
    # and the PE solve still reaches the right optimum
    model = random_lp(12, 20, seed=7)
    ref = _linprog(model)
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX, dual_pivot="pesteepest",
                        pe_psi=0.4)
    opts.presolve.enabled = False
    sol = model.initial_solve(opts)
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))

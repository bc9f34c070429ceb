"""AMPL .nl driver protocol (VERDICT r4 #8): linear .nl reader, .sol
writer, CLI -AMPL parity with the MPS route.

Reference: ClpMain.cpp:292-303 (clpReadAmpl -> solve -> writeAmplSol)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from clp_tpu.cli import main as cli_main
from clp_tpu.constants import ProblemStatus, SolveMethod
from clp_tpu.io.nl import NLError, read_nl, write_nl, write_sol
from clp_tpu.model import Model
from clp_tpu.options import SolveOptions

AFIRO = "/root/reference/examples/modified_afiro.mps"
AFIRO_OBJ = -484.206168571


def _round_trip(model, tmp_path, name="m.nl"):
    p = str(tmp_path / name)
    write_nl(model, p)
    return read_nl(p)


class TestNLRoundTrip:
    def test_afiro_nl_matches_mps_route(self, tmp_path):
        m1 = Model()
        assert m1.read_mps(AFIRO) == 0
        m2 = _round_trip(m1, tmp_path, "afiro.nl")
        assert m2.num_rows == m1.num_rows
        assert m2.num_cols == m1.num_cols
        assert np.allclose((m2.matrix - m1.matrix).data, 0.0) or \
            (m2.matrix - m1.matrix).nnz == 0
        sol1 = m1.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
        sol2 = m2.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
        assert sol1.status == ProblemStatus.OPTIMAL
        assert sol2.status == ProblemStatus.OPTIMAL
        assert sol2.objective_value == pytest.approx(AFIRO_OBJ, abs=1e-6)
        assert sol2.objective_value == pytest.approx(
            sol1.objective_value, rel=1e-9)

    def test_maximize_round_trip(self, tmp_path):
        m1 = Model()
        A = sp.csc_matrix(np.array([[1.0, 2.0], [3.0, 1.0]]))
        m1.load_problem(A, np.zeros(2), np.full(2, np.inf),
                        np.array([3.0, 2.0]),
                        np.full(2, -np.inf), np.array([10.0, 15.0]))
        m1.set_maximize()
        m2 = _round_trip(m1, tmp_path)
        assert m2.optimization_direction == -1.0
        s1 = m1.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
        s2 = m2.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
        assert s2.objective_value == pytest.approx(s1.objective_value)
        assert s2.objective_value == pytest.approx(18.0)

    def test_bounds_and_offset(self, tmp_path):
        m1 = Model()
        A = sp.csc_matrix(np.array([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]]))
        m1.load_problem(
            A,
            np.array([0.0, -np.inf, 2.0]),
            np.array([5.0, np.inf, 2.0]),  # fixed third column
            np.array([1.0, -1.0, 0.5]),
            np.array([1.0, -np.inf]),
            np.array([1.0, 4.0]),  # equality + <= rows
        )
        m1.objective_offset = 7.5
        m2 = _round_trip(m1, tmp_path)
        np.testing.assert_allclose(m2.col_lower, m1.col_lower)
        np.testing.assert_allclose(m2.col_upper, m1.col_upper)
        np.testing.assert_allclose(m2.row_lower, m1.row_lower)
        np.testing.assert_allclose(m2.row_upper, m1.row_upper)
        assert m2.objective_offset == pytest.approx(7.5)


class TestNLRejections:
    def test_binary_format_rejected(self, tmp_path):
        p = tmp_path / "bin.nl"
        p.write_text("b3 1 1 0\n 2 1 1 0 0\n")
        with pytest.raises(NLError, match="binary"):
            read_nl(str(p))

    def test_nonlinear_body_rejected(self, tmp_path):
        p = tmp_path / "nlp.nl"
        p.write_text(
            "g3 1 1 0\n 1 1 1 0 0\n 1 0\n 0 0\n 1 0 0\n 0 0 0 1\n"
            " 0 0 0 0 0\n 1 1\n 0 0\n 0 0 0 0 0\n"
            "C0\no5\nv0\nn2\n"
        )
        with pytest.raises(NLError, match="nonlinear"):
            read_nl(str(p))


class TestAmplProtocol:
    def test_cli_stub_ampl_writes_sol(self, tmp_path, capsys):
        m1 = Model()
        assert m1.read_mps(AFIRO) == 0
        stub = str(tmp_path / "afiro")
        write_nl(m1, stub + ".nl")
        rc = cli_main([stub, "-AMPL"])
        assert rc == 0
        sol_path = stub + ".sol"
        assert os.path.exists(sol_path)
        text = open(sol_path).read()
        assert "objno 0 0" in text  # solve_result 0 = solved
        # primal values are the last n lines before objno
        lines = [ln for ln in text.splitlines() if ln.strip()]
        idx = lines.index("Options")
        nopts = int(lines[idx + 1])
        mm = lines[idx + 2 + nopts].split()
        nn = lines[idx + 3 + nopts].split()
        assert int(mm[0]) == m1.num_rows and int(mm[1]) == m1.num_rows
        assert int(nn[0]) == m1.num_cols and int(nn[1]) == m1.num_cols
        vals = lines[idx + 4 + nopts:]
        x = np.array([float(v) for v in
                      vals[m1.num_rows:m1.num_rows + m1.num_cols]])
        obj = float(m1.objective @ x) + m1.objective_offset
        assert obj == pytest.approx(AFIRO_OBJ, abs=1e-5)

    def test_cli_explicit_solve_then_ampl(self, tmp_path):
        m1 = Model()
        assert m1.read_mps(AFIRO) == 0
        stub = str(tmp_path / "af2")
        write_nl(m1, stub + ".nl")
        rc = cli_main([stub, "-dualsimplex", "-AMPL"])
        assert rc == 0
        assert os.path.exists(stub + ".sol")

    def test_write_sol_infeasible_code(self, tmp_path):
        from clp_tpu.model import Solution

        m = Model()
        A = sp.csc_matrix(np.array([[1.0]]))
        m.load_problem(A, np.zeros(1), np.ones(1), np.ones(1),
                       np.array([2.0]), np.array([2.0]))
        sol = Solution(status=ProblemStatus.PRIMAL_INFEASIBLE)
        p = write_sol(str(tmp_path / "inf"), m, sol)
        assert "objno 0 200" in open(p).read()

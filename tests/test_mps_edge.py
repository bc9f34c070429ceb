"""MPS format edge cases: both parsers must agree and solve correctly."""

import textwrap

import numpy as np
import pytest

from clp_tpu import Model, INF, ProblemStatus
from clp_tpu.io.mps import read_mps
from clp_tpu.io.native import available, read_mps_native


EDGE = textwrap.dedent("""\
    * comment line
    NAME          EDGE
    OBJSENSE
        MAX
    ROWS
     N  COST
     L  LIM1
     G  LIM2
     E  EQ1
     N  FREEROW
    COLUMNS
        X1        COST         1.0   LIM1         1.0
        X1        LIM2         1.0   FREEROW      9.9
        X2        COST         2.0   LIM1         1.0
        X2        EQ1          1.0
        X3        EQ1          1.0   LIM2        -1.0
    RHS
        RHS       LIM1         4.0   LIM2         1.0
        RHS       EQ1          2.0   COST        -3.5
    RANGES
        RNG       LIM1         2.0   EQ1         -0.5
    BOUNDS
     MI BND       X1
     UP BND       X1           4.0
     UP BND       X3          -1.0
    ENDATA
    """)


def _write(tmp_path, text):
    p = tmp_path / "edge.mps"
    p.write_text(text)
    return str(p)


def test_edge_semantics(tmp_path):
    path = _write(tmp_path, EDGE)
    m = read_mps(path, use_native=False)
    # FREEROW (extra N row) kept as a free constraint row (CoinMpsIO semantics)
    assert m.num_rows == 4
    assert m.num_cols == 3
    assert m.optimization_direction == -1.0  # OBJSENSE MAX
    # RHS on the objective row: offset = -(-3.5) = 3.5
    assert abs(m.objective_offset - 3.5) < 1e-12
    names = dict(zip(m.row_names, range(m.num_rows)))
    # FREEROW: infinite bounds, coefficient preserved
    i = names["FREEROW"]
    assert m.row_lower[i] <= -INF and m.row_upper[i] >= INF
    cj0 = dict(zip(m.col_names, range(3)))
    assert m.matrix[i, cj0["X1"]] == 9.9
    # LIM1 (L, rhs 4, range 2): [2, 4]
    i = names["LIM1"]
    assert m.row_lower[i] == 2.0 and m.row_upper[i] == 4.0
    # LIM2 (G, rhs 1): [1, inf)
    i = names["LIM2"]
    assert m.row_lower[i] == 1.0 and m.row_upper[i] >= INF
    # EQ1 (E, rhs 2, range -0.5): [1.5, 2]
    i = names["EQ1"]
    assert m.row_lower[i] == 1.5 and m.row_upper[i] == 2.0
    cj = dict(zip(m.col_names, range(3)))
    # X1: MI then UP 4 -> (-inf, 4]
    j = cj["X1"]
    assert m.col_lower[j] <= -INF and m.col_upper[j] == 4.0
    # X3: UP -1 with default lower 0 -> classic quirk: lower becomes -inf
    j = cj["X3"]
    assert m.col_lower[j] <= -INF and m.col_upper[j] == -1.0


@pytest.mark.skipif(not available(), reason="native lib not buildable")
def test_edge_native_agrees(tmp_path):
    path = _write(tmp_path, EDGE)
    mp = read_mps(path, use_native=False)
    mn = read_mps_native(path)
    assert mn is not None
    np.testing.assert_allclose(
        np.asarray(mn.matrix.todense()), np.asarray(mp.matrix.todense())
    )
    np.testing.assert_allclose(mn.row_lower, mp.row_lower)
    np.testing.assert_allclose(mn.row_upper, mp.row_upper)
    np.testing.assert_allclose(mn.col_lower, mp.col_lower)
    np.testing.assert_allclose(mn.col_upper, mp.col_upper)
    np.testing.assert_allclose(mn.objective, mp.objective)
    assert mn.objective_offset == mp.objective_offset
    assert mn.optimization_direction == mp.optimization_direction


def test_edge_solves(tmp_path):
    """This model is unbounded (X3 -> -inf drives X2, hence the objective,
    to +inf through EQ1/LIM1) — both we and scipy must prove it."""
    path = _write(tmp_path, EDGE)
    m = read_mps(path)
    sol = m.initial_solve()
    assert sol.status == ProblemStatus.DUAL_INFEASIBLE
    from tests.test_mps import _linprog

    ref = _linprog(m)
    assert ref.status == 3  # HiGHS: unbounded


def test_edge_bounded_variant_solves(tmp_path):
    """Same file with X3 bounded below: finite optimum matching scipy."""
    text = EDGE.replace(" UP BND       X3          -1.0",
                        " UP BND       X3          -1.0\n LO BND       X3          -9.0")
    path = _write(tmp_path, text)
    m = read_mps(path)
    sol = m.initial_solve()
    assert sol.status == ProblemStatus.OPTIMAL
    from tests.test_mps import _linprog

    ref = _linprog(m)
    assert ref.status == 0
    # maximization: scipy minimized the negated objective (offset excluded)
    assert abs(sol.objective_value - (-ref.fun + m.objective_offset)) < 1e-6 * (
        1 + abs(ref.fun)
    )


def test_crlf_and_tabs(tmp_path):
    """CRLF line endings and tab separators parse identically on both paths."""
    text = ("NAME\tT1\r\nROWS\r\n N  OBJ\r\n L  R1\r\nCOLUMNS\r\n"
            "    X1\tOBJ\t2.0\tR1\t1.0\r\n    X2  OBJ  3.0   R1   1.0\r\n"
            "RHS\r\n    RHS  R1  4.0\r\nENDATA\r\n")
    p = tmp_path / "crlf.mps"
    p.write_text(text)
    mp = read_mps(str(p), use_native=False)
    assert (mp.num_rows, mp.num_cols) == (1, 2)
    assert mp.objective.tolist() == [2.0, 3.0]
    if available():
        mn = read_mps_native(str(p))
        assert mn is not None
        assert mn.objective.tolist() == [2.0, 3.0]
        assert mn.row_upper.tolist() == [4.0]


def test_free_row_roundtrip(tmp_path):
    """write_mps emits free rows as N rows; read_mps must keep them so the
    round-trip is lossless (ADVICE round-1 medium finding)."""
    from clp_tpu.io.mps import write_mps

    path = _write(tmp_path, EDGE)
    m1 = read_mps(path, use_native=False)
    out = str(tmp_path / "rt.mps")
    write_mps(m1, out)
    m2 = read_mps(out, use_native=False)
    assert m2.num_rows == m1.num_rows
    assert m2.row_names == m1.row_names
    np.testing.assert_allclose(
        np.asarray(m2.matrix.todense()), np.asarray(m1.matrix.todense())
    )
    np.testing.assert_allclose(m2.row_lower, m1.row_lower)
    np.testing.assert_allclose(m2.row_upper, m1.row_upper)

"""MPS/LP IO tests: parse reference sample files, round-trip, scipy cross-check."""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, read_mps, write_mps, INF


def test_read_afiro(afiro_path):
    model = Model()
    assert model.read_mps(afiro_path) == 0
    # modified_afiro (reference examples/modified_afiro.mps) is a reduced
    # 7x16 variant of Netlib afiro
    assert model.num_cols == 16
    assert model.num_rows == 7
    assert model.num_elements == 40
    assert model.optimization_direction == 1.0


def test_read_hello(hello_path):
    model = Model()
    assert model.read_mps(hello_path) == 0
    assert model.num_cols > 0 and model.num_rows > 0


def test_roundtrip(tmp_path, afiro_path):
    m1 = Model()
    m1.read_mps(afiro_path)
    out = str(tmp_path / "out.mps")
    write_mps(m1, out)
    m2 = Model()
    assert m2.read_mps(out) == 0
    assert m2.num_rows == m1.num_rows
    assert m2.num_cols == m1.num_cols
    np.testing.assert_allclose(
        np.asarray(m2.matrix.todense()), np.asarray(m1.matrix.todense()), atol=1e-12
    )
    np.testing.assert_allclose(m2.objective, m1.objective, atol=1e-12)
    np.testing.assert_allclose(m2.col_lower, m1.col_lower, atol=1e-12)
    np.testing.assert_allclose(m2.col_upper, m1.col_upper, atol=1e-12)
    np.testing.assert_allclose(m2.row_lower, m1.row_lower, atol=1e-12)
    np.testing.assert_allclose(m2.row_upper, m1.row_upper, atol=1e-12)
    assert abs(m2.objective_offset - m1.objective_offset) < 1e-12


def test_roundtrip_gzip(tmp_path, afiro_path):
    m1 = Model()
    m1.read_mps(afiro_path)
    out = str(tmp_path / "out.mps.gz")
    write_mps(m1, out)
    m2 = Model()
    assert m2.read_mps(out) == 0
    assert m2.num_cols == m1.num_cols


def test_scipy_crosscheck_afiro(afiro_path):
    """Objective from scipy (HiGHS) on our parsed arrays ~ published afiro."""
    from scipy.optimize import linprog

    model = Model()
    model.read_mps(afiro_path)
    res = _linprog(model)
    assert res.status == 0
    # modified_afiro is a variant; full afiro optimum is -464.753...
    # we only assert scipy can solve what we parsed and value is in range
    assert res.fun < 0


def _linprog(model):
    from scipy.optimize import linprog
    import scipy.sparse as sp

    A = model.matrix
    m = model.num_rows
    cl = np.where(model.col_lower <= -INF, -np.inf, model.col_lower)
    cu = np.where(model.col_upper >= INF, np.inf, model.col_upper)
    rl = np.where(model.row_lower <= -INF, -np.inf, model.row_lower)
    ru = np.where(model.row_upper >= INF, np.inf, model.row_upper)
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(m):
        row = A[i, :]
        if rl[i] == ru[i]:
            A_eq.append(row.toarray().ravel())
            b_eq.append(rl[i])
        else:
            if np.isfinite(ru[i]):
                A_ub.append(row.toarray().ravel())
                b_ub.append(ru[i])
            if np.isfinite(rl[i]):
                A_ub.append(-row.toarray().ravel())
                b_ub.append(-rl[i])
    c = model.objective * model.optimization_direction
    res = linprog(
        c,
        A_ub=np.array(A_ub) if A_ub else None,
        b_ub=np.array(b_ub) if b_ub else None,
        A_eq=np.array(A_eq) if A_eq else None,
        b_eq=np.array(b_eq) if b_eq else None,
        bounds=list(zip(cl, cu)),
        method="highs",
    )
    return res


def test_lp_format_roundtrip(tmp_path):
    from clp_tpu import read_lp, write_lp
    from clp_tpu.utils.generators import random_lp

    m1 = random_lp(6, 10, seed=3)
    path = str(tmp_path / "m.lp")
    write_lp(m1, path)
    m2 = Model()
    m2.read_lp(path)
    assert m2.num_cols == m1.num_cols
    # LP writer splits ranged rows into two; compare via scipy objectives
    r1, r2 = _linprog(m1), _linprog(m2)
    assert r1.status == r2.status == 0
    assert abs(r1.fun - r2.fun) < 1e-6 * (1 + abs(r1.fun))


def test_save_restore_model(tmp_path, afiro_path):
    """Binary whole-model checkpoint round-trips data + solution."""
    from clp_tpu import Model

    m1 = Model()
    m1.read_mps(afiro_path)
    m1.dual()
    path = str(tmp_path / "model.bin")
    assert m1.save_model(path) == 0
    m2 = Model()
    assert m2.restore_model(path) == 0
    assert m2.num_rows == m1.num_rows and m2.num_cols == m1.num_cols
    assert m2.solution.status == m1.solution.status
    assert m2.solution.objective_value == m1.solution.objective_value
    np.testing.assert_array_equal(m2.solution.primal, m1.solution.primal)


def test_generate_python(tmp_path, afiro_path):
    """generateCpp-equivalent: emitted script rebuilds and solves the model."""
    import subprocess, sys, os

    from clp_tpu import Model

    m1 = Model()
    m1.read_mps(afiro_path)
    ref = m1.dual()
    script = str(tmp_path / "rebuild.py")
    assert m1.generate_python(script) == 0
    env = dict(os.environ)
    env["CLPTPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, script], capture_output=True, text=True,
                       timeout=300, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "OPTIMAL" in r.stdout
    got = float(r.stdout.split()[-1])
    assert abs(got - ref.objective_value) < 1e-7 * (1 + abs(ref.objective_value))

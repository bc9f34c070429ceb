"""Native C++ MPS parser vs the Python reference reader."""

import numpy as np
import pytest

from clp_tpu.model import Model
from clp_tpu.io.mps import read_mps, write_mps
from clp_tpu.io.native import available, read_mps_native


pytestmark = pytest.mark.skipif(not available(), reason="native lib not buildable")


def _assert_models_equal(a: Model, b: Model):
    assert a.num_rows == b.num_rows
    assert a.num_cols == b.num_cols
    np.testing.assert_allclose(
        np.asarray(a.matrix.todense()), np.asarray(b.matrix.todense()), atol=0
    )
    np.testing.assert_allclose(a.objective, b.objective, atol=0)
    np.testing.assert_allclose(a.col_lower, b.col_lower, atol=0)
    np.testing.assert_allclose(a.col_upper, b.col_upper, atol=0)
    np.testing.assert_allclose(a.row_lower, b.row_lower, atol=0)
    np.testing.assert_allclose(a.row_upper, b.row_upper, atol=0)
    assert a.objective_offset == b.objective_offset
    assert a.optimization_direction == b.optimization_direction
    assert a.row_names == b.row_names
    assert a.col_names == b.col_names


def test_native_matches_python_afiro(afiro_path):
    mp = read_mps(afiro_path, use_native=False)
    mn = read_mps_native(afiro_path)
    assert mn is not None
    _assert_models_equal(mp, mn)


def test_native_matches_python_generated(tmp_path):
    from clp_tpu.utils.generators import random_lp

    m = random_lp(15, 25, seed=9)
    m.integer_mask = np.zeros(25, dtype=bool)
    m.integer_mask[[3, 7]] = True
    path = str(tmp_path / "gen.mps")
    write_mps(m, path)
    mp = read_mps(path, use_native=False)
    mn = read_mps_native(path)
    assert mn is not None
    _assert_models_equal(mp, mn)
    np.testing.assert_array_equal(mp.integer_mask, mn.integer_mask)


def test_native_rejects_quadobj(tmp_path):
    """QUADOBJ files must fall back (native returns None, full read works)."""
    import scipy.sparse as sp
    from clp_tpu import INF

    m = Model()
    m.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        [0, 0], [INF, INF], [-1.0, -1.0], [-INF], [1.0],
    )
    m.load_quadratic_objective(sp.eye(2, format="csc"))
    path = str(tmp_path / "qp.mps")
    write_mps(m, path)
    assert read_mps_native(path) is None
    m2 = read_mps(path)  # full path falls back to Python
    assert m2.quadratic_objective is not None

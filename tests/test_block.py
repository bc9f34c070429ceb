"""Block mesh axis: column-sharded repricing on the 8-device CPU mesh."""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, ProblemStatus, SolveOptions
from clp_tpu.parallel.block import BlockShardedColumns, make_block_mesh
from clp_tpu.sprint import sprint_solve
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog

import jax


@pytest.fixture
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return make_block_mesh(devs[:8])


def test_sharded_reprice_matches_local(mesh):
    model = random_lp(6, 50, seed=0, density=0.4)  # 50 not divisible by 8
    A = model.matrix
    c = model.objective
    cols = BlockShardedColumns(A, c, mesh)
    rng = np.random.default_rng(1)
    y = rng.standard_normal(model.num_rows)
    dj, vals, idx = cols.reprice(y, k=5)
    dj_ref = c - A.T @ y
    np.testing.assert_allclose(dj, dj_ref, rtol=1e-12, atol=1e-12)
    order = np.argsort(dj_ref)[:5]
    np.testing.assert_allclose(np.sort(vals), np.sort(dj_ref[order]), rtol=1e-12)


def test_sprint_with_block_mesh_matches_reference(mesh):
    model = random_lp(8, 200, seed=3, density=0.3)
    ref = _linprog(model)
    opts = SolveOptions()
    opts.presolve.enabled = False
    sol = sprint_solve(model.copy(), opts, mesh=mesh)
    assert ref.status == 0
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_graft_dryrun_both_axes():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_colsharded_dual_engine_matches_single_device(mesh):
    """The IN-ENGINE column-sharded dual solve (SURVEY §2 'cross-chip
    psum/argmax over column shards') reaches the single-device optimum."""
    import jax.numpy as jnp

    from clp_tpu.forms import to_standard_form
    from clp_tpu.parallel.colshard import dual_solve_colsharded
    from clp_tpu.simplex import engine

    model = random_lp(20, 45, seed=5, density=0.3)  # 45+20 not divisible by 8
    ref = _linprog(model)
    lp, _ = to_standard_form(model)
    opts = engine.SimplexOptions(max_iterations=20000)

    state, slp, nt0 = dual_solve_colsharded(lp, opts, mesh)
    assert int(state.status) == engine.OPTIMAL
    xn = engine.nonbasic_values(slp, state.vstat, opts.dual_bound)
    obj = float(jnp.take(slp.c, state.basis) @ state.xb + slp.c @ xn)
    assert abs(obj - ref.fun) < 1e-7 * (1 + abs(ref.fun))
    # column-sharded outputs slice back to the original width
    assert state.dj.shape[0] >= nt0
    # the sharding actually took: G's column axis is split over the mesh
    assert slp.G.sharding.spec == ("block",) or "block" in str(slp.G.sharding)


def test_colsharded_dual_engine_bfrt(mesh):
    """Long-step BFRT under column sharding (sort/top_k over a sharded
    axis partitions too)."""
    import jax.numpy as jnp

    from clp_tpu.forms import to_standard_form
    from clp_tpu.parallel.colshard import dual_solve_colsharded
    from clp_tpu.simplex import engine

    model = random_lp(16, 30, seed=9)
    ref = _linprog(model)
    lp, _ = to_standard_form(model)
    opts = engine.SimplexOptions(max_iterations=20000, dual_ratio="bfrt")
    state, slp, _ = dual_solve_colsharded(lp, opts, mesh)
    assert int(state.status) == engine.OPTIMAL
    xn = engine.nonbasic_values(slp, state.vstat, opts.dual_bound)
    obj = float(jnp.take(slp.c, state.basis) @ state.xb + slp.c @ xn)
    assert abs(obj - ref.fun) < 1e-7 * (1 + abs(ref.fun))

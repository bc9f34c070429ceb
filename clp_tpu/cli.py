"""Command-line interface — the `clp` binary equivalent.

Follows the reference CLI's shape (ClpMain.cpp:254-310, ClpSolver.cpp):
a queue of parameters/actions processed in order, with an interactive REPL
when invoked without arguments. Parameter names keep Clp's spellings where
sensible (-dualsimplex, -primalsimplex, -barrier, -presolve, -maxIts, ...).

    python -m clp_tpu model.mps -dualsimplex -printsol
    python -m clp_tpu -import model.mps.gz -barrier -basisO out.bas
    python -m clp_tpu -unitTest
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import numpy as np

from .constants import ProblemStatus, ScalingMode, SolveMethod
from .model import Model
from .options import SolveOptions


HELP = """clp_tpu — TPU-native LP/QP solver (capabilities of coin-or/Clp)

usage: python -m clp_tpu [file.mps[.gz]] [actions/options...]

actions:
  -dualsimplex | -duals       solve with dual simplex
  -primalsimplex | -primals   solve with primal simplex
  -barrier                    interior point + simplex crossover
  -barriernocross             interior point, no crossover
  -pdlp                       first-order PDHG solver
  -solve | -either            automatic method choice
  -import FILE                read MPS (gzip ok); .lp read as LP format
  -export FILE                write model as MPS
  -basisI FILE                read starting basis
  -basisO FILE                write final basis
  -printsol                   print nonzero primal solution values
  -solution FILE              write solution to file ('-' = stdout, all rows)
  -unitTest                   run built-in smoke tests
  -netlib DIR                 solve all MPS files in DIR, check golden objs
options:
  -maximize / -minimize       objective sense
  -presolve on|off            (default on)
  -scaling off|equil|geom|auto (default auto)
  -maxIts N                   iteration limit
  -sec N                      time limit (seconds)
  -primalT TOL / -dualT TOL   feasibility tolerances
  -log N                      verbosity 0-4
  -batch FILES...             solve many same-shape MPS files batched
exit / quit / help in interactive mode.
"""


def _fmt_status(model: Model) -> str:
    sol = model.solution
    s = sol.status
    if s == ProblemStatus.OPTIMAL:
        return (
            f"Optimal - objective value {sol.objective_value:.10g}\n"
            f"Optimal objective {sol.objective_value:.12g} - {sol.iterations} "
            f"iterations time {sol.solve_time:.3f}"
        )
    if s == ProblemStatus.PRIMAL_INFEASIBLE:
        return "Primal infeasible"
    if s == ProblemStatus.DUAL_INFEASIBLE:
        return "Dual infeasible (unbounded)"
    if s == ProblemStatus.STOPPED:
        return f"Stopped on limits - objective value {sol.objective_value:.10g}"
    return f"Finished with status {s.name}"


class CLI:
    def __init__(self):
        self.model = Model()
        self.options = SolveOptions()
        self.log_level = 1
        self.have_model = False

    def log(self, msg, level=1):
        if self.log_level >= level:
            print(msg)

    def do_import(self, path: str) -> int:
        t0 = time.time()
        rc = self.model.read_lp(path) if path.endswith(".lp") else self.model.read_mps(path)
        if rc == 0:
            self.have_model = True
            self.log(
                f"Problem {self.model.problem_name or path} has {self.model.num_rows} rows, "
                f"{self.model.num_cols} columns and {self.model.num_elements} elements"
            )
            self.log(f"Model was imported from {path} in {time.time()-t0:.2f} seconds", 2)
        else:
            print(f"Unable to import model from {path}")
        return rc

    def do_solve(self, method: SolveMethod) -> None:
        if not self.have_model:
            print("** no model - import a file first")
            return
        self.options.method = method
        sol = self.model.initial_solve(self.options)
        print(_fmt_status(self.model))

    def print_solution(self, out=None, all_rows=False):
        sol = self.model.solution
        if sol.primal is None:
            print("** no solution available")
            return
        f = out or sys.stdout
        cn = self.model.col_names or [f"C{j}" for j in range(self.model.num_cols)]
        print(f"status {sol.status.name}", file=f)
        print(f"objective {sol.objective_value:.12g}", file=f)
        for j, v in enumerate(sol.primal):
            if all_rows or abs(v) > 1e-8:
                dj = sol.reduced_costs[j] if sol.reduced_costs is not None else 0.0
                print(f"{j:7d} {cn[j]:<16} {v:15.8g} {dj:15.8g}", file=f)

    def run_args(self, args: list[str]) -> int:
        try:
            return self._run_args(args)
        except IndexError:
            print("** missing value for the last parameter (try -help)")
            return 1
        except ValueError as e:
            print(f"** bad parameter value: {e}")
            return 1

    def _run_args(self, args: list[str]) -> int:
        i = 0
        rc = 0
        while i < len(args):
            a = args[i]
            al = a.lstrip("-").lower()
            if not a.startswith("-") and not self.have_model:
                rc = self.do_import(a)
                i += 1
                continue
            if al in ("dualsimplex", "duals"):
                self.do_solve(SolveMethod.DUAL_SIMPLEX)
            elif al in ("primalsimplex", "primals"):
                self.do_solve(SolveMethod.PRIMAL_SIMPLEX)
            elif al == "barrier":
                self.do_solve(SolveMethod.BARRIER)
            elif al in ("barriernocross", "barriernocrossover"):
                self.do_solve(SolveMethod.BARRIER_NO_CROSS)
            elif al == "pdlp":
                self.do_solve(SolveMethod.PDLP)
            elif al in ("solve", "either", "auto"):
                self.do_solve(SolveMethod.AUTOMATIC)
            elif al == "import":
                i += 1
                rc = self.do_import(args[i])
            elif al == "export":
                i += 1
                self.model.write_mps(args[i])
                self.log(f"Model written to {args[i]}")
            elif al in ("basisi", "basisin"):
                i += 1
                from .io.basis import read_basis

                read_basis(self.model, args[i])
            elif al in ("basiso", "basisout"):
                i += 1
                from .io.basis import write_basis

                write_basis(self.model, args[i])
            elif al == "printsol":
                self.print_solution()
            elif al == "solution":
                i += 1
                if args[i] == "-":
                    self.print_solution(all_rows=True)
                else:
                    with open(args[i], "w") as f:
                        self.print_solution(out=f, all_rows=True)
            elif al == "maximize":
                self.model.set_maximize()
            elif al == "minimize":
                self.model.set_minimize()
            elif al == "presolve":
                i += 1
                self.options.presolve.enabled = args[i].lower() != "off"
            elif al == "scaling":
                i += 1
                v = args[i].lower()
                self.options.scaling = {
                    "off": ScalingMode.OFF,
                    "0": ScalingMode.OFF,
                    "equil": ScalingMode.EQUILIBRIUM,
                    "1": ScalingMode.EQUILIBRIUM,
                    "geom": ScalingMode.GEOMETRIC,
                    "2": ScalingMode.GEOMETRIC,
                    "auto": ScalingMode.AUTO,
                    "3": ScalingMode.AUTO,
                }.get(v, ScalingMode.AUTO)
            elif al in ("maxits", "maxiterations"):
                i += 1
                self.options.max_iterations = int(args[i])
            elif al in ("sec", "seconds", "maxseconds"):
                i += 1
                self.options.max_seconds = float(args[i])
            elif al in ("primalt", "primaltolerance"):
                i += 1
                self.model.primal_tolerance = float(args[i])
            elif al in ("dualt", "dualtolerance"):
                i += 1
                self.model.dual_tolerance = float(args[i])
            elif al in ("log", "loglevel"):
                i += 1
                self.log_level = int(args[i])
                self.options.log_level = self.log_level
            elif al == "unittest":
                rc = self.unit_test()
            elif al == "netlib":
                i += 1
                from .netlib import run_netlib

                rc = run_netlib(args[i], self.options)
            elif al == "batch":
                files = args[i + 1 :]
                i = len(args)
                rc = self.do_batch(files)
            elif al in ("help", "?"):
                print(HELP)
            elif al == "params":
                from .params import help_text

                print(help_text())
            elif al in ("exit", "quit", "end", "stop"):
                return rc
            else:
                # typed parameter registry with Clp-style prefix matching
                from .params import apply as apply_param, lookup

                p = lookup(al)
                if p is not None and p.setter is not None:
                    i += 1
                    if i >= len(args):
                        print(f"** missing value for {a}")
                        return 1
                    try:
                        apply_param(self, al, args[i])
                    except (TypeError, ValueError) as e:
                        print(f"** bad value for {a}: {e}")
                        return 1
                else:
                    print(f"Unknown parameter {a} (try -help or -params)")
            i += 1
        return rc

    def do_batch(self, files: list[str]) -> int:
        from .solve import solve_batch

        models = []
        for p in files:
            m = Model()
            if m.read_mps(p) != 0:
                print(f"cannot read {p}")
                return 1
            models.append(m)
        t0 = time.time()
        sols = solve_batch(models, self.options)
        dt = time.time() - t0
        for p, s in zip(files, sols):
            print(f"{p}: {s.status.name} objective {s.objective_value:.10g}")
        print(f"Batch of {len(models)} solved in {dt:.3f}s ({len(models)/dt:.1f}/s)")
        return 0

    def unit_test(self) -> int:
        """Built-in smoke test (reference: clp -unitTest, unitTest.cpp:286)."""
        from .utils.generators import random_lp, infeasible_lp, nqueens_lp
        from .validate import check_kkt

        failures = 0
        for seed in range(3):
            m = random_lp(8, 12, seed=seed)
            m.dual()
            if not (m.is_proven_optimal() and check_kkt(m).ok):
                failures += 1
                print(f"unitTest FAILED: random_lp seed {seed} dual")
            m2 = random_lp(8, 12, seed=seed)
            m2.barrier(crossover=False)
            if not (m2.is_proven_optimal() and check_kkt(m2).ok):
                failures += 1
                print(f"unitTest FAILED: random_lp seed {seed} barrier")
        mi = infeasible_lp()
        mi.dual()
        if not mi.is_proven_primal_infeasible():
            failures += 1
            print("unitTest FAILED: infeasible detection")
        mq = nqueens_lp(4)
        mq.primal()
        if not (mq.is_proven_optimal() and abs(mq.objective_value() - 4.0) < 1e-6):
            failures += 1
            print("unitTest FAILED: nqueens primal")
        print(f"unitTest: {'OK' if failures == 0 else f'{failures} FAILURES'}")
        return failures

    def repl(self) -> int:
        print("clp_tpu — type 'help' for commands, 'quit' to exit")
        rc = 0
        while True:
            try:
                line = input("Clp:").strip()
            except EOFError:
                break
            if not line:
                continue
            if line.lower() in ("quit", "exit", "end", "stop"):
                break
            rc = self.run_args(line.split())
        return rc


def main(argv: Optional[list[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    cli = CLI()
    if not argv:
        return cli.repl()
    return cli.run_args(argv)


if __name__ == "__main__":
    sys.exit(main())

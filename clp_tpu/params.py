"""Typed parameter registry — the ClpParam/ClpParameters equivalent.

The reference registers ~140 typed CLI parameters with help text and
matching rules (ClpParam.hpp ClpParamCode, ClpParameters.hpp:99-109). This
registry maps the same names (Clp spellings kept) onto the framework's
actual knobs so the CLI, config files, and programmatic users share one
table. Each entry: (kind, default, help, setter(cli, value)).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from .constants import ScalingMode, SolveMethod


@dataclasses.dataclass
class Param:
    name: str
    kind: str  # "dbl" | "int" | "kwd" | "bool" | "action" | "str"
    default: object
    help: str
    setter: Optional[Callable] = None  # (cli, value) -> None
    choices: Optional[tuple] = None


def _set_model(attr):
    def f(cli, v):
        setattr(cli.model, attr, v)

    return f


def _set_opts(attr):
    def f(cli, v):
        setattr(cli.options, attr, v)

    return f


def _set_presolve(attr):
    def f(cli, v):
        setattr(cli.options.presolve, attr, v)

    return f


def _scaling(cli, v):
    cli.options.scaling = {
        "off": ScalingMode.OFF,
        "equilibrium": ScalingMode.EQUILIBRIUM,
        "geometric": ScalingMode.GEOMETRIC,
        "automatic": ScalingMode.AUTO,
        "dynamic": ScalingMode.DYNAMIC,
    }.get(str(v).lower(), ScalingMode.AUTO)


REGISTRY: dict[str, Param] = {}


def _reg(p: Param):
    REGISTRY[p.name.lower()] = p


# --- double parameters (reference: CLP_PARAM_DBL_*) ---
_reg(Param("primalTolerance", "dbl", 1e-7, "primal feasibility tolerance", _set_model("primal_tolerance")))
_reg(Param("dualTolerance", "dbl", 1e-7, "dual feasibility tolerance", _set_model("dual_tolerance")))
_reg(Param("seconds", "dbl", -1.0, "maximum seconds", _set_opts("max_seconds")))
_reg(Param("dualBound", "dbl", 1e10, "fake bound magnitude for dual phase 1"))
_reg(Param("objectiveScale", "dbl", 1.0, "objective scale factor"))
_reg(Param("rhsScale", "dbl", 1.0, "rhs scale factor"))
_reg(Param("dualObjectiveLimit", "dbl", 1e30, "stop dual when objective exceeds", _set_model("dual_objective_limit")))
_reg(Param("primalObjectiveLimit", "dbl", -1e30, "stop primal when objective below", _set_model("primal_objective_limit")))
_reg(Param("barrierTolerance", "dbl", 1e-8, "barrier convergence tolerance", _set_opts("barrier_tolerance")))

# --- int parameters ---
_reg(Param("maxIterations", "int", 2**31 - 1, "iteration limit", _set_opts("max_iterations")))
_reg(Param("maxFactor", "int", 100, "refactorization frequency", _set_opts("refactor_frequency")))
_reg(Param("logLevel", "int", 1, "verbosity 0-4", _set_opts("log_level")))
_reg(Param("randomSeed", "int", 1234567, "random seed (perturbation)", _set_model("random_seed")))
_reg(Param("idiotCrash", "int", 0, "idiot crash passes", _set_opts("idiot_passes")))
_reg(Param("sprintCrash", "int", 0, "sprint pass limit"))
_reg(Param("perturbation", "int", 100, "perturbation (100 = auto)", _set_opts("perturbation")))
_reg(Param("maxBarrierIterations", "int", 200, "barrier iteration limit", _set_opts("barrier_max_iterations")))

# --- keyword parameters ---
_reg(Param("scaling", "kwd", "automatic", "off/equilibrium/geometric/automatic/dynamic", _scaling,
           ("off", "equilibrium", "geometric", "automatic", "dynamic")))
_reg(Param("presolve", "kwd", "on", "on/off", lambda cli, v: _set_presolve("enabled")(cli, str(v).lower() != "off"),
           ("on", "off")))
_reg(Param("crash", "kwd", "off", "off/idiot", lambda cli, v: _set_opts("crash")(cli, str(v).lower()),
           ("off", "idiot")))
_reg(Param("dualPivot", "kwd", "steepest", "dual pricing rule", _set_opts("dual_pivot"),
           ("steepest", "dantzig")))
_reg(Param("primalPivot", "kwd", "devex", "primal pricing rule", _set_opts("primal_pivot"),
           ("devex", "dantzig", "steepest")))
_reg(Param("crossover", "kwd", "on", "barrier crossover on/off",
           lambda cli, v: _set_opts("crossover")(cli, str(v).lower() != "off"), ("on", "off")))

# --- actions (solves etc.; the CLI dispatches these) ---
for name, help_ in (
    ("dualSimplex", "solve with dual simplex"),
    ("primalSimplex", "solve with primal simplex"),
    ("barrier", "interior point + crossover"),
    ("solve", "automatic method choice"),
    ("either", "automatic method choice"),
    ("sprint", "sifting / column subset solve"),
    ("pdlp", "first-order PDHG solve"),
    ("import", "read model file"),
    ("export", "write MPS file"),
    ("basisIn", "read basis file"),
    ("basisOut", "write basis file"),
    ("printSolution", "print solution"),
    ("solution", "write solution to file"),
    ("maximize", "set maximization"),
    ("minimize", "set minimization"),
    ("unitTest", "run built-in tests"),
    ("netlib", "run netlib golden set"),
    ("exit", "quit"),
):
    _reg(Param(name, "action", None, help_))


def lookup(name: str) -> Optional[Param]:
    """Clp-style abbreviated matching: unique case-insensitive prefix."""
    low = name.lower()
    if low in REGISTRY:
        return REGISTRY[low]
    matches = [p for k, p in REGISTRY.items() if k.startswith(low)]
    return matches[0] if len(matches) == 1 else None


def apply(cli, name: str, value) -> bool:
    p = lookup(name)
    if p is None or p.setter is None:
        return False
    if p.kind == "dbl":
        value = float(value)
    elif p.kind == "int":
        value = int(value)
    p.setter(cli, value)
    return True


def help_text() -> str:
    lines = ["Parameters (Clp-style names, unique-prefix matching):"]
    for p in sorted(REGISTRY.values(), key=lambda p: (p.kind, p.name)):
        ch = f" [{'/'.join(p.choices)}]" if p.choices else ""
        d = f" (default {p.default})" if p.default is not None else ""
        lines.append(f"  {p.name:24s} {p.kind:6s} {p.help}{ch}{d}")
    return "\n".join(lines)

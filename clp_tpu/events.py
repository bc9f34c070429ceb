"""Event hooks, message catalog, and progress output.

Reference surfaces re-created:
  - ClpEventHandler (ClpEventHandler.hpp:61-103): named hook points fired
    through the solve; a handler returning a value >= 0 aborts the solve
    (status USER_STOPPED, ClpModel.hpp:435).
  - CoinMessageHandler / ClpMessage (ClpMessage.hpp): numbered message
    catalog with log levels.
  - ClpOutput (ClpOutput.hpp:16-80): tabular progress UI with a
    deterministic mode for diffable output.
"""

from __future__ import annotations

import dataclasses
import enum
import sys
import time
from typing import Callable, Optional


class Event(enum.IntEnum):
    """Hook points (subset of ClpEventHandler's 43; grows as needed)."""

    END_OF_ITERATION = 0
    END_OF_FACTORIZATION = 1
    END_OF_VALUES_PASS = 2
    NODE = 3
    TREE_STATUS = 4
    SOLUTION = 5
    THETA = 6
    PRESOLVE_START = 7
    PRESOLVE_END = 8
    POSTSOLVE_START = 9
    POSTSOLVE_END = 10
    START_SOLVE = 11
    END_SOLVE = 12
    BARRIER_ITERATION = 13
    CROSSOVER_START = 14


class EventHandler:
    """Subclass and override `event`; return >= 0 to abort the solve."""

    def event(self, which: Event, model=None, **info) -> int:
        return -1


@dataclasses.dataclass
class Message:
    number: int
    level: int
    text: str


# Numbered catalog in the spirit of ClpMessage.hpp (CLP_* enums)
CATALOG = {
    1: Message(1, 1, "Optimal - objective value {obj:.10g}"),
    2: Message(2, 1, "Primal infeasible - infeasibility {pinf:.6g}"),
    3: Message(3, 1, "Dual infeasible (unbounded)"),
    4: Message(4, 1, "Stopped on iterations - objective {obj:.10g}"),
    5: Message(5, 1, "Stopped due to errors"),
    6: Message(6, 1, "{rows} rows, {cols} columns and {elems} elements"),
    14: Message(14, 1, "Presolve: {drows} rows and {dcols} columns dropped"),
    16: Message(16, 2, "Solve phase {phase}: iteration {it} objective {obj:.8g}"),
    29: Message(29, 1, "End of solve: status {status} time {time:.3f}s"),
    40: Message(40, 2, "Barrier iteration {it}: gap {gap:.3e} pinf {pinf:.3e}"),
}


class MessageHandler:
    """Log-level filtered message printing; override `print_message` to
    intercept (the reference's unit test does exactly that,
    unitTest.cpp:1567)."""

    def __init__(self, log_level: int = 1, stream=None):
        self.log_level = log_level
        self.stream = stream or sys.stdout
        self.messages_seen: list[int] = []

    def message(self, number: int, **kw) -> None:
        msg = CATALOG.get(number)
        if msg is None:
            return
        self.messages_seen.append(number)
        if msg.level <= self.log_level:
            self.print_message(msg, msg.text.format(**kw))

    def print_message(self, msg: Message, text: str) -> None:
        print(text, file=self.stream)


class ProgressDisplay:
    """Tabular progress UI (ClpOutput-style).

    Deterministic mode prints every `every` iterations without timestamps so
    output is diffable (reference: `-progress 0 -progressIter N`,
    doc/clp-output-comparison.md).
    """

    HEADER = f"{'phase':>8} {'iter':>8} {'objective':>16} {'p.inf':>10} {'d.inf':>10} {'time':>8}"

    def __init__(self, stream=None, deterministic: bool = False, every: int = 100):
        self.stream = stream or sys.stdout
        self.deterministic = deterministic
        self.every = every
        self._t0 = time.time()
        self._printed_header = False

    def line(self, phase: str, iteration: int, objective: float,
             pinf: float = 0.0, dinf: float = 0.0) -> None:
        if iteration % self.every and not self.deterministic:
            return
        if not self._printed_header:
            print(self.HEADER, file=self.stream)
            self._printed_header = True
        t = 0.0 if self.deterministic else time.time() - self._t0
        print(
            f"{phase:>8} {iteration:>8d} {objective:>16.8g} {pinf:>10.3g} "
            f"{dinf:>10.3g} {t:>8.2f}",
            file=self.stream,
        )

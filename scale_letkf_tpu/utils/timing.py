"""Hierarchical section timers (mpi_timer equivalent).

Reference: `mpi_timer` (scale/common/common_mpi_scale.f90:1971-2057) — 5-level
nested wall-clock timers with optional barrier separation of compute/wait.
Here the barrier analogue is jax.block_until_ready on a sentinel value so a
section's async dispatch cost is attributed to the section that issued it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax


class SectionHandle:
    """Yielded by Timer.section: set .sync_on to the section's device output
    so its async dispatch is attributed to this section (the USE_MPI_BARRIER
    analogue), instead of leaking into whichever later section first blocks."""
    __slots__ = ("sync_on",)

    def __init__(self, sync_on=None):
        self.sync_on = sync_on


@dataclass
class Timer:
    sync: bool = True      # block on device work at section boundaries
    records: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)
    _stack: list[str] = field(default_factory=list)

    @contextmanager
    def section(self, name: str, sync_value=None):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        handle = SectionHandle(sync_value)
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            if self.sync and handle.sync_on is not None:
                jax.block_until_ready(handle.sync_on)
            dt = time.perf_counter() - t0
            self.records[full] = self.records.get(full, 0.0) + dt
            self.counts[full] = self.counts.get(full, 0) + 1
            self._stack.pop()

    def report(self) -> str:
        lines = ["== timing =="]
        for k in sorted(self.records):
            depth = k.count("/")
            lines.append(f"{'  ' * depth}{k.split('/')[-1]:<32s} "
                         f"{self.records[k]:10.3f} s  x{self.counts[k]}")
        return "\n".join(lines)

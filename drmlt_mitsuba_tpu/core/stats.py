"""Named statistics counters (ref: include/mitsuba/core/statistics.h:55-94,
StatsCounter types ENumberValue/EPercentage/EAverage).

The reference increments thread-local counters inside the mutation loop
(8 DRMLT counters at drmlt_proc.cpp:34-49) and prints them at exit.  Here
counters are reductions over the chain batch carried through lax.scan (the
`stats` pytree every step function returns); this module aggregates those
device-side series into the same named-counter report.
"""
from __future__ import annotations

import numpy as np

PERCENTAGE = "percentage"
NUMBER = "number"
AVERAGE = "average"


class Statistics:
    """Host-side aggregate of per-step stat pytrees."""

    def __init__(self):
        self._counters = {}

    def record(self, name: str, series, kind: str = AVERAGE,
               base_name: str | None = None):
        """Record a per-step array (e.g. stats['accept1'] of shape (n_steps,))."""
        self._counters[name] = (kind, np.asarray(series), base_name)

    def record_mcmc(self, stats: dict, n_chains: int):
        """Ingest the stats dict returned by pssmlt/drmlt render loops."""
        mapping = {
            "accept": ("Overall acceptance rate", PERCENTAGE),
            "accept1": ("First stage acceptance rate", PERCENTAGE),
            "accept2": ("Second stage acceptance rate", PERCENTAGE),
            "a1": ("Mean first stage alpha", AVERAGE),
            "a2": ("Mean second stage alpha", AVERAGE),
            "large": ("Large step ratio", PERCENTAGE),
        }
        for key, (name, kind) in mapping.items():
            if key in stats:
                self.record(name, stats[key], kind)
        self.record("Mutations", np.asarray(
            [len(np.asarray(next(iter(stats.values())))) * n_chains]
        ), NUMBER)

    def report(self) -> str:
        lines = ["  ------------------------------------------------------"]
        for name, (kind, series, _) in sorted(self._counters.items()):
            if kind == PERCENTAGE:
                lines.append(f"  * {name}: {100.0 * float(series.mean()):.2f}%")
            elif kind == NUMBER:
                lines.append(f"  * {name}: {int(series.sum())}")
            else:
                lines.append(f"  * {name}: {float(series.mean()):.4f}")
        lines.append("  ------------------------------------------------------")
        return "\n".join(lines)

    def as_dict(self):
        out = {}
        for name, (kind, series, _) in self._counters.items():
            out[name] = float(series.mean()) if kind != NUMBER else int(series.sum())
        return out

"""Shared probe-timing helpers (floor-stability rule).

ONE definition used by both the in-process scaling probe
(tools/scaling_probe.py) and the spark-submit ship-path probe
(tools/submit_probe.py), so the two throughput families stay comparable:
a tuning of the rule in one place is automatically the other's rule too.
Living inside the package also means the submitted driver receives these
via the --py-files zip — the only import path a scratch-cwd driver has.

(bench.py keeps its own steal-voting variant with a different contract —
it returns only the floor and lets low-steal reps vote for early
termination; see its docstring.)
"""

from __future__ import annotations

import time


def cpu_counters() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def timed_with_steal(fn) -> tuple[float, float]:
    """Time ``fn`` and report (seconds, CPU-steal % over the window).

    ``perf_counter``, not ``time.time``: floor selection MINIMIZES over
    reps, so a backward NTP step during one rep would fabricate the
    published floor (review r05c)."""
    c0 = cpu_counters()
    t0 = time.perf_counter()
    fn()
    secs = time.perf_counter() - t0
    c1 = cpu_counters()
    d = [b - a for a, b in zip(c0, c1)]
    total = sum(d) or 1
    return secs, round(100.0 * d[7] / total, 2)


def timed_floor(fn, min_reps: int = 3, max_reps: int = 9,
                tol: float = 1.3):
    """Rerun until the two best times agree within ``tol``, report the
    MINIMUM over all runs — noisy-neighbor interference on this VM is
    largely INVISIBLE to /proc/stat steal (observed 66s runs at 0.3% steal
    vs a 5s idle floor; BENCH/BASELINE.md round-2 addendum), so agreement
    between two independent runs, not a clean steal reading, is the signal
    that the floor was reached. Per-run steal is recorded for the report
    but does not gate selection.

    Returns (best, runs, settled): ``settled`` is whether the two-best
    agreement was ever reached — a leg that exhausts max_reps without
    agreement never found its floor, and downstream decompositions must
    not treat its minimum as one (review r05c)."""
    runs = []
    settled = False
    for i in range(max_reps):
        runs.append(timed_with_steal(fn))
        # need two samples before the agreement test regardless of
        # min_reps (SPARK_GRAFT_PROBE_REPS=1 used to IndexError here)
        if i + 1 >= max(min_reps, 2):
            ts = sorted(s for s, _ in runs)
            if ts[1] <= ts[0] * tol:
                settled = True
                break
    return min(s for s, _ in runs), runs, settled

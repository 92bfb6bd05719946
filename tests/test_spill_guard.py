"""On-demand spill-regression guard (r10 verdict task 8).

The measurement that caught r10's biggest finding — the wide-simhash band
degeneracy (313 B candidate probes from constant high bits) and the 1000×
pair-counting spill cliff (415 GiB spilled on a 19 GiB shuffle,
PERF.md "r10: spill accounting") — was a one-off ``tools/stage_probe.py``
run. This guard re-runs it on demand against the 100× corpus and asserts
the stored containment pair join's event-log volumes stay inside the band
recorded at r11, so a plan regression that silently multiplies candidate
volume (an unpushed filter, a lost bucketed scan, a band-key degeneracy)
flags as a byte-volume blowup rather than hiding behind wall-clock noise.

Gated OFF by default: it needs the 100× corpus (/tmp/sf10, built with
``tools/make_scaled_sf.py``) and ~2 min of Spark time, so the driver's
per-round ``pytest tests/ -x -q`` skips it. Run with:

    SPARK_GRAFT_SLOW_TESTS=1 python -m pytest tests/test_spill_guard.py -q
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SF100X = Path("/tmp/sf10")

# Recorded r11 band for doc_containment_pairs at /tmp/sf10 (100×, 500 k
# docs), shingle store serving, PROBE_RUNS=2 (second run reported):
# wall 10.7 s, shuffle_w 2.27 GiB, shuffle_r 4.54 GiB, spill 0 (the spill
# cliff is a 1000× phenomenon — at 100× the pair state fits, so ANY
# material spill here is itself a regression). Byte volumes are
# data-determined, not machine-determined: the shuffle write is the
# candidate-pair exchange — it moves only if the PLAN or the candidate
# volume moves, which is exactly what this guards.
RECORDED = {
    "shuffle_w_gib": 2.27,
    "spill_mem_gib": 0.0,
}

# r12 guard rows (verdict task 5): protect the r11/r12 wins from silent
# regression. Bands recorded at /tmp/sf10 (100×), PROBE_RUNS=2 (second run
# reported), stores pre-ensured, fresh process:
# - doc_simhash_pairs_stored: the lowest-agreeing-band predicate deleted the
#   pair-dedup groupBy exchange (37.5 GiB spill → 0 at r11); recorded
#   shuffle_w 1.24 GiB (final orderBy only), spill 0.
# - doc_dup_spans: served from the n=15 shingle store; recorded shuffle_w
#   0.10 GiB, spill 0 — a lost store serve or a re-inlined span expression
#   (the InferFiltersFromGenerate trap) multiplies both.
# - doc_containment_pairs_capped: the bounded-state containment form;
#   recorded shuffle_w 1.79 GiB, spill 0 at 100×.
RECORDED_R12 = {
    "doc_simhash_pairs_stored": {
        "shuffle_w_gib": 1.24,
        "ensure": "simhash",
        "spill_cap_gib": 2.0,
    },
    "doc_dup_spans": {
        "shuffle_w_gib": 0.103,
        "ensure": "shingles15",
        "spill_cap_gib": 2.0,
    },
    "doc_containment_pairs_capped": {
        # re-recorded after the r12 tuning pass (hot persist + pinned pair
        # agg + shuffle_hash size joins): wall 7.6 s, spill 0 at 100×; the
        # same plan runs 87 s / ZERO spill at 1000× (vs 346 s / 400 GiB
        # uncapped — the retired cliff)
        "shuffle_w_gib": 1.825,
        "ensure": "shingles",
        "spill_cap_gib": 8.0,
    },
}


def _probe(query: str, ensure: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=str(SF100X),
        PROBE_RUNS="2",
        PROBE_ENSURE=ensure,
    )
    out = subprocess.run(
        [sys.executable, "tools/stage_probe.py", "--json", query],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("PROBE_JSON ")
    ]
    assert lines, (
        f"no PROBE_JSON line\nstdout:{out.stdout[-2000:]}\n"
        f"stderr:{out.stderr[-2000:]}"
    )
    return json.loads(lines[-1].split(" ", 1)[1])


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="set SPARK_GRAFT_SLOW_TESTS=1 to run the 100x spill guard (~2 min)",
)
@pytest.mark.skipif(
    not (SF100X / "documents.parquet").exists(),
    reason="100x corpus missing — build with tools/make_scaled_sf.py",
)
def test_containment_pair_spill_band_100x():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=str(SF100X),
        PROBE_RUNS="2",
        PROBE_ENSURE="shingles",
    )
    out = subprocess.run(
        [sys.executable, "tools/stage_probe.py", "--json", "doc_containment_pairs"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("PROBE_JSON ")
    ]
    assert lines, f"no PROBE_JSON line\nstdout:{out.stdout[-2000:]}\nstderr:{out.stderr[-2000:]}"
    m = json.loads(lines[-1].split(" ", 1)[1])

    # Candidate volume must not blow up: the shuffled pair relation stays
    # within +60% of the recorded band (lz4-compressed bytes wobble a few
    # percent run-to-run; a degeneracy multiplies them, it doesn't nudge).
    assert m["shuffle_w_gib"] <= RECORDED["shuffle_w_gib"] * 1.6, m
    # ...and must not silently vanish either (a filter pushed too far /
    # an accidentally-empty store would report near-zero volume).
    assert m["shuffle_w_gib"] >= RECORDED["shuffle_w_gib"] * 0.4, m
    # At 100× the pair-counting state FITS in memory (recorded spill = 0);
    # material spill at this scale is a regression in its own right.
    assert m["spill_mem_gib"] <= 8.0, m


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="set SPARK_GRAFT_SLOW_TESTS=1 to run the 100x spill guards (~2 min each)",
)
@pytest.mark.skipif(
    not (SF100X / "documents.parquet").exists(),
    reason="100x corpus missing — build with tools/make_scaled_sf.py",
)
@pytest.mark.parametrize("query", sorted(RECORDED_R12))
def test_zero_spill_wins_hold_at_100x(query):
    """r12 (verdict task 5): the stored simhash pair join, the span-store
    span stats, and the df-capped containment all measured ZERO spill and a
    pinned shuffle volume at 100x. A plan regression (lost bucketed serve,
    re-inlined generator expression, a returned pair-dedup exchange)
    multiplies bytes — wall-clock noise can't hide it."""
    band = RECORDED_R12[query]
    m = _probe(query, band["ensure"])
    # volume must neither blow up (degeneracy) nor vanish (empty store /
    # over-pushed filter); lz4 bytes wobble a few percent run to run
    assert m["shuffle_w_gib"] <= band["shuffle_w_gib"] * 1.6, m
    assert m["shuffle_w_gib"] >= band["shuffle_w_gib"] * 0.4, m
    # these are the zero-spill wins — material spill IS the regression
    assert m["spill_mem_gib"] <= band["spill_cap_gib"], m


# r13 (verdict task 8): the composed capped curation's zero-spill claim
# (279.7 s / 0 spill at 1000×, PERF.md r12d) depends on the survivor-id
# restriction and the exploded store relation staying PERSISTED — the
# capped pair pipeline consumes its exploded input on four legs, and the
# uncached diamond re-executed the store scan + semi-join per leg (+239 s
# at 1000×). Volumes are asserted on the WHOLE PROCESS (the pair
# derivation runs at plan-construction time via the CC collect, outside
# any probe job group): recorded at /tmp/sf10 (100×), PROBE_RUNS=2,
# PROBE_REPORT=first, shingle n=3 + n=4 stores pre-ensured:
# total_shuffle_w 1.958 GiB, total spill 0.
RECORDED_R13_CURATION = {
    "total_shuffle_w_gib": 1.958,
    "spill_cap_gib": 4.0,
}


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="set SPARK_GRAFT_SLOW_TESTS=1 to run the 100x spill guards",
)
@pytest.mark.skipif(
    not (SF100X / "documents.parquet").exists(),
    reason="100x corpus missing — build with tools/make_scaled_sf.py",
)
def test_curation_capped_diamond_stays_persisted_100x():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=str(SF100X),
        PROBE_RUNS="2",
        PROBE_REPORT="first",
        PROBE_ENSURE="shingles,shingles4",
    )
    out = subprocess.run(
        [
            sys.executable,
            "tools/stage_probe.py",
            "--json",
            "doc_curation_pipeline_capped",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("PROBE_JSON ")
    ]
    assert lines, (
        f"no PROBE_JSON line\nstdout:{out.stdout[-2000:]}\n"
        f"stderr:{out.stderr[-2000:]}"
    )
    m = json.loads(lines[-1].split(" ", 1)[1])
    band = RECORDED_R13_CURATION
    # a lost persist re-runs the exploded-store semi-join per consuming
    # leg — process shuffle volume multiplies; it must not vanish either
    assert m["total_shuffle_w_gib"] <= band["total_shuffle_w_gib"] * 1.6, m
    assert m["total_shuffle_w_gib"] >= band["total_shuffle_w_gib"] * 0.4, m
    # the zero-spill claim, process-wide
    assert m["total_spill_gib"] <= band["spill_cap_gib"], m

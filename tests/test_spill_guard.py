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

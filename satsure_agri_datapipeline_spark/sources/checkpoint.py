"""Incremental-ingest file checkpoint (SURVEY.md §2.1 S2).

Batch parity with reference ``src/components/ingestion.py:143-201``: a JSON
file holding the set of already-processed file names; discovery filters
against it; after a run the *attempted* file names (including rejected ones —
a documented reference quirk, ``ingestion.py:97-99``) are unioned back in.

``mark_failed_as_processed=False`` gives the fixed behavior (only accepted
files are checkpointed) — the default mirrors the reference for parity.

This is driver-side metadata only (file *names*, not data rows), so it stays
O(files) at any data scale. The idiomatic streaming replacement is the
Structured Streaming file source with its own checkpoint dir
(``satsure_agri_datapipeline_spark.streaming``).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


class FileCheckpoint:
    def __init__(self, path: str | Path, mark_failed_as_processed: bool = True):
        self.path = Path(path)
        self.mark_failed_as_processed = mark_failed_as_processed

    def load(self) -> set[str]:
        """Processed file-name set; empty on missing or corrupt checkpoint
        (reference tolerates corruption by starting fresh)."""
        if not self.path.exists():
            return set()
        try:
            data = json.loads(self.path.read_text())
            return set(data.get("processed_files", []))
        except (json.JSONDecodeError, OSError) as exc:
            logger.warning("corrupt checkpoint %s (%s); starting fresh", self.path, exc)
            return set()

    def filter_new(self, files: list[Path]) -> list[Path]:
        processed = self.load()
        return [f for f in files if f.name not in processed]

    def update(self, attempted: list[Path], accepted: list[Path] | None = None) -> None:
        """Union attempted (or accepted-only, when fixing the quirk) names in."""
        names = attempted if self.mark_failed_as_processed else (accepted or [])
        merged = self.load() | {Path(f).name for f in names}
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps({"processed_files": sorted(merged)}, indent=2))

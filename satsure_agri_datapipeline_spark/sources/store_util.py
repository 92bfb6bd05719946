"""Shared machinery for the ingest-time bucketed stores.

Three modules persist a pre-exchanged relation keyed by a deterministic
digest directory under the system tempdir: the fact-table layout
(``bucketed.py``), the exploded shingle store (``shingle_store.py``) and
the MinHash band store (``band_store.py``). They share two pieces of
discipline implemented here:

- ``layout_dir``: the deterministic per-parameter directory. The digest
  key includes EVERY parameter that changes the store's bytes (source
  dir, n_buckets, hash params, ...) so two configurations can never
  collide on one path.
- ``atomic_swap``: builds happen in a process-unique sibling directory
  and are renamed into place, so a concurrent builder (bench + pytest
  racing ``needs_build``) can never interleave half-written files under
  the served path. The loser of the rename discards its build and serves
  the winner's. Spark's ``saveAsTable`` registered the build-dir path as
  each table's LOCATION, so callers must re-attach tables from the final
  path after the swap (both stores' attach paths already drop-and-recreate
  on location mismatch).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from pathlib import Path


def layout_dir(kind: str, *key_parts: object) -> Path:
    """Deterministic store directory: ``$TMPDIR/spark_graft_<kind>_<digest>``
    where the digest covers every store parameter."""
    key = "|".join(str(p) for p in key_parts)
    digest = hashlib.sha1(key.encode()).hexdigest()[:12]
    return Path(tempfile.gettempdir()) / f"spark_graft_{kind}_{digest}"


def build_scratch_dir(layout: Path) -> Path:
    """Process-unique sibling of ``layout`` to build into before the swap."""
    return layout.parent / f"{layout.name}.build{os.getpid()}"


def atomic_swap(scratch: Path, layout: Path) -> None:
    """Move a completed build into place. If another process completed a
    build first (its layout already sits at the final path, manifest
    included), keep THEIRS and discard ours — both were built from the
    same (source, params) key so they are interchangeable; a stale layout
    at the final path was already removed by the caller before building."""
    try:
        os.rename(scratch, layout)
    except OSError:
        if layout.exists():
            shutil.rmtree(scratch, ignore_errors=True)
        else:
            raise

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
import itertools
import os
import shutil
import tempfile
from pathlib import Path

# Process-local uniquifier for retire_layout aside names: two retires of the
# same layout within one process (test loops) must not collide on the pid.
_ASIDE_COUNTER = itertools.count()


def layout_dir(kind: str, *key_parts: object) -> Path:
    """Deterministic store directory: ``$TMPDIR/spark_graft_<kind>_<digest>``
    where the digest covers every store parameter."""
    key = "|".join(str(p) for p in key_parts)
    digest = hashlib.sha1(key.encode()).hexdigest()[:12]
    return Path(tempfile.gettempdir()) / f"spark_graft_{kind}_{digest}"


def build_scratch_dir(layout: Path) -> Path:
    """Process-unique sibling of ``layout`` to build into before the swap."""
    return layout.parent / f"{layout.name}.build{os.getpid()}"


def source_fingerprint(src: Path) -> dict[str, list[int]]:
    """``{relpath: [mtime_ns, size]}`` for a parquet source that is either a
    single file or a directory of part files. Hidden/underscore-prefixed
    entries (``_SUCCESS``, ``.crc``) are ignored — they carry no data and
    committers touch them freely. The fingerprint is the store manifests'
    provenance record: identical fingerprint ⇒ identical source bytes for
    staleness purposes (mtime_ns + size per file)."""
    if not src.exists():
        return {}
    if src.is_file():
        st = src.stat()
        return {src.name: [st.st_mtime_ns, st.st_size]}
    out: dict[str, list[int]] = {}
    for f in sorted(src.rglob("*")):
        if f.is_file() and not f.name.startswith((".", "_")):
            st = f.stat()
            out[str(f.relative_to(src))] = [st.st_mtime_ns, st.st_size]
    return out


def classify_source_change(
    recorded: dict[str, list[int]] | None, current: dict[str, list[int]]
) -> tuple[str, list[str]]:
    """Compare a manifest's recorded source fingerprint against the current
    one: ``("fresh", [])`` when identical, ``("append", new_relpaths)`` when
    every recorded file is byte-identical and only NEW files appeared (the
    delta-maintenance case — a data drop into a directory source), else
    ``("rebuild", [])`` (mutation, deletion, single-file rewrite, or a
    pre-fingerprint manifest). JSON round-trips fingerprints as lists, so
    entries compare as lists on both sides."""
    if not recorded or not current:
        return ("rebuild", [])
    rec = {k: list(v) for k, v in recorded.items()}
    cur = {k: list(v) for k, v in current.items()}
    if rec == cur:
        return ("fresh", [])
    if all(cur.get(k) == v for k, v in rec.items()):
        return ("append", sorted(k for k in cur if k not in rec))
    return ("rebuild", [])


def max_deltas() -> int:
    """Delta-chain compaction bound: after this many append deltas a store
    rebuilds instead of appending again. Each delta adds one parquet file
    per bucket (Spark reads multi-file buckets fine, but file-count grows
    linearly with drops and small files erode scan efficiency); a bound of
    16 caps files-per-bucket at 17 while still amortizing the full
    signature/shingle pass across 16 drops.
    ``SPARK_GRAFT_STORE_MAX_DELTAS`` overrides."""
    try:
        return int(os.environ.get("SPARK_GRAFT_STORE_MAX_DELTAS", "16"))
    except ValueError:
        return 16


def retire_layout(layout: Path) -> Path | None:
    """Atomically rename a stale layout ASIDE (instead of rmtree-in-place)
    so a concurrent session already scanning tables registered over the old
    location keeps reading complete files for the whole rebuild; the caller
    deletes the returned aside dir after the new layout is swapped in.
    Returns None when the layout doesn't exist or another process already
    retired it (benign race — both were replacing the same stale bytes)."""
    if not layout.exists():
        return None
    aside = layout.parent / (
        f"{layout.name}.old{os.getpid()}_{next(_ASIDE_COUNTER)}"
    )
    try:
        os.rename(layout, aside)
    except OSError:
        return None
    return aside


def discard_retired(aside: Path | None) -> None:
    """Best-effort cleanup of a retire_layout aside dir."""
    if aside is not None:
        shutil.rmtree(aside, ignore_errors=True)


# (app_id, table) -> last-seen manifest mtime_ns; a change means another
# process rebuilt the layout under the SAME path, so this session's cached
# file index for the table lists deleted files and must be refreshed.
_REFRESH_SEEN: dict[tuple[str, str], int] = {}


def refresh_if_rebuilt(spark, tbl: str, manifest_path: Path) -> None:
    """Invalidate a served table's cached file listing when its layout was
    rebuilt in place by ANOTHER process (manifest mtime moved since this
    session last attached). Without this, a session that attached before a
    concurrent rebuild keeps a file index of renamed-away files and every
    later scan dies with FAILED_READ_FILE until a manual REFRESH TABLE."""
    try:
        m = manifest_path.stat().st_mtime_ns
    except OSError:
        return
    key = (spark.sparkContext.applicationId, tbl)
    prev = _REFRESH_SEEN.get(key)
    if prev is not None and prev != m and spark.catalog.tableExists(tbl):
        spark.sql(f"REFRESH TABLE {tbl}")
    _REFRESH_SEEN[key] = m


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

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
import json
import logging
import os
import shutil
import tempfile
from pathlib import Path

_LOG = logging.getLogger("satsure_agri_datapipeline_spark.stores")

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


def write_manifest(path: Path, obj: dict) -> None:
    """Atomic manifest write (ADVICE r9, medium): JSON to a temp file in the
    same directory + ``os.replace`` over the manifest, so a concurrent
    session's read can never observe a truncated file. Plain ``write_text``
    on the live manifest raced ``_classify``/serving readers into
    JSONDecodeError crashes on default-served raw queries."""
    tmp = path.parent / f"{path.name}.tmp{os.getpid()}"
    tmp.write_text(json.dumps(obj, indent=2))
    os.replace(tmp, path)


def read_manifest_or_none(path: Path) -> dict | None:
    """Tolerant manifest read: missing, unreadable, or unparseable (plain
    corruption, or a torn write from a pre-``write_manifest`` version) all
    mean 'no usable manifest' — the caller classifies as rebuild / refuses
    to serve, instead of an exception escaping a default-serving hook."""
    try:
        m = json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        return None
    return m if isinstance(m, dict) else None


_DELTA_LOCK_NAME = "_delta.lock"


def claim_append(layout: Path) -> bool:
    """Writer mutual exclusion for the append-delta path (ADVICE r9, high):
    two sessions can both classify the same data drop as 'append' before
    either writes the ``pending_delta`` marker — without a claim, both
    would insert the new files' rows and silently corrupt every downstream
    jaccard/containment/fact aggregate while the final manifest records
    the store as fresh. ``os.open(O_CREAT|O_EXCL)`` on a lock file inside
    the layout dir; exactly one claimant wins, losers re-classify after
    the winner's manifest update (or fall back to a rebuild, which is
    serialized separately via scratch-dir + atomic_swap).

    The lock is liveness-only, never the consistency mechanism: a claimant
    that crashes leaves either (a) no pending marker — the next ensure
    fails the claim and degrades to a rebuild, which renames the layout
    (lock included) aside — or (b) a pending marker, which forces a
    rebuild by itself. No unlock-on-crash protocol is needed."""
    try:
        fd = os.open(
            layout / _DELTA_LOCK_NAME, os.O_CREAT | os.O_EXCL | os.O_WRONLY
        )
    except OSError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(str(os.getpid()))
    return True


def release_append(layout: Path) -> None:
    """Best-effort unlock of :func:`claim_append` (the layout may have been
    renamed aside by a racing rebuild; that copy of the lock dies with the
    aside dir)."""
    try:
        os.unlink(layout / _DELTA_LOCK_NAME)
    except OSError:
        pass


def log_store_fallback(what: str, exc: Exception) -> None:
    """ADVICE r9, low: the ensure/serve paths convert ANY failure into a
    full rebuild or a raw-compute fallback by design (availability over
    latency) — but a SILENT conversion masks genuine code/config bugs as
    repeated rebuild cost. Log the cause at warning before falling back."""
    _LOG.warning("%s failed; falling back (rebuild/raw): %r", what, exc)


# (src path, salt) -> (top-level dir mtime_ns, fingerprint). See
# cached_source_fingerprint for the exact staleness contract.
_FP_CACHE: dict[tuple[str, int], tuple[int, dict[str, list[int]]]] = {}


def cached_source_fingerprint(
    src: Path, salt: int = 0
) -> dict[str, list[int]]:
    """``source_fingerprint`` behind a directory-mtime-keyed cache, for the
    HOT serving hooks only (``*_or_none`` runs on every ``load_table`` call
    per table per query; a full rglob+stat of a many-part source on each is
    real overhead at scale — ADVICE r9, low). ``ensure_*`` maintenance
    paths keep the exact uncached fingerprint.

    Invalidates on: the source's top-level directory mtime (any file
    add/remove/rename in a flat part-file layout touches it) or a change
    of ``salt`` (callers pass the store manifest's mtime_ns, so every
    ensure-driven rebuild/append refreshes the cache). The accepted
    escape: an IN-PLACE overwrite of an existing part file in a nested
    subdirectory, or one that never goes through a rename — not how any
    parquet committer writes. Single-file sources bypass the cache (one
    stat). ``SPARK_GRAFT_FP_CACHE=off|0|none`` disables."""
    if os.environ.get("SPARK_GRAFT_FP_CACHE", "").lower() in (
        "off", "0", "none",
    ):
        return source_fingerprint(src)
    try:
        if not src.is_dir():
            return source_fingerprint(src)
        dir_mtime = src.stat().st_mtime_ns
    except OSError:
        return source_fingerprint(src)
    key = (str(src), salt)
    hit = _FP_CACHE.get(key)
    if hit is not None and hit[0] == dir_mtime:
        return hit[1]
    fp = source_fingerprint(src)
    _FP_CACHE[key] = (dir_mtime, fp)
    return fp


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


def source_total_bytes(src: Path) -> int:
    """Total parquet data bytes under ``src`` (file or directory of part
    files; hidden/underscore committer artifacts ignored) — the only size
    measure known BEFORE any Spark job runs. Shared by
    :func:`default_n_buckets` and the pair-family size gate
    (``plans/catalog_llm.py``, r13). Unreadable source → 0 (callers treat
    that as 'small': raw semantics / smallest bucket count)."""
    try:
        if src.is_dir():
            return sum(
                f.stat().st_size
                for f in src.rglob("*")
                if f.is_file() and not f.name.startswith((".", "_"))
            )
        return src.stat().st_size
    except OSError:
        return 0


def default_n_buckets(src: Path) -> int:
    """Scale-aware default bucket count for a store over ``src`` (r12):
    bucket counts must grow with the corpus exactly like band keys (the
    r10 lesson) and shuffle partitions (r10 ``_pick_shuffle_partitions``)
    — a 32-bucket exploded shingle relation at 1000× puts ~8 M rows in
    each self-join partition and the join's per-task sort/hash state
    spills tens of GiB on a zero-Exchange plan (measured r12: 145 GiB on
    the df-capped containment probe). Thresholds on the SOURCE table's
    parquet bytes (the only size known before the build): ≥ 256 MiB → 128
    buckets, ≥ 64 MiB → 64, else 32 — sf0.1 (0.6 MiB) and the 100× corpus
    (42 MiB) keep their recorded 32-bucket bands; the 1000× corpus
    (421 MiB) gets 128. ``SPARK_GRAFT_STORE_N_BUCKETS`` overrides.

    The resolved count is part of the layout key and the manifest, so a
    source that grows across a threshold simply stops serving the old
    layout (or_none returns None → raw path) until the next ensure builds
    the right-sized one — the standard staleness discipline."""
    env = os.environ.get("SPARK_GRAFT_STORE_N_BUCKETS")
    if env:
        try:
            return int(env)
        except ValueError:
            pass
    total = source_total_bytes(src)
    if total >= 256 * 1024**2:
        return 128
    if total >= 64 * 1024**2:
        return 64
    return 32


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


def discard_stale_siblings(
    kind: str, manifest_name: str, current_layout: Path, match: dict
) -> list[Path]:
    """ADVICE r12: a source that grows across a :func:`default_n_buckets`
    threshold changes the layout digest, so the rebuild lands in a NEW
    ``spark_graft_<kind>_*`` dir and the old-bucket-count layout would be
    orphaned forever (``retire_layout`` only ever targets the new key's
    path). Called after a successful rebuild: delete sibling layouts of
    the same kind whose manifests agree with ``match`` on every key (same
    source + every store param EXCEPT n_buckets — equal params would have
    hashed to the current dir, so a matching sibling is by construction a
    superseded bucket-count generation). Removal goes through
    retire_layout's rename-aside first, the same grace given to every
    in-place rebuild. Scratch (``.buildPID``) and aside (``.oldPID``)
    dirs are skipped — their lifecycles are owned elsewhere; unreadable
    manifests are left alone (possibly mid-write by another process).
    Best-effort throughout: a missed orphan costs disk, never
    correctness."""
    removed: list[Path] = []
    prefix = f"spark_graft_{kind}_"
    try:
        siblings = list(current_layout.parent.glob(prefix + "*"))
    except OSError:
        return removed
    for d in siblings:
        if d == current_layout or "." in d.name[len(prefix):]:
            continue
        try:
            if not d.is_dir():
                continue
        except OSError:
            continue
        m = read_manifest_or_none(d / manifest_name)
        if m is None:
            continue
        if all(m.get(k) == v for k, v in match.items()):
            discard_retired(retire_layout(d))
            removed.append(d)
    if removed:
        _LOG.warning(
            "%s store: discarded %d superseded layout(s) keyed at a "
            "different bucket count: %s",
            kind,
            len(removed),
            ", ".join(p.name for p in removed),
        )
    return removed


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

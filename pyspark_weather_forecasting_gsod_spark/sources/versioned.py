"""Versioned parquet tables: snapshot isolation + time travel, lakehouse-lite.

The maintenance layer a long-lived 100 TB dataset needs between plain
parquet and a full table format: every write is a NEW immutable version
directory (``v=N``), readers pin a version (or take the latest), history
is enumerable, and any two versions diff into an I/U/D changeset via the
CDC operator. Because versions are immutable, readers never see partial
writes (writers stage into the next ``v=N`` and the version only becomes
latest when its ``_SUCCESS`` marker lands — the same commit protocol file
formats rely on), and reproducing yesterday's pipeline run is just
pinning yesterday's version. Delta/Iceberg replace this layer wholesale
where available; the API here is deliberately shaped so they can.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^v=(\d+)$")


def list_versions(table_dir: str) -> list[int]:
    """Committed versions (ascending) — directories with a ``_SUCCESS``
    marker; a crashed write's partial directory is invisible."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _V_RE.match(name)
        if m and os.path.exists(os.path.join(table_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def write_version(df: DataFrame, table_dir: str, max_attempts: int = 16) -> int:
    """Commit ``df`` as the next version; returns the version number.
    Existing COMMITTED versions are never touched (immutable history).

    Commit protocol (r05 ADVICE — concurrent-writer safe): the data is
    first written into a writer-private staging directory
    (``_staging-<uuid>``, invisible to ``list_versions`` and to Hadoop
    globbing), then atomically ``os.rename``d onto the next free ``v=N``
    slot. Two concurrent writers that race for the same N cannot corrupt
    each other: POSIX rename onto an existing non-empty directory fails,
    so the loser recomputes the (now advanced) latest version and retries
    on the next slot.

    The commit path is CREATE-ONLY: it never deletes anything under
    ``table_dir``, so no delete can race a concurrent writer's rename
    (the r06 TOCTOU: check-then-rmtree could land AFTER another writer
    committed onto the same slot and silently destroy it). A garbage
    ``v=N`` left by a pre-protocol crashed writer simply burns that slot
    number — the next version is ``max(all v=N dirs, committed or not)
    + 1``, committed history may have gaps, and :func:`vacuum` sweeps
    the stale uncommitted directory under its TTL."""
    import shutil
    import uuid

    os.makedirs(table_dir, exist_ok=True)
    staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("errorifexists").parquet(staging)
    try:
        for _ in range(max_attempts):
            slots = [
                int(m.group(1))
                for m in (_V_RE.match(n) for n in os.listdir(table_dir))
                if m
            ]
            v = (max(slots) + 1) if slots else 1
            target = os.path.join(table_dir, f"v={v}")
            try:
                os.rename(staging, target)
                return v
            except OSError:
                if not os.path.isdir(staging):
                    # Our staging dir is GONE — not a slot race. The
                    # realistic cause is a concurrent vacuum() whose
                    # staging_ttl_sec undercut this write's duration
                    # (r06 advice: surface this case instead of looping
                    # into a misleading 'writer storm' error).
                    raise RuntimeError(
                        f"write_version: staging dir {staging} disappeared "
                        "mid-commit — most likely swept by a concurrent "
                        "vacuum(staging_ttl_sec=...) shorter than this "
                        "write's duration; raise the TTL above the longest "
                        "expected write"
                    )
                # Lost the race for slot N — a concurrent writer committed
                # it between the listing and rename. Recompute and retry.
                continue
        raise RuntimeError(
            f"write_version: could not claim a version slot under "
            f"{table_dir} after {max_attempts} attempts (writer storm?)"
        )
    finally:
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (time travel) or the latest when ``version``
    is None. Raises on an uncommitted/unknown version."""
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not committed under {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def table_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """(version, n_files, n_bytes) per committed version — driver-side
    file-listing metadata only, no data read."""
    rows = []
    for v in list_versions(table_dir):
        d = os.path.join(table_dir, f"v={v}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        nbytes = sum(os.path.getsize(os.path.join(d, f)) for f in files)
        rows.append((v, len(files), nbytes))
    from ..session import local_rows_df

    return local_rows_df(
        spark, rows, "version int, n_files int, n_bytes long"
    )


def diff_versions(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    keys: list[str],
) -> DataFrame:
    """I/U/D changeset between two committed versions — time travel
    composed with the CDC operator (one full-outer hash join carrying
    (key, row-hash), see operators/cdc.py)."""
    from ..operators.cdc import snapshot_diff

    return snapshot_diff(
        read_version(spark, table_dir, v_old),
        read_version(spark, table_dir, v_new),
        keys,
    )


def vacuum(
    table_dir: str, keep_last: int = 2, staging_ttl_sec: float = 86400.0
) -> list[int]:
    """Drop all but the newest ``keep_last`` committed versions (history
    retention). Returns the versions removed. Readers pinned to a dropped
    version fail loudly on their next read — the retention contract every
    table format documents. Also sweeps crashed-writer debris once it is
    older than ``staging_ttl_sec`` (default 24 h — comfortably past any
    live write's duration, the same retention-vs-in-flight trade Delta's
    VACUUM documents): ``_staging-*`` directories, and uncommitted
    ``v=N`` directories (no ``_SUCCESS``) — under the staging protocol a
    ``v=N`` appears only via atomic rename of a fully-written staging
    dir, so an uncommitted one is pre-protocol garbage whose slot
    ``write_version`` deliberately skips rather than reclaims.

    Staleness is judged by the NEWEST mtime inside the directory (its own
    mtime included), not the directory's alone (r06 advice): a long
    parquet write touches the dir's mtime only on file CREATION, so a
    legitimately long-running write whose last file opened early could
    look idle by dir-mtime and be swept mid-write. Any file still being
    appended keeps the sweep at bay; the swept-while-writing case is also
    surfaced explicitly in ``write_version``'s error path."""
    import shutil
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(table_dir)
    drop = versions[:-keep_last]
    for v in drop:
        # ignore_errors: a concurrent vacuum may have removed it already
        shutil.rmtree(os.path.join(table_dir, f"v={v}"), ignore_errors=True)

    def _newest_mtime(root: str) -> float:
        newest = os.path.getmtime(root)
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, f))
                    )
                except OSError:
                    continue  # file vanished under a concurrent writer
        return newest

    if os.path.isdir(table_dir):
        now = time.time()
        for name in os.listdir(table_dir):
            p = os.path.join(table_dir, name)
            try:
                if not os.path.isdir(p) or now - _newest_mtime(p) <= staging_ttl_sec:
                    continue
            except OSError:
                # a concurrent vacuum/writer removed it between listdir and
                # stat — nothing left to sweep
                continue
            is_stale_staging = name.startswith("_staging-")
            is_stale_uncommitted = _V_RE.match(name) and not os.path.exists(
                os.path.join(p, "_SUCCESS")
            )
            if is_stale_staging or is_stale_uncommitted:
                shutil.rmtree(p, ignore_errors=True)
    return drop


def compact_version(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE for versioned tables: rewrite the LATEST version's data
    into a new version with files sized toward ``target_file_bytes``
    (sources/io.py::compact_small_files sizing — metadata probe +
    shuffle-free coalesce). Readers keep snapshot isolation throughout:
    the fragmented version stays readable until vacuumed, and the
    compacted data only becomes latest when its ``_SUCCESS`` lands."""
    import math

    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    src = os.path.join(table_dir, f"v={versions[-1]}")
    files = [f for f in os.listdir(src) if f.endswith(".parquet")]
    total = sum(os.path.getsize(os.path.join(src, f)) for f in files)
    n_files = max(1, math.ceil(total / target_file_bytes))
    return write_version(spark.read.parquet(src).coalesce(n_files), table_dir)

"""Lake sinks: the events table contract and state-table maintenance.

The reference lands events as Iceberg/Parquet on R2 via Cloudflare
Pipelines (/root/reference/src/pipeline.rs:57-143, README.md:8-10) and
delegates maintenance to the platform. Here the engine owns the sink:

- `append_events`: date-partitioned append of the 21-column event frame,
  clustered within partitions by (team_id, distinct_id) so per-person
  scans and downstream joins hit few row groups. At 100 TB this layout is
  the difference between partition-pruned scans of a day and full-table
  scans; the partition column derives from `created_at` exactly like an
  Iceberg `days(created_at)` transform.
- `upsert_table`: MERGE-equivalent keyed upsert for the persons/groups
  dimension tables — new snapshot wins per key, written as a new version
  behind a _LATEST pointer (same commit protocol as streaming state;
  readers never observe partial writes). With an Iceberg catalog this
  whole function is `MERGE INTO t USING s ON ... WHEN MATCHED UPDATE *`;
  the version-pointer dance is the filesystem stand-in for Iceberg's
  atomic snapshot commit, kept because this container ships no Iceberg
  runtime jars.
- `compact_events`: bin-packing compaction — rewrites partitions whose
  file population is dominated by small files into ~target-size files
  (the operational job Iceberg calls rewrite_data_files). Streaming
  appends produce a file per micro-batch per partition; compaction keeps
  scan task counts bounded.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


# Test-only hook: called (if set) between writing the pointer tmp file and
# the pre-swing fence, letting tests deterministically simulate a holder
# that pauses exactly where the stale-break race bites.
_TEST_PAUSE = None


class CommitConflict(RuntimeError):
    """Another writer committed since this writer's merge base was read.

    The Iceberg-style optimistic-concurrency signal: the caller must
    re-read the table and redo its merge (upsert_table does this
    automatically)."""


def append_events(events: DataFrame, events_dir: str) -> None:
    """Date-partitioned, cluster-sorted append of event rows."""
    (
        events.withColumn("event_date", F.to_date("created_at"))
        .repartition("event_date")
        .sortWithinPartitions("team_id", "distinct_id", "created_at")
        .write.mode("append")
        .partitionBy("event_date")
        .parquet(events_dir)
    )


def read_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """Read the events table in either on-disk layout — flat
    `event_date=...` from batch appends, `batch=N/event_date=...` from
    the streaming sink's replay-scoped overwrites — or a mix of both
    (a warehouse that predates the streaming layout and was then
    upgraded). Plain `spark.read.parquet(dir)` fails partition discovery
    on the mixed case ("conflicting directory structures"), so each
    scheme is discovered with an explicit basePath and unioned; the
    `batch` bookkeeping partition is dropped so every layout presents
    the same schema."""
    entries = os.listdir(events_dir) if os.path.isdir(events_dir) else []
    batch_dirs = sorted(
        os.path.join(events_dir, d)
        for d in entries
        if d.startswith("batch=") and os.path.isdir(os.path.join(events_dir, d))
    )
    flat_dirs = sorted(
        os.path.join(events_dir, d)
        for d in entries
        if d.startswith("event_date=") and os.path.isdir(os.path.join(events_dir, d))
    )
    if not batch_dirs:
        return spark.read.parquet(events_dir)
    batched = (
        spark.read.option("basePath", events_dir).parquet(*batch_dirs).drop("batch")
    )
    if not flat_dirs:
        return batched
    flat = spark.read.option("basePath", events_dir).parquet(*flat_dirs)
    return flat.unionByName(batched)


# ---------------------------------------------------------------------------
# versioned table commits (the no-Iceberg atomic-snapshot stand-in)
# ---------------------------------------------------------------------------


def _latest_version(root: str) -> int | None:
    pointer = os.path.join(root, "_LATEST")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return int(fh.read().strip())


def read_table(
    spark: SparkSession, root: str, schema=None, version: int | None = None
) -> DataFrame | None:
    """Read the latest committed version, or time-travel to `version`
    (every committed version stays on disk until expired — the Iceberg
    snapshot-read equivalent)."""
    if version is None:
        version = _latest_version(root)
    if version is None:
        return None
    path = os.path.join(root, f"v={version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {version} of {root} does not exist")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def expire_versions(root: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` versions (snapshot expiration).
    Never touches the current version; returns expired version numbers."""
    import shutil

    latest = _latest_version(root)
    if latest is None:
        return []
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("v=") and os.path.isdir(os.path.join(root, d))
    )
    to_drop = [v for v in versions[:-keep_last] if v != latest]
    for v in to_drop:
        shutil.rmtree(os.path.join(root, f"v={v}"))
    return to_drop


def _claim_version(root: str, start: int) -> int:
    """Claim an exclusive version directory via atomic mkdir (POSIX:
    mkdir fails-if-exists atomically). Two concurrent writers can never
    claim the same version, so in-flight data files are never shared."""
    os.makedirs(root, exist_ok=True)
    v = start
    while True:
        try:
            os.mkdir(os.path.join(root, f"v={v}"))
            return v
        except FileExistsError:
            v += 1


@contextmanager
def _commit_lock(root: str, timeout: float = 60.0, stale_after: float = 30.0):
    """Short mutual-exclusion window around the pointer swing only (the
    parquet write happens outside, in the writer's claimed directory).
    O_CREAT|O_EXCL is the POSIX analogue of an object store's conditional
    PUT (If-None-Match: *) — see CATALOG.md for the R2/S3 mapping.

    Stale-lock recovery: the critical section is strictly one pointer
    read + one rename (no directory rewrites happen under the lock — see
    _commit_version), so a lock file older than `stale_after` can only
    belong to a writer that died between open and unlink (OOM-kill, node
    loss). Waiters break such locks instead of wedging every future
    commit to the table. Breaking is safe against the two races a naive
    check-then-unlink has:

    - two waiters both passing the age check: the break is an atomic
      os.rename to a waiter-unique tombstone name, so exactly one breaker
      wins; the loser's rename raises FileNotFoundError and it re-loops.
      The slower breaker can never unlink a FRESH lock the faster one's
      successor just created, because it never calls unlink on the live
      path at all.
    - a live-but-paused holder being broken: the holder's release first
      verifies the path still names ITS lock (os.fstat(fd) inode vs
      os.stat(path) inode) and leaves a successor's fresh lock alone."""
    path = os.path.join(root, "_COMMIT.lock")
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break  # acquired
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(path)
                if age > stale_after:
                    tomb = f"{path}.broken.{os.getpid()}.{time.monotonic_ns()}"
                    try:
                        os.rename(path, tomb)  # atomic: one breaker wins
                        os.unlink(tomb)
                    except FileNotFoundError:
                        pass  # lost the break race; re-check the live path
                    continue
            except FileNotFoundError:
                continue  # holder released (or another waiter broke it)
            if time.monotonic() > deadline:
                raise TimeoutError(f"commit lock on {root} not released")
            time.sleep(0.02)

    def still_held() -> bool:
        """Fencing check: does the live lock path still name OUR lock?
        False once a waiter declared us stale and broke it — the signal
        that a successor may have committed and we must abort rather
        than swing the pointer over their commit.

        RESIDUAL WINDOW (r7 ADVICE — irreducible with mtime-based stale
        breaking): a holder that passes this check and the pointer
        re-check, then pauses for the handful of instructions before its
        os.replace, can still swing the pointer over a successor's
        commit. The fence narrows the race from the whole tmp-file write
        to those few instructions; closing it outright needs a
        compare-and-swap the filesystem doesn't offer. Mitigation:
        `stale_after` (30 s) must stay comfortably above any worst-case
        scheduler/GC pause so a LIVE holder is never declared stale in
        the first place. On a real object store this maps to a
        conditional PUT (If-Match on the pointer etag), which closes the
        race properly — see CATALOG.md."""
        try:
            return os.fstat(fd).st_ino == os.stat(path).st_ino
        except FileNotFoundError:
            return False

    try:
        yield still_held
    finally:
        try:
            if os.fstat(fd).st_ino == os.stat(path).st_ino:
                os.unlink(path)
            # else: a breaker declared us dead and a successor holds a
            # fresh lock — removing it would admit a second holder.
        except FileNotFoundError:
            pass  # a waiter mistook a long pause for death and broke it
        finally:
            os.close(fd)


def _commit_version(df: DataFrame, root: str, base_version: int | None) -> int:
    """Write df as a new claimed version, then atomically swing _LATEST —
    iff the table is still at `base_version` (the version the caller's
    merge was computed against). Otherwise the claimed directory is
    removed and CommitConflict raised: committing would silently drop the
    concurrent writer's rows (lost update). Readers only ever follow the
    pointer, which moves via rename — they never observe partial data."""
    version = _claim_version(root, (base_version or 0) + 1)
    df.write.mode("overwrite").parquet(os.path.join(root, f"v={version}"))
    conflicted = False
    with _commit_lock(root) as still_held:
        # Critical section is exactly: one pointer read + one rename.
        # Nothing slow (no directory rewrites) may run in here — the
        # stale-lock breaker's "held for milliseconds" premise depends
        # on it (see _commit_lock).
        if _latest_version(root) != base_version:
            conflicted = True
        else:
            tmp = os.path.join(root, f"_LATEST.tmp.{version}")
            with open(tmp, "w") as fh:
                fh.write(str(version))
            if _TEST_PAUSE is not None:
                _TEST_PAUSE()  # test hook: simulate a paused holder here
            # Fence (ADVICE, lake.py TOCTOU): a holder paused long
            # enough to be declared stale may have been broken, and a
            # successor may have committed on the same base. Re-check
            # BOTH lock ownership and the pointer immediately before
            # the swing; abort with conflict instead of clobbering.
            if not still_held() or _latest_version(root) != base_version:
                conflicted = True
                os.unlink(tmp)
            else:
                os.replace(tmp, os.path.join(root, "_LATEST"))
    if conflicted:
        import shutil

        # Cleanup of the orphaned claim directory happens OUTSIDE the
        # lock: it can take seconds for a large version, and holding the
        # lock through it would make live holders look stale.
        shutil.rmtree(os.path.join(root, f"v={version}"), ignore_errors=True)
        raise CommitConflict(f"{root}: table moved past base version {base_version}")
    return version


def upsert_table(
    spark: SparkSession,
    updates: DataFrame,
    root: str,
    key_cols: list[str],
    schema=None,
    max_retries: int = 10,
    allow_schema_evolution: bool = False,
) -> int:
    """MERGE-equivalent: rows from `updates` replace current rows with the
    same key; unmatched current rows survive. Returns the new version.

    Plan shape: one left-anti join (current minus updated keys) + union —
    both sides shuffle on the key, which is exactly Iceberg's merge-on-read
    write amplification; at 100 TB you'd partition the dimension tables by
    a key hash so the anti join co-partitions.

    Concurrency: optimistic, like an Iceberg commit. The merge base's
    version is validated under the commit lock; a conflicting commit
    re-reads the new current table and redoes the merge, so interleaved
    upserts serialize and neither one's rows are lost.

    `allow_schema_evolution=True` permits add-column evolution in either
    direction (Iceberg's by-name ADD COLUMN, CATALOG.md §4): surviving
    current rows take NULL for columns only the updates carry, and vice
    versa. Left off by default so an accidental column mismatch fails
    loudly instead of silently widening the table.
    """
    for _ in range(max_retries):
        base = _latest_version(root)
        current = None if base is None else read_table(spark, root, schema, base)
        if current is None:
            merged = updates
        else:
            merged = current.join(
                updates.select(*key_cols).distinct(), key_cols, "left_anti"
            ).unionByName(updates, allowMissingColumns=allow_schema_evolution)
        # materialize before overwriting the directory the plan reads from
        merged = merged.localCheckpoint(eager=True)
        try:
            return _commit_version(merged, root, base)
        except CommitConflict:
            continue
    raise CommitConflict(f"{root}: upsert lost {max_retries} commit races")


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def repair_partitions(events_dir: str) -> list[str]:
    """Restore partitions orphaned by a crash inside _swap_partition_dir's
    two-rename window: if a `.old_<base>` backup exists with NO live
    `<base>` sibling, the crash happened between the two os.replace calls
    and the backup IS the data — rename it back. Runs automatically at
    the top of every partition listing so the documented crash window
    heals on the next compaction/deletion pass instead of requiring a
    manual rename. A backup WITH a live sibling is superseded data and is
    left for _swap_partition_dir's own pre-clear. Returns repaired dirs."""
    repaired: list[str] = []
    if not os.path.isdir(events_dir):
        return repaired

    def _heal(parent: str) -> None:
        for d in sorted(os.listdir(parent)):
            if not d.startswith(".old_"):
                continue
            backup = os.path.join(parent, d)
            live = os.path.join(parent, d[len(".old_"):])
            if os.path.isdir(backup) and not os.path.exists(live):
                os.replace(backup, live)
                repaired.append(live)

    _heal(events_dir)
    for d in sorted(os.listdir(events_dir)):
        p = os.path.join(events_dir, d)
        if d.startswith("batch=") and os.path.isdir(p):
            _heal(p)
    return repaired


def _partition_dirs(events_dir: str) -> list[str]:
    """Leaf `event_date=` partition dirs in both layouts: directly under
    the table (batch appends) and nested under the streaming sink's
    `batch=N/` replay partitions — compaction bin-packs at the leaf in
    either scheme, preserving the layout (a streaming batch partition is
    never merged across batches, so a checkpoint replay's whole-batch
    overwrite stays a correct rewrite even after compaction)."""
    if not os.path.isdir(events_dir):
        return []
    repair_partitions(events_dir)
    out: list[str] = []
    for d in sorted(os.listdir(events_dir)):
        p = os.path.join(events_dir, d)
        if not os.path.isdir(p):
            continue
        if d.startswith("event_date="):
            out.append(p)
        elif d.startswith("batch="):
            out.extend(
                os.path.join(p, leaf)
                for leaf in sorted(os.listdir(p))
                if leaf.startswith("event_date=")
                and os.path.isdir(os.path.join(p, leaf))
            )
    return out


def compaction_candidates(
    events_dir: str,
    small_file_bytes: int = 8 * 1024 * 1024,
    min_small_files: int = 2,
) -> list[str]:
    """Partitions with >= min_small_files files under small_file_bytes."""
    out = []
    for pdir in _partition_dirs(events_dir):
        parquets = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        small = [p for p in parquets if os.path.getsize(p) < small_file_bytes]
        if len(small) >= min_small_files:
            out.append(pdir)
    return out


def _staged_paths(pdir: str) -> tuple[str, str]:
    """(staged, backup) sibling names for an atomic partition-dir swap.
    Both start with '.' so Spark's partition discovery skips them
    mid-swap — a `<pdir>.delete` suffix sibling WOULD still carry the
    `event_date=` prefix and a concurrent reader could double-read it
    or mis-parse the partition value.

    Why '.', not '_': measured on Spark 4.1 (tests/test_round10.py), a
    LEADING-DOT dir is skipped by partition inference even when its
    name contains '=', while a leading-underscore dir that contains '='
    (e.g. '_old_event_date=2025-03-01') FAILS the whole read with
    CONFLICTING_PARTITION_COLUMN_NAMES — the underscore convention only
    protects plain files and '='-free dir names."""
    parent, base = os.path.split(pdir.rstrip("/"))
    return (
        os.path.join(parent, ".staged_" + base),
        os.path.join(parent, ".old_" + base),
    )


def _swap_partition_dir(pdir: str, staged: str, backup: str) -> None:
    """Two-rename swap: live -> backup, staged -> live, drop backup.

    Crash windows: before the first os.replace nothing changed (staged
    is invisible to readers); between the two replaces ONLY the backup
    exists — no live dir — which is recoverable by renaming
    `.old_<base>` back to the partition name (the backup is never
    deleted until the new dir is in place; repair_partitions() performs
    that rename automatically at the top of every partition listing);
    after the second replace the new data is live and the backup drop
    is best-effort cleanup.

    A PRE-EXISTING backup dir is cleared first: os.replace cannot
    rename onto a non-empty directory, so a backup orphaned by a crash
    AFTER its swap completed (live dir present, rmtree never ran) would
    wedge every later rewrite of the same partition. Clearing is safe
    precisely because the live dir exists here — the backup is
    superseded data; the backup-only crash state (no live dir) never
    reaches this function, since repair_partitions() heals it during
    the caller's partition listing before any swap is attempted."""
    import shutil

    if os.path.isdir(backup):
        shutil.rmtree(backup)
    os.replace(pdir, backup)
    os.replace(staged, pdir)
    shutil.rmtree(backup)


def compact_events(
    spark: SparkSession,
    events_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    small_file_bytes: int = 8 * 1024 * 1024,
    min_small_files: int = 2,
) -> list[str]:
    """Rewrite small-file partitions into ~target-size files, preserving the
    cluster sort. Per-partition rewrite keeps the blast radius of a failed
    compaction to one partition. Returns the rewritten partition dirs.

    Layout note: the preserved sort is lexicographic (team, id, time) —
    perfect pruning on the leading column, none on the others. For
    tables filtered on MULTIPLE dims, the same rewrite machinery takes a
    Morton key instead: sortWithinPartitions(zorder_key2(dim_a, dim_b))
    (functions/zorder.py — hash string dims to ints first, quantize but
    do NOT hash time dims, or range filters lose locality). The per-dim
    expected-files-read win is measured on real written parquet in
    tests/test_round10.py; the ev_zorder_locality gate pins the key
    arithmetic cross-engine. Not the default because the events read
    path filters almost exclusively by the leading partition/cluster
    columns — z-order is the documented option for dashboard-style
    mixed-dim tables, the Iceberg Z-ORDER rewrite equivalent."""
    rewritten = []
    for pdir in compaction_candidates(events_dir, small_file_bytes, min_small_files):
        df = spark.read.parquet(pdir)
        total = sum(
            os.path.getsize(os.path.join(pdir, f))
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        n_files = max(1, round(total / target_file_bytes))
        staged, backup = _staged_paths(pdir)
        (
            df.repartition(n_files)
            .sortWithinPartitions("team_id", "distinct_id", "created_at")
            .write.mode("overwrite")
            .parquet(staged)
        )
        _swap_partition_dir(pdir, staged, backup)
        rewritten.append(pdir)
    return rewritten


def delete_person_rows(
    spark: SparkSession,
    events_dir: str,
    distinct_ids: list[str],
    id_col: str = "distinct_id",
) -> tuple[list[str], int]:
    """Targeted (GDPR-style) deletion: remove every event row of the
    given subjects, rewriting ONLY the leaf partitions that contain
    them — at 100 TB a deletion request must not touch the other
    99.99% of the lake.

    Two phases:
      1. probe — ONE scan of the table filtered to the subject ids,
         projecting `input_file_name()`: the id predicate pushes into
         the parquet reader, and because partitions are cluster-sorted
         with the id in the sort key, row-group min/max stats skip
         most files without reading data. The distinct file list (and
         the exact delete count) come back as a tiny driver result.
      2. rewrite — for each affected LEAF dir only: filtered rewrite
         into a staged `.`-prefixed sibling (invisible to concurrent
         readers) preserving the cluster sort, then the same two-rename
         swap as compact_events. A crash never leaves a MIX of old and
         new rows; the one window between the two renames leaves only
         the `.old_<date>` backup (no live dir), healed automatically
         by repair_partitions() on the next listing pass — see
         _swap_partition_dir. Untouched partitions keep their bytes.

    Callers deleting a PERSON (not a raw id) should first expand to
    all of the person's distinct_ids via the persons table
    (`array_contains(distinct_ids, ...)` — the S13 debug-lookup path).
    Returns (rewritten partition dirs, rows deleted).
    """
    from urllib.parse import urlparse

    # heal any crash-orphaned partition FIRST: rows hidden behind a
    # backup-only dir would otherwise be invisible to the probe scan and
    # the deletion would silently miss them
    repair_partitions(events_dir)
    ids = list(distinct_ids)
    if not ids:
        return [], 0
    pred = F.col(id_col).isin(ids)
    hits = (
        read_events(spark, events_dir)
        .where(pred)
        .select(F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return [], 0
    rows_deleted = sum(r["n"] for r in hits)
    pdirs = sorted({os.path.dirname(urlparse(r["f"]).path) for r in hits})
    keep = ~F.coalesce(pred, F.lit(False))  # null ids are never subjects
    for pdir in pdirs:
        staged, backup = _staged_paths(pdir)
        (
            spark.read.parquet(pdir)
            .where(keep)
            .sortWithinPartitions("team_id", "distinct_id", "created_at")
            .write.mode("overwrite")
            .parquet(staged)
        )
        _swap_partition_dir(pdir, staged, backup)
    return pdirs, int(rows_deleted)

"""Parquet-backed warehouse with atomic overwrite semantics.

Replaces the reference's Postgres schemas/tables (``CREATE SCHEMA IF NOT
EXISTS`` at ``public/lion_parcell_bonus_test_stg.py:269-270``,
truncate-reload at ``public/source_transaction_lion_parcel.py:50-68``).

A table is a directory of parquet files. Overwrites are atomic at the
directory level: write to ``<table>.__tmp__``, then swap. This is the
non-transactional stand-in for Postgres MERGE atomicity documented in
SURVEY.md §7 hard part 4 — on a real deployment you'd back this with a
table format (Delta/Iceberg) instead, but the engine API stays the same.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def swap_dir(tmp: str, dst: str) -> None:
    """Install ``tmp`` at ``dst`` with the crash-recoverable rename
    protocol every materializer shares (Warehouse.overwrite /
    append_batch, scd2_apply_partitioned, merge_upsert_partitioned):
    demote any existing ``dst`` to a ``.__old__<uuid8>`` sibling,
    rename ``tmp`` in, drop the old copy. ONE source of truth — the
    ``__tmp__``/``__old__`` suffix grammar is what
    operators/maintenance.py's orphan recovery parses, so changing the
    protocol here is the only place it can change. Same-filesystem
    renames; a crash leaves either a ``__tmp__`` (unfinished, discard)
    or ``__old__`` (already superseded) orphan for recovery."""
    old = f"{dst}.__old__{uuid.uuid4().hex[:8]}"
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.exists(old):
        shutil.rmtree(old)


class Warehouse:
    """A directory of databases, each a directory of parquet tables.

    Pass a :class:`~lion_parcel_etl_spark.metrics.RunMetrics` as
    ``metrics`` to get structured rows/bytes per write (the reference's
    ``MERGE 20`` / ``INSERT 0 13`` log lines as data); collection reads
    parquet footers only — no recompute of the written DataFrame.
    """

    def __init__(self, root: str, metrics=None):
        self.root = root
        self.metrics = metrics
        os.makedirs(root, exist_ok=True)

    def create_database(self, name: str) -> None:
        os.makedirs(os.path.join(self.root, name), exist_ok=True)

    def table_path(self, name: str) -> str:
        """``db.table`` or bare ``table`` (default db)."""
        parts = name.split(".")
        if len(parts) == 1:
            parts = ["default", parts[0]]
        return os.path.join(self.root, *parts)

    def exists(self, name: str) -> bool:
        """True when the table directory holds any parquet data —
        including under partition subdirectories (day=…, __batch_id=…),
        which a top-level-only listing would miss. os.walk short-
        circuits on the first data file, so this is O(dirs-until-hit),
        not a full-tree scan."""
        path = self.table_path(name)
        if not os.path.isdir(path):
            return False
        for _dirpath, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") or f == "_SUCCESS" for f in files):
                return True
        return False

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))

    def overwrite(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
    ) -> None:
        """Atomic full-replace (reference K1/K2 truncate-reload semantics).

        Writes to a temp dir then swaps, so a concurrent reader sees
        either the old or the new table, never a partial write.
        """
        final = self.table_path(name)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.__tmp__{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        swap_dir(tmp, final)
        if self.metrics is not None:
            self.metrics.record_write(name, final)

    def append(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
    ) -> None:
        """Append-only write (no swap): the shape for accretive tables
        — signature stores, history partitions, pair logs. Not atomic
        against concurrent readers the way overwrite is; a reader may
        see a partially-moved batch's files (back with a table format
        for snapshot isolation).

        The batch lands in a private tmp dir and its files are RENAMED
        into the table (uuid-prefixed names; same-filesystem renames),
        so both the write and the metrics attribution are
        O(files-just-written) — never a walk of the accreted table,
        which for a long-lived store would grow with table age."""
        final = self.table_path(name)
        os.makedirs(final, exist_ok=True)
        tmp = f"{final}.__tmp__{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        moved: list[str] = []
        for dirpath, _dirs, files in os.walk(tmp):
            rel = os.path.relpath(dirpath, tmp)
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                dstdir = final if rel == "." else os.path.join(final, rel)
                os.makedirs(dstdir, exist_ok=True)
                dst = os.path.join(dstdir, f"{uuid.uuid4().hex[:8]}-{f}")
                os.rename(os.path.join(dirpath, f), dst)
                moved.append(dst)
        shutil.rmtree(tmp, ignore_errors=True)
        if self.metrics is not None:
            self.metrics.record_files(name, sorted(moved))

    def append_batch(self, df: DataFrame, name: str, batch_id: int | str) -> None:
        """Idempotent append for checkpointed micro-batch writers: the
        batch lands in a ``__batch_id=<id>`` partition directory that is
        swapped atomically, so a checkpoint REPLAY of the same batch
        rewrites its own directory instead of duplicating rows — the
        plain-parquet stand-in for a table format's transactional
        append. Readers see ``__batch_id`` as a partition column; select
        explicit columns (or drop it) downstream.

        The scratch dirs live OUTSIDE the readable table directory
        (siblings of the TABLE, not of the batch dir): a name like
        ``__batch_id=N.__tmp__x`` inside the table contains ``=``, so
        partition discovery would read it as a real partition and a
        crashed or in-flight replay would double-count the batch for
        every concurrent reader. Out-of-tree scratch keeps readers on
        committed batches only; crash windows recover by checkpoint
        REPLAY of the uncommitted batch (the stream's contract), and
        vacuum removes the stale scratch by the shared suffix grammar.
        """
        table = self.table_path(name)
        final = os.path.join(table, f"__batch_id={batch_id}")
        os.makedirs(table, exist_ok=True)
        tmp = f"{table}.__tmp__{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{table}.__old__{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)
        if self.metrics is not None:
            self.metrics.record_write(name, final)

    def drop(self, name: str) -> None:
        path = self.table_path(name)
        if os.path.exists(path):
            shutil.rmtree(path)


class VersionedTable:
    """Snapshot-versioned table: immutable version directories plus an
    atomically-flipped ``_current`` pointer file — the plain-parquet
    stand-in for a table format's commit log (Delta/Iceberg style,
    public design), one step up from ``Warehouse.overwrite``'s
    directory swap:

    - **commit** writes a brand-new ``_versions/v<N>`` directory and
      only then flips the pointer (``os.replace`` — atomic on POSIX).
      A crash before the flip leaves an orphan data dir and an intact
      previous version; readers can never observe a partial commit.
    - **read(version=…)** is table-level time travel; concurrent
      readers of an old snapshot are unaffected by later commits
      because version directories are never mutated.
    - **rollback** is a pointer flip — O(1) undo, no data movement.
    - **vacuum** deletes unreferenced version dirs beyond
      ``keep_last`` (and orphans from crashed commits), bounding
      storage like a table format's retention policy.

    Single-writer, like the rest of the Warehouse; a real deployment
    swaps this class for an actual table format behind the same calls.
    """

    POINTER = "_current"
    VDIR = "_versions"

    def __init__(self, wh: Warehouse, name: str):
        self.wh = wh
        self.path = wh.table_path(name)
        self.name = name

    def _vpath(self, version: int) -> str:
        return os.path.join(self.path, self.VDIR, f"v{version:08d}")

    def versions(self) -> list[int]:
        """COMMITTED versions only: a directory counts when Spark's
        ``_SUCCESS`` marker exists, so a commit that crashed mid-write
        (no marker) is invisible to versions()/read()/rollback() — the
        guarantee that readers never observe a partial commit holds
        even for explicitly-addressed versions."""
        vdir = os.path.join(self.path, self.VDIR)
        if not os.path.isdir(vdir):
            return []
        out = []
        for d in os.listdir(vdir):
            if (
                d.startswith("v")
                and d[1:].isdigit()
                and os.path.isfile(os.path.join(vdir, d, "_SUCCESS"))
            ):
                out.append(int(d[1:]))
        return sorted(out)

    def _all_version_dirs(self) -> list[int]:
        """Every v-numbered directory, committed or orphaned — the
        numbering domain for the next commit and vacuum's sweep set."""
        vdir = os.path.join(self.path, self.VDIR)
        if not os.path.isdir(vdir):
            return []
        return sorted(
            int(d[1:])
            for d in os.listdir(vdir)
            if d.startswith("v") and d[1:].isdigit()
        )

    def current_version(self) -> int | None:
        ptr = os.path.join(self.path, self.POINTER)
        if not os.path.isfile(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip()[1:])

    def commit(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        # number past orphans too, so a crashed v<N> slot is never reused
        version = (self._all_version_dirs() or [0])[-1] + 1
        target = self._vpath(version)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        self._flip(version)
        if self.wh.metrics is not None:
            self.wh.metrics.record_write(self.name, target)
        return version

    def _flip(self, version: int) -> None:
        ptr = os.path.join(self.path, self.POINTER)
        tmp = f"{ptr}.__tmp__{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(f"v{version:08d}")
        os.replace(tmp, ptr)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"{self.name}: no committed version")
        if version not in self.versions():
            raise FileNotFoundError(f"{self.name}: version {version} not committed")
        return spark.read.parquet(self._vpath(version))

    def rollback(self, version: int) -> None:
        if version not in self.versions():
            raise FileNotFoundError(f"{self.name}: version {version} not committed")
        self._flip(version)

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Drop version dirs older than the newest ``keep_last`` —
        including orphans from crashed commits — but never the current
        pointer's target (a rolled-back current survives even when
        old). Returns removed paths."""
        cur = self.current_version()
        vs = self.versions()
        keep = set(vs[-keep_last:]) if keep_last > 0 else set()
        if cur is not None:
            keep.add(cur)
        removed = []
        for v in self._all_version_dirs():
            if v not in keep:
                shutil.rmtree(self._vpath(v))
                removed.append(self._vpath(v))
        return removed


def write_csv(df: DataFrame, path: str) -> None:
    """Single-file CSV with header (reference K4 golden/audit outputs,
    ``public/lion_parcell_bonus_test_stg.py:313-314``). coalesce(1) is
    deliberate and ONLY for small golden outputs — never for data-scale
    tables, where it would serialize the job onto one task."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)

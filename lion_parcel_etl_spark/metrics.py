"""Structured run metrics: rows/bytes/files written per table per task.

The reference logs row counts from Postgres command tags — ``MERGE 20``,
``INSERT 0 13`` (reference ``dags/retail_hourly_etl.py`` task logs) —
and sizes via ``df.info(memory_usage='deep')`` (reference
``public/source_transaction_lion_parcel.py:79-83``). The engine analog
records, for every warehouse write, the written table's row count and
on-disk bytes as structured data the runner attaches to its per-task
report.

Counting is free of recompute: rows come from the parquet FOOTERS of
the files just written (pyarrow metadata read — no second action over
the DataFrame, which would re-execute the whole plan), bytes from file
sizes. Both are O(files) local metadata operations, the same cost as
the directory swap that precedes them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class WriteMetrics:
    table: str
    rows: int
    bytes: int
    files: int

    def as_dict(self) -> dict:
        return {
            "table": self.table,
            "rows": self.rows,
            "bytes": self.bytes,
            "files": self.files,
        }


def scan_parquet_dir(path: str) -> tuple[int, int, int]:
    """(rows, bytes, files) for every parquet file under ``path``,
    read from footers/stat — never from data pages."""
    import pyarrow.parquet as pq

    rows = size = files = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, f)
            rows += pq.ParquetFile(fp).metadata.num_rows
            size += os.path.getsize(fp)
            files += 1
    return rows, size, files


@dataclass
class RunMetrics:
    """Accumulates WriteMetrics; the runner slices the list per task."""

    writes: list[WriteMetrics] = field(default_factory=list)

    def record_write(self, table: str, path: str) -> WriteMetrics:
        rows, size, files = scan_parquet_dir(path)
        wm = WriteMetrics(table=table, rows=rows, bytes=size, files=files)
        self.writes.append(wm)
        return wm

    def record_dirs(self, table: str, paths: list[str]) -> WriteMetrics:
        """One WriteMetrics over several directories — the partitioned
        materializers' shape, where a run swaps/appends a subset of
        partition directories and only those count as 'written'."""
        rows = size = files = 0
        for p in paths:
            r, s, f = scan_parquet_dir(p)
            rows, size, files = rows + r, size + s, files + f
        wm = WriteMetrics(table=table, rows=rows, bytes=size, files=files)
        self.writes.append(wm)
        return wm

    def record_files(self, table: str, paths: list[str]) -> WriteMetrics:
        """One WriteMetrics over an explicit file list — the append
        shape, where only the files a batch just added count."""
        import pyarrow.parquet as pq

        rows = size = 0
        for fp in paths:
            rows += pq.ParquetFile(fp).metadata.num_rows
            size += os.path.getsize(fp)
        wm = WriteMetrics(table=table, rows=rows, bytes=size, files=len(paths))
        self.writes.append(wm)
        return wm

    def mark(self) -> int:
        """Position marker; writes[mark:] are the ones since."""
        return len(self.writes)

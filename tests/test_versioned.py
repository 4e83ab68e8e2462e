"""VersionedTable (catalog.py): pointer-commit snapshots — time
travel, O(1) rollback, retention vacuum, and crash-orphan safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lion_parcel_etl_spark.catalog import VersionedTable, Warehouse


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v string")


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(Warehouse(str(tmp_path / "wh")), "default.t")


def test_commit_read_time_travel(spark, vt):
    assert vt.current_version() is None
    v1 = vt.commit(_df(spark, ["a", "b"]))
    v2 = vt.commit(_df(spark, ["c"]))
    assert (v1, v2) == (1, 2)
    assert vt.current_version() == 2
    assert vt.read(spark).count() == 1
    assert sorted(r.v for r in vt.read(spark, version=1).collect()) == ["a", "b"]


def test_rollback_is_pointer_flip_and_next_commit_advances(spark, vt):
    vt.commit(_df(spark, ["a"]))
    vt.commit(_df(spark, ["b"]))
    vt.rollback(1)
    assert vt.current_version() == 1
    assert [r.v for r in vt.read(spark).collect()] == ["a"]
    v3 = vt.commit(_df(spark, ["c"]))
    assert v3 == 3  # never clobbers the rolled-over v2
    assert sorted(vt.versions()) == [1, 2, 3]


def test_vacuum_keeps_current_even_when_old(spark, vt):
    for s in ["a", "b", "c", "d"]:
        vt.commit(_df(spark, [s]))
    vt.rollback(1)
    removed = vt.vacuum(keep_last=1)
    # v1 survives (current), v4 survives (keep_last), v2/v3 go
    assert sorted(vt.versions()) == [1, 4]
    assert len(removed) == 2
    assert [r.v for r in vt.read(spark).collect()] == ["a"]


def test_crashed_commit_orphan_is_invisible_then_vacuumed(spark, vt):
    vt.commit(_df(spark, ["a"]))
    # simulate a crash MID-WRITE: data files exist, no _SUCCESS marker
    orphan = vt._vpath(2)
    os.makedirs(orphan)
    _df(spark, ["partial"]).write.mode("overwrite").parquet(orphan)
    os.remove(os.path.join(orphan, "_SUCCESS"))
    assert vt.current_version() == 1  # reader still sees v1
    assert [r.v for r in vt.read(spark).collect()] == ["a"]
    # the torn directory is not a version: invisible to listing,
    # unreadable, un-rollback-able
    assert vt.versions() == [1]
    with pytest.raises(FileNotFoundError):
        vt.read(spark, version=2)
    with pytest.raises(FileNotFoundError):
        vt.rollback(2)
    # the NEXT commit does not reuse the orphan's slot: it writes v3
    v3 = vt.commit(_df(spark, ["b"]))
    assert v3 == 3 and vt.current_version() == 3
    removed = vt.vacuum(keep_last=1)
    assert orphan in removed
    assert vt.read(spark, version=3).count() == 1


def test_read_missing_version_raises(spark, vt):
    vt.commit(_df(spark, ["a"]))
    with pytest.raises(FileNotFoundError):
        vt.read(spark, version=9)
    with pytest.raises(FileNotFoundError):
        vt.rollback(9)

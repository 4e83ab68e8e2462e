"""table_diff: CDC changelog between snapshots — all three change
classes, NOCHANGE omission, null-safe comparison, and column
auto-discovery."""

from __future__ import annotations

from lion_parcel_etl_spark.operators.diff import table_diff


def test_table_diff_classifies_all_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "id long, s string, v long",
    )
    rows = {r.id: r for r in table_diff(old, new, ["id"]).collect()}
    # 1 unchanged -> omitted; 4 null==null is no change -> omitted
    assert set(rows) == {2, 3, 5}
    assert rows[2].change_type == "UPDATE" and rows[2].old_s == "b" and rows[2].new_s == "B"
    assert rows[3].change_type == "DELETE" and rows[3].new_s is None and rows[3].old_v == 30
    assert rows[5].change_type == "INSERT" and rows[5].old_s is None and rows[5].new_v == 50


def test_table_diff_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
    new = spark.createDataFrame([(1, None), (2, "y")], "id long, s string")
    rows = {r.id: r for r in table_diff(old, new, ["id"]).collect()}
    assert rows[1].change_type == "UPDATE" and rows[1].new_s is None
    assert rows[2].change_type == "UPDATE" and rows[2].old_s is None


def test_table_diff_compare_subset_and_extra_columns(spark):
    # columns only on one side are ignored by auto-discovery; an
    # explicit compare list restricts further
    old = spark.createDataFrame([(1, "a", 1)], "id long, s string, only_old long")
    new = spark.createDataFrame([(1, "b", 9)], "id long, s string, only_new long")
    d = table_diff(old, new, ["id"])
    assert set(d.columns) == {"id", "change_type", "old_s", "new_s"}
    assert d.collect()[0].change_type == "UPDATE"
    assert table_diff(old, new, ["id"], compare=[]).count() == 0


def test_apply_changelog_roundtrip(spark):
    """diff → apply reconstructs the new snapshot exactly."""
    from lion_parcel_etl_spark.operators.diff import apply_changelog

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "b", 20), (4, "d", 40), (5, None, 50)],
        "id long, s string, v long",
    )
    rebuilt = apply_changelog(old, table_diff(old, new, ["id"]), ["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_apply_changelog_roundtrip_property(spark):
    """Randomized snapshots: the roundtrip holds for any overlap
    pattern of keys and null/value churn."""
    import random

    from lion_parcel_etl_spark.operators.diff import apply_changelog

    rng = random.Random(7)
    for _ in range(5):
        mk = lambda: [
            (k, rng.choice(["x", "y", None]), rng.randint(0, 3))
            for k in rng.sample(range(12), rng.randint(0, 10))
        ]
        old = spark.createDataFrame(mk(), "id long, s string, v long")
        new = spark.createDataFrame(mk(), "id long, s string, v long")
        rebuilt = apply_changelog(old, table_diff(old, new, ["id"]), ["id"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, new.collect())
        )


def test_table_diff_null_keys_are_real_keys(spark):
    """A NULL key value matches null-safely across snapshots: same-key
    rows with changed values are UPDATEs, and the roundtrip holds."""
    from lion_parcel_etl_spark.operators.diff import apply_changelog

    old = spark.createDataFrame([(None, "a"), (1, "x")], "id long, s string")
    new = spark.createDataFrame([(None, "b"), (1, "x")], "id long, s string")
    d = table_diff(old, new, ["id"]).collect()
    assert len(d) == 1
    assert d[0].id is None and d[0].change_type == "UPDATE"
    assert d[0].old_s == "a" and d[0].new_s == "b"
    rebuilt = apply_changelog(old, table_diff(old, new, ["id"]), ["id"])
    assert sorted(map(tuple, rebuilt.collect()), key=str) == sorted(
        map(tuple, new.collect()), key=str
    )

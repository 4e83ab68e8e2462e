"""Sketch aggregates: accuracy vs exact answers, and the mergeability
property that makes them the 100 TB path (daily sketches union to the
same estimate as one global sketch)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    hll_merge,
    hll_rollup,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def test_approx_distinct_within_rsd(events):
    exact = events.select(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    approx = events.select(approx_distinct("user_id", 0.02).alias("n")).collect()[0]["n"]
    assert abs(approx - exact) / exact < 0.05


def test_approx_quantiles_close_to_exact(events):
    exact = events.select(
        F.expr("percentile(value, array(0.5, 0.95))").alias("q")
    ).collect()[0]["q"]
    approx = events.select(approx_quantiles("value", [0.5, 0.95]).alias("q")).collect()[
        0
    ]["q"]
    for e, a in zip(exact, approx):
        assert abs(a - e) <= max(1e-9, 0.02 * abs(e) + 0.1)


def test_hll_rollup_merges_without_rescan(events):
    # daily sketches …
    daily = hll_rollup(
        events.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    # … union to a global estimate
    merged = hll_merge(daily, []).collect()[0]["approx_distinct"]
    exact = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(merged - exact) / exact < 0.05
    # and the union equals sketching the whole corpus directly
    direct = hll_merge(
        hll_rollup(events, [], "user_id").select("hll"), []
    ).collect()[0]["approx_distinct"]
    assert merged == direct


def test_frequent_items_never_misses_true_heavy_hitters(spark):
    from lion_parcel_etl_spark.operators.sketches import frequent_items
    from lion_parcel_etl_spark.plans.queries import _t
    import os

    sf = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001")
    docs = _t(spark, sf, "documents")
    from pyspark.sql import functions as F
    from lion_parcel_etl_spark.operators.dedup import tokens

    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    n_total = toks.count()
    exact = {
        r.token: r.n
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cap = 500
    n_parts = toks.rdd.getNumPartitions()
    approx = {r.token: r.est for r in frequent_items(toks, "token", k=50, partition_capacity=cap).collect()}
    # underestimates only, bounded by the summed per-partition error
    err_bound = n_parts * (n_total / cap)
    for t, est in approx.items():
        assert est <= exact[t]
        assert exact[t] - est <= err_bound
    # every token whose true count clears the error band must be found
    for t, n in exact.items():
        if n > err_bound and len(approx) >= 50:
            top50_floor = min(approx.values())
            if n - err_bound > top50_floor:
                assert t in approx, (t, n, err_bound)


def test_frequent_items_exact_matches_plain_groupby(spark):
    """The two-pass MG+recount answer must equal the exact GROUP
    BY/HAVING answer regardless of partition layout — including an
    adversarial many-partition layout where the raw sketch's counter
    contents would differ."""
    import os

    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.operators.dedup import tokens
    from lion_parcel_etl_spark.operators.sketches import frequent_items_exact
    from lion_parcel_etl_spark.plans.queries import _t

    sf = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    docs = _t(spark, sf, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    phi = 0.002
    n_total = toks.count()
    import math

    thr = math.ceil(phi * n_total)
    expected = sorted(
        (r.token, r.n)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= thr)
        .collect()
    )
    for layout in (toks, toks.repartition(16)):
        got = sorted(
            (r.token, r.cnt)
            for r in frequent_items_exact(
                layout, "token", phi=phi, partition_capacity=600
            ).collect()
        )
        assert got == expected


def test_frequent_items_exact_rejects_undersized_capacity(spark):
    import pytest as _pytest

    from lion_parcel_etl_spark.operators.sketches import frequent_items_exact

    df = spark.range(10).selectExpr("CAST(id AS STRING) AS v")
    with _pytest.raises(ValueError, match="partition_capacity"):
        frequent_items_exact(df, "v", phi=0.001, partition_capacity=500)


def test_frequent_items_topk_exact_partition_independent(spark):
    """The recounted top-k must equal the plain exact top-k and be
    byte-identical across adversarial partition layouts — the property
    that earns frequent_tokens its DuckDB oracle."""
    import os

    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.operators.dedup import tokens
    from lion_parcel_etl_spark.operators.sketches import frequent_items_topk_exact
    from lion_parcel_etl_spark.plans.queries import _t

    sf = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    docs = _t(spark, sf, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    k = 20
    expected = [
        (r.token, r.n)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
        .collect()
    ]
    for layout in (toks, toks.repartition(16), toks.repartition(1)):
        got = [
            (r.token, r.cnt)
            for r in frequent_items_topk_exact(
                layout, "token", k=k, partition_capacity=600
            ).collect()
        ]
        assert got == expected


def test_frequent_items_topk_exact_guard_trips_when_unprovable(spark):
    """With capacity so small the k-th count sits inside the undercount
    bound, the in-plan assert_true must fail loudly instead of
    returning a partition-dependent answer."""
    from pyspark.errors import SparkRuntimeException

    from lion_parcel_etl_spark.operators.sketches import frequent_items_topk_exact

    # 200 distinct values once each over many partitions: capacity 1
    # per partition → bound N/2 = 100 ≥ every count (1).
    df = spark.range(200).selectExpr("CAST(id AS STRING) AS v").repartition(8)
    with pytest.raises(SparkRuntimeException, match="not provable"):
        frequent_items_topk_exact(df, "v", k=5, partition_capacity=1).collect()


def test_frequent_items_exact_total_excludes_nulls(spark):
    """N (the φ threshold base) counts the NON-NULL multiset: with
    nulls inflating N, 'b' (2 of 4 non-null = phi 0.5) would miss a
    φ=0.5 cut computed over 8 total rows (threshold 4)."""
    from lion_parcel_etl_spark.operators.sketches import frequent_items_exact

    rows = [("a",), ("a",), ("b",), ("b",)] + [(None,)] * 4
    df = spark.createDataFrame(rows, "v string").coalesce(1)
    got = sorted(
        (r.v, r.cnt)
        for r in frequent_items_exact(df, "v", phi=0.5, partition_capacity=10).collect()
    )
    assert got == [("a", 2), ("b", 2)]


def test_mg_one_step_decrement_preserves_superset_guarantee(spark):
    """Regression: a subtract-the-min batch decrement would evict 'a'
    entirely on [a, a, b] at capacity 1 and the 'exact' heavy-hitter
    answer would come back empty; textbook one-step MG leaves a with a
    positive estimate, so the candidate superset holds at the guard's
    boundary (capacity+1 = 2 > 1/phi)."""
    from lion_parcel_etl_spark.operators.sketches import frequent_items_exact

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "v string"
    ).coalesce(1)
    got = frequent_items_exact(df, "v", phi=0.6, partition_capacity=1).collect()
    assert [(r.v, r.cnt) for r in got] == [("a", 2)]


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from lion_parcel_etl_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.range(0, 60).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_hashes=3)
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    flagged = probe.filter(bloom_probe(F.col("k"), words, 3))
    got = {r["k"] for r in flagged.collect()}
    assert set(range(60)) <= got  # bloom never drops a real member
    # count-sized filter targets (1 - e^(-hn/m))^h ~ 0.9%; 3x headroom
    fp = len(got - set(range(60))) / (20000 - 60)
    assert fp < 0.03


def test_bloom_build_matches_python_reference(spark):
    """The collected words equal a row-by-row Python rebuild of the
    same md5 positions and count-derived sizing — the structure the
    oracle SQL re-derives."""
    import hashlib

    from lion_parcel_etl_spark.operators.sketches import (
        BLOOM_WORD_BITS,
        bloom_build,
        bloom_n_words,
    )

    keys = [f"key{i}" for i in range(37)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    h = 3
    words = bloom_build(df, "k", num_hashes=h)
    n_words = bloom_n_words(len(keys))
    m = n_words * BLOOM_WORD_BITS
    want = [0] * n_words
    for k in keys:
        for j in range(h):
            p = int(hashlib.md5(f"{k}bloom{j}".encode()).hexdigest()[:15], 16) % m
            want[p // BLOOM_WORD_BITS] |= 1 << (p % BLOOM_WORD_BITS)
    assert words == want


def test_bloom_probe_is_projection_only(spark):
    """Membership is a literal-array projection: the probed side's
    plan has no join and no exchange."""
    from lion_parcel_etl_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.range(0, 40).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_hashes=3)
    plan = (
        spark.range(0, 1000)
        .select(F.col("id").alias("k"))
        .filter(bloom_probe(F.col("k"), words, 3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_empty_key_set_matches_nothing(spark):
    from lion_parcel_etl_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.range(0, 0).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_hashes=3)
    assert words == [0]
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    assert probe.filter(bloom_probe(F.col("k"), words, 3)).count() == 0


# --- KMV bottom-k sketches -------------------------------------------------


def test_kmv_estimate_within_error_bound(spark):
    from lion_parcel_etl_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    sk = kmv_sketch(df, "k", ["g"], k=256)
    est = sk.select(kmv_estimate(F.col("kmv"), 256).alias("e")).collect()[0]["e"]
    # KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25


def test_kmv_small_group_is_exact(spark):
    from lion_parcel_etl_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    sk = kmv_sketch(df, "k", ["g"], k=256)
    row = sk.select(
        F.size("kmv").alias("sz"), kmv_estimate(F.col("kmv"), 256).alias("e")
    ).collect()[0]
    assert row["sz"] == 100 and row["e"] == 100.0


def test_kmv_merge_equals_sketch_of_union(spark):
    from lion_parcel_etl_spark.operators.sketches import kmv_merge, kmv_sketch

    a = spark.range(5000).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("k")
    )
    b = spark.range(3000, 9000).select(
        F.lit("b").alias("g"), F.col("id").cast("string").alias("k")
    )
    sk = kmv_sketch(a.union(b), "k", ["g"], k=128)
    merged = (
        sk.groupBy()
        .pivot("g", ["a", "b"])
        .agg(F.first("kmv"))
        .select(kmv_merge(F.col("a"), F.col("b"), 128).alias("m"))
        .collect()[0]["m"]
    )
    union_sk = kmv_sketch(
        a.union(b).select(F.lit("u").alias("g"), "k"), "k", ["g"], k=128
    ).collect()[0]["kmv"]
    assert merged == union_sk


def test_kmv_overlap_estimates_jaccard(spark):
    from lion_parcel_etl_spark.operators.sketches import kmv_overlap, kmv_sketch

    # |A|=6000, |B|=6000, |A∩B|=3000, |A∪B|=9000 → J = 1/3
    a = spark.range(6000).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("k")
    )
    b = spark.range(3000, 9000).select(
        F.lit("b").alias("g"), F.col("id").cast("string").alias("k")
    )
    sk = kmv_sketch(a.union(b), "k", ["g"], k=256)
    row = kmv_overlap(sk, "g", k=256).collect()[0]
    assert abs(row["jaccard_est"] - 1 / 3) < 0.12
    assert abs(row["union_est"] - 9000) / 9000 < 0.25
    assert abs(row["intersection_est"] - 3000) / 3000 < 0.45


def test_kmv_prefilter_output_identical(spark):
    from lion_parcel_etl_spark.operators.sketches import kmv_sketch

    df = spark.range(30000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("k"),
    )
    plain = {r["g"]: r["kmv"] for r in kmv_sketch(df, "k", ["g"], k=64).collect()}
    pre = {
        r["g"]: r["kmv"]
        for r in kmv_sketch(df, "k", ["g"], k=64, prefilter_rsd=0.05).collect()
    }
    assert plain == pre


def test_kmv_prefilter_keeps_small_groups(spark):
    from lion_parcel_etl_spark.operators.sketches import kmv_sketch

    df = spark.range(50).select(
        F.lit("tiny").alias("g"), F.col("id").cast("string").alias("k")
    )
    rows = kmv_sketch(df, "k", ["g"], k=256, prefilter_rsd=0.05).collect()
    assert len(rows) == 1 and len(rows[0]["kmv"]) == 50


def test_approx_stats_estimates_close_to_exact(spark):
    """The round-6 deterministic approx_stats (KMV distinct + md5
    row-sample percentiles) must land near the exact answers: KMV
    k=256 ⇒ ~6% standard error on distinct orders; a 1/16 sample of
    ~60k lineitem rows ⇒ small rank error on p50/p95. Tolerances are
    ~3σ. (Exactness vs the DuckDB oracle is the driver's check; this
    pins the estimator's ACCURACY, which the oracle can't see.)"""
    from lion_parcel_etl_spark.plans.queries import _t, q_approx_stats

    sf = "/root/testdata/sf0.001"
    approx = {r["l_returnflag"]: r for r in q_approx_stats(spark, sf).collect()}
    li = _t(spark, sf, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))").alias("p"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.2
        assert abs(a["approx_p50"] - e["p"][0]) / e["p"][0] < 0.15
        assert abs(a["approx_p95"] - e["p"][1]) / e["p"][1] < 0.15

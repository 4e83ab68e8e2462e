"""Approximate/sketch aggregates: the sub-linear path for 100 TB.

Exact distinct counts and exact percentiles need a shuffle of every
distinct value (or a sort per group). At 100 TB that's the difference
between a 5-minute job and an impossible one. The sketch versions are
constant memory per group, one pass, and — critically — MERGEABLE:
per-partition (or per-day) sketches union into global answers without
rescanning, which is what makes incremental rollups work (compute
today's sketch, union with the stored one).

All built on Spark's JVM-side implementations (HLL++ for
approx_count_distinct, Apache DataSketches HLL for the binary
mergeable sketches, GK summaries for approx_percentile) — no Python
in the hot path. Accuracy bounds are tested against exact answers in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.02) -> Column:
    """HLL++ distinct-count estimate with target relative error."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(col: str | Column, probs: list[float], accuracy: int = 10000) -> Column:
    """GK-summary percentile estimates; error <= 1/accuracy of rank."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )


def hll_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key mergeable HLL sketches (DataSketches binary form).

    The stored-rollup pattern: materialize this per day/partition, and
    answer any coarser grain later by ``hll_union_agg`` over the
    sketch column — no rescan of the raw data. lg_k=12 → ~1.6 KB per
    sketch, ~1.6% standard error.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def hll_merge(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Union stored sketches up to a coarser grain and estimate."""
    agg = rollup.groupBy(*keys) if keys else rollup.groupBy()
    return agg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 100,
    partition_capacity: int = 2000,
) -> DataFrame:
    """Approximate heavy hitters via distributed Misra-Gries (public
    streaming-algorithm family; SpaceSaving is the sibling): each
    partition keeps at most ``partition_capacity`` counters in one
    Arrow-batched pass, the per-partition summaries merge by summing
    (MG summaries are mergeable — Agarwal et al., "Mergeable
    Summaries", PODS 2012), and the global top-``k`` survivors emerge
    from a TakeOrderedAndProject.

    Guarantee: est ≤ true_count, and true_count - est ≤ N/capacity
    summed per partition — so with capacity ≫ k every true heavy
    hitter above the error band survives (asserted vs the exact count
    in tests/test_sketches.py). Memory is O(capacity) per task and
    O(candidates) in the merge — never O(distinct items), which is the
    whole point at 100 TB vocabularies.
    """
    partials = _mg_partials(df, col, partition_capacity)
    return (
        partials.groupBy(col)
        .agg(F.sum("est").alias("est"))
        .orderBy(F.col("est").desc(), F.col(col).asc())
        .limit(k)
    )


def _mg_partials(df: DataFrame, col: str, partition_capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries as (col, est) rows — the
    map side shared by the approximate (:func:`frequent_items`) and
    exact (:func:`frequent_items_exact`) heavy-hitter paths."""
    import pandas as pd

    out_schema = f"{col} string, est long"

    def mg(batches):
        # Textbook Misra-Gries with an O(1)-amortized decrement-all:
        # a global ``offset`` stands in for "every live counter -1"
        # (an entry's true estimate is stored - offset; it is dead once
        # stored <= offset). Each overflow arrival raises the offset by
        # EXACTLY one and sweeps dead entries — the sweep's O(capacity)
        # cost amortizes against the >= capacity+1 mass each decrement
        # event consumes, and the one-step decrement is what the
        # N/(capacity+1) undercount bound (and therefore
        # frequent_items_exact's superset guarantee) requires. A
        # subtract-the-min "batch" decrement would remove min*capacity
        # mass for a single arrival and break that bound: [a, a, b]
        # at capacity 1 would evict a entirely, though true MG leaves
        # it with estimate 1.
        counters: dict[str, int] = {}
        offset = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < partition_capacity:
                    counters[v] = offset + 1
                else:
                    offset += 1
                    counters = {k: c for k, c in counters.items() if c > offset}
        if counters:
            yield pd.DataFrame(
                {
                    col: list(counters.keys()),
                    "est": [c - offset for c in counters.values()],
                }
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        mg, schema=out_schema
    )


def frequent_items_topk_exact(
    df: DataFrame,
    col: str,
    k: int = 100,
    partition_capacity: int = 2000,
) -> DataFrame:
    """EXACT, deterministic top-``k`` most frequent values via the same
    two-pass sketch-then-recount pattern as :func:`frequent_items_exact`
    — the partition-independent twin of :func:`frequent_items`.

    Pass 1 collects Misra-Gries candidates (any value absent from the
    merged summary has true count ≤ N/(capacity+1), the total
    undercount bound). Pass 2 broadcasts the candidates, recounts them
    exactly with a left-semi-pruned aggregate, and keeps the top ``k``
    by (count desc, value asc).

    The result is PROVABLY the exact global top-``k`` whenever the
    k-th recounted candidate count exceeds N/(capacity+1): no
    non-candidate can beat it. That precondition is data-dependent, so
    it is CHECKED at plan level — the k-th count and the bound travel
    in the plan as a scalar guard, and a violation surfaces as an
    assert_true failure rather than a silently-partition-dependent
    answer. Memory is O(capacity) per task, never O(vocabulary).
    """
    vals = df.select(F.col(col).cast("string").alias(col)).where(
        F.col(col).isNotNull()
    )
    cand = (
        _mg_partials(vals, col, partition_capacity)
        .select(col)
        .dropDuplicates([col])
    )
    total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    topk = (
        vals.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
        .limit(k)
    )
    # The undercount bound is per-partition-additive: with P input
    # partitions it is at most sum_p N_p/(capacity+1) = N/(capacity+1).
    # assert_true is a codegen'd scalar predicate on the (tiny) top-k
    # rows — it costs nothing and turns "silently wrong under adverse
    # partitioning" into a loud failure.
    # The guard lives in a FILTER (assert_true yields NULL on success,
    # so the predicate keeps every row) — a projected-then-dropped
    # guard column would be erased by Catalyst's column pruning.
    bound = F.col("n_total") / F.lit(partition_capacity + 1)
    return (
        topk.crossJoin(F.broadcast(total))
        .filter(
            F.assert_true(
                F.col("cnt") > bound,
                F.lit(
                    f"top-{k} not provable: k-th candidate count within the "
                    f"MG undercount bound N/{partition_capacity + 1}; raise "
                    "partition_capacity"
                ),
            ).isNull()
        )
        .select(col, "cnt")
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
    )


def frequent_items_exact(
    df: DataFrame,
    col: str,
    phi: float = 0.002,
    partition_capacity: int = 2000,
) -> DataFrame:
    """EXACT φ-heavy hitters (every value with count ≥ ⌈φ·N⌉) via the
    standard two-pass sketch-then-recount pattern.

    Pass 1 runs the Misra-Gries map side and merges the per-partition
    summaries into a bounded candidate set (≤ partitions × capacity
    rows). MG's undercount across the whole input is at most
    N/(capacity+1), so requiring capacity+1 > 1/φ guarantees every
    true φ-heavy hitter has a positive merged estimate — the candidate
    set is a SUPERSET of the answer. Pass 2 broadcasts the candidates,
    left-semi prunes the input to candidate rows only, recounts them
    exactly, and keeps those at or above ⌈φ·N⌉.

    Unlike the raw sketch (whose counter contents depend on partition
    boundaries) the result is deterministic and partition-independent
    — an exact relational answer at sketch memory cost: O(capacity)
    per task, an aggregate over candidate values only (never the full
    vocabulary), and two scans of the input instead of one.

    NULL rows are excluded up front, so N (and therefore the
    ⌈φ·N⌉ threshold) is the count of the NON-NULL item multiset —
    the usual heavy-hitter definition, and consistent with the MG
    pass, which never admits NULL as a candidate.
    """
    if partition_capacity + 1 <= 1.0 / phi:
        raise ValueError(
            f"partition_capacity={partition_capacity} too small for phi={phi}: "
            f"need capacity+1 > 1/phi so no true heavy hitter can be evicted"
        )
    vals = df.select(F.col(col).cast("string").alias(col)).where(
        F.col(col).isNotNull()
    )
    cand = (
        _mg_partials(vals, col, partition_capacity)
        .select(col)
        .dropDuplicates([col])
    )
    total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        vals.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("n_total")))
        .select(col, "cnt")
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
    )


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership for semi-join pruning
# ---------------------------------------------------------------------------
#
# The pattern Spark's runtime bloom-filter join applies automatically
# (spark.sql.optimizer.runtime.bloomFilter.*), exposed as an explicit,
# deterministic operator: when the filtering side of a semi-join is too
# big to broadcast as a hash relation but its MEMBERSHIP fits in a few
# MB of bits (10M keys ~ 20 MB at ~0.9% fp), ship the bits and prune
# the 100 TB side with a pure projection — zero shuffle, no join — then
# verify the survivors exactly. False-positive rate for m bits, h
# hashes, n keys is (1 - e^(-hn/m))^h; no false negatives ever.
#
# The filter is sized FROM THE KEY COUNT (13 bits/key at h=3 → ~0.9%
# fp) with integer-only arithmetic, so the oracle recomputes the same
# m from COUNT(*) — a fixed m silently saturates as the key set grows
# (measured: 630 bits over the 10x key set pushed fp from 0.5% to 5.6%
# and quintupled the verify-side work). Probe-side hash cost rides the
# AND short-circuit: on a correctly-sized filter the first bit test
# rejects ~80% of non-members, so the 2nd/3rd md5 evaluations are paid
# by members and false positives only (~1.2 hashes/row amortized;
# measured, since filter codegen does NOT subexpression-eliminate).
#
# Words carry 63 bits each (bit index 0..62), never touching the sign
# bit, so membership needs no shift operators at all — only
# pow(2, bit) (exact in a double up to 2^62), bitwise AND, and integer
# division, every one of which DuckDB evaluates identically, making
# the whole build + probe SQL-replayable for the oracle.

BLOOM_WORD_BITS = 63
BLOOM_BITS_PER_KEY = 13


def bloom_n_words(n_keys: int) -> int:
    """Words for ``n_keys`` at 13 bits/key — integer-only (float
    sizing could differ by one ulp between engines), min 1 word so an
    empty key set yields an all-zero filter, not a modulo-by-zero."""
    return max(1, (BLOOM_BITS_PER_KEY * n_keys + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS)


def duck_bloom_n_words(count_expr: str) -> str:
    """DuckDB spelling of :func:`bloom_n_words` for oracle SQL."""
    return (
        f"greatest(1, ({BLOOM_BITS_PER_KEY} * {count_expr} + {BLOOM_WORD_BITS - 1})"
        f" // {BLOOM_WORD_BITS})"
    )


def bloom_positions(key: Column, m_bits: int, num_hashes: int, salt: str = "bloom"):
    """The ``num_hashes`` deterministic bit positions of a key — the
    single spelling shared by the build side and the probe side (and
    mirrored by :func:`duck_bloom_positions`), so they cannot drift.

    One independent md5 per position, NOT Kirsch-Mitzenmacher double
    hashing — a deliberate, measured choice. KM (two words of one md5,
    position j = h1 + j·h2 mod m) is the textbook way to pay one hash
    for k positions, but Spark's FilterExec splits the probe's AND
    into per-conjunct codegen blocks (for short-circuiting) with NO
    common-subexpression elimination across them, so the "one" md5 is
    generated once per h1/h2 reference per conjunct: measured at k=3
    over the 600k-row sf0.1 probe, KM ran 3.1 s vs 1.78 s for per-salt
    hashing (6 effective md5s vs 3), and staging h1/h2 in a projection
    does not survive PushPredicateThroughNonJoin (alias substitution
    put 6 md5s back into the pushed filter — 3.4 s). Until FilterExec
    codegen learns CSE, k independent salted hashes IS the cheapest
    spelling, and the conjunct order still short-circuits: the first
    bit test rejects most non-members, so later md5s rarely run."""
    from lion_parcel_etl_spark.operators.sampling import id_hash

    return [F.pmod(id_hash(key, f"{salt}{j}"), F.lit(m_bits)) for j in range(num_hashes)]


def duck_bloom_positions(expr: str, m_expr: str, num_hashes: int, salt: str = "bloom"):
    """DuckDB spelling of :func:`bloom_positions` for oracle SQL;
    ``m_expr`` is an SQL expression (the oracle derives m from the
    key count, mirroring :func:`bloom_n_words`)."""
    from lion_parcel_etl_spark.operators.sampling import duck_id_hash

    return [f"({duck_id_hash(expr, f'{salt}{j}')} % ({m_expr}))" for j in range(num_hashes)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_hashes: int = 3,
    salt: str = "bloom",
) -> list[int]:
    """Aggregate the key set into a zero-filled list of
    ``bloom_n_words(count)`` words. A count plus one small groupBy
    over the key side; the driver receives only the words (the
    IVF-centroid pattern — a ~0.9%-fp filter over 10M keys is ~320k
    longs), which callers embed as a literal array so the probe is
    join-free."""
    n_words = bloom_n_words(df.count())
    m_bits = n_words * BLOOM_WORD_BITS
    pos = df.select(
        F.explode(F.array(*bloom_positions(F.col(key_col), m_bits, num_hashes, salt))).alias("p")
    )
    rows = (
        pos.select(
            (F.col("p") / F.lit(BLOOM_WORD_BITS)).cast("bigint").alias("w"),
            F.pow(F.lit(2.0), F.pmod(F.col("p"), F.lit(BLOOM_WORD_BITS))).cast("bigint").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_probe(
    key: Column, words: list[int], num_hashes: int = 3, salt: str = "bloom"
) -> Column:
    """Membership test as a pure projection over a literal word array:
    true iff every hash position's bit is set. Whole-stage codegen'd,
    zero shuffle, no join touches the probed side.

    The words MUST be one true array Literal (``F.lit(list)``), not
    ``F.array(lit, lit, ...)``: CreateArray is rebuilt per row per
    conjunct (measured 1.7x slower at 83 words over 6M rows), a cost
    that would scale with filter size — exactly wrong for the big-key-
    set regime this operator exists for. Conjunct order rides codegen
    short-circuiting: on a correctly sized filter the first bit test
    rejects most non-members, so later md5 evaluations are rare."""
    m_bits = len(words) * BLOOM_WORD_BITS
    arr = F.lit(words)
    cond = None
    for p in bloom_positions(key, m_bits, num_hashes, salt):
        word = F.element_at(arr, ((p / F.lit(BLOOM_WORD_BITS)).cast("bigint") + 1).cast("int"))
        bit = F.pow(F.lit(2.0), F.pmod(p, F.lit(BLOOM_WORD_BITS))).cast("bigint")
        hit = word.bitwiseAND(bit) != F.lit(0)
        cond = hit if cond is None else cond & hit
    return cond


# ---------------------------------------------------------------------------
# KMV (bottom-k / K-Minimum-Values) distinct sketches — Beyer et al. 2007.
# Unlike HLL these are DETERMINISTIC given the md5 60-bit hash discipline
# (operators/sampling.id_hash), so estimates replay bit-for-bit in a SQL
# oracle, and — unlike HLL — they support INTERSECTION estimation: the
# bottom-k of a union is a uniform sample of the union, so the fraction of
# it that lies in both sets estimates Jaccard (Dasu et al.'s minwise trick).
# The engine use case: cross-source overlap audits (the sketch-scale twin of
# the exact dedup_source_matrix) where the exact pairwise join is the thing
# that doesn't scale.

KMV_K = 256
#: Hash space size for the estimator: id_hash is uniform on [0, 2^60).
KMV_SPACE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
    prefilter_rsd: float | None = None,
) -> DataFrame:
    """(group..., kmv) — per group, the sorted array of the k smallest
    distinct 60-bit hashes of ``key_col``. Mergeable: the sketch of a
    union is re-bottom-k of concatenated sketches (:func:`kmv_merge`),
    so per-day / per-source sketches persist once and answer later
    overlap questions without rescanning the corpus.

    Cost: one distinct on (group, hash) and one per-group rank. With
    ``prefilter_rsd`` set, a first HLL pass estimates each group's
    distinct count and only hashes below ~4·k/n̂ of the space enter the
    rank shuffle — the exchange then carries O(k) rows per group
    instead of every distinct value (the corpus-scale setting; output
    is IDENTICAL as long as ≥k hashes survive, which the 4× margin
    makes overwhelmingly likely: P(<k survivors) is a lower-tail
    binomial deviation of 4× the mean — the identity is asserted in
    tests, and the assert_true guard below turns a silent shortfall
    into a loud failure). The un-prefiltered shape is the oracle's.
    """
    from lion_parcel_etl_spark.operators.sampling import id_hash

    hashes = df.select(
        *group_cols, id_hash(F.col(key_col), salt="kmv").alias("h")
    ).distinct()
    return kmv_sketch_hashed(hashes, group_cols, k, prefilter_rsd)


def kmv_sketch_hashed(
    hashes: DataFrame,
    group_cols: list[str],
    k: int = KMV_K,
    prefilter_rsd: float | None = None,
) -> DataFrame:
    """:func:`kmv_sketch` over a PRE-HASHED distinct (group..., h)
    table — for callers that also need the hash table for something
    else (an exact count, a leakage audit) and pin it once instead of
    re-running the tokenize/explode/distinct chain per consumer."""
    est = None
    if prefilter_rsd is not None:
        est = hashes.groupBy(*group_cols).agg(
            F.approx_count_distinct("h", prefilter_rsd).alias("__n")
        )
        thr = est.select(
            *group_cols,
            # clamp in DOUBLE space BEFORE the bigint cast: with
            # n̂ < k/2 the raw 4k/n̂·2^60 exceeds Long.MaxValue, and
            # under ANSI mode the unclamped cast would throw
            # CAST_OVERFLOW instead of saturating. (KMV_SPACE−1 rounds
            # to 2^60 in double — a clamp at exactly the space size,
            # i.e. a true no-op filter for small groups.)
            F.least(
                F.lit(KMV_SPACE),
                F.lit(4.0 * k) / F.col("__n") * F.lit(KMV_SPACE),
            )
            .cast("bigint")
            .alias("__thr"),
        )
        hashes = hashes.join(F.broadcast(thr), group_cols).filter(
            F.col("h") < F.col("__thr")
        ).drop("__thr")
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy(F.col("h"))
    )
    topk = hashes.withColumn("__rn", rn).filter(F.col("__rn") <= k)
    sk = topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("h")).alias("kmv")
    )
    if est is not None:
        # A group whose prefilter kept fewer than k hashes while the
        # group actually HAS ≥k distinct values would silently
        # under-sketch. A short sketch is legitimate exactly when the
        # threshold clamp made the filter a no-op (n̂ ≤ 4k ⇒ threshold
        # covers the space), so the group is genuinely small.
        guard = F.assert_true(
            (F.size("kmv") >= k) | (F.col("__n") <= F.lit(4 * k)),
            F.lit("kmv prefilter kept < k hashes; lower prefilter_rsd"),
        )
        sk = (
            sk.join(F.broadcast(est), group_cols)
            .filter(guard.isNull())
            .drop("__n")
        )
    return sk


def kmv_estimate(kmv: Column, k: int = KMV_K) -> Column:
    """Distinct-count estimate from a sketch array: exact size when the
    group had fewer than k distinct values, else (k-1)·SPACE/h_(k)."""
    return F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.element_at(kmv, k)
    )


def kmv_merge(kmv_a: Column, kmv_b: Column, k: int = KMV_K) -> Column:
    """Sketch of the union of two sketched sets: bottom-k of the
    merged hash sets (array_union dedupes)."""
    return F.slice(F.array_sort(F.array_union(kmv_a, kmv_b)), 1, k)


def kmv_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """All-pairs overlap estimates from a per-group sketch table:
    (group_a, group_b, union_est, jaccard_est, intersection_est).

    The join is sketch×sketch — G²/2 rows of k-length arrays, nothing
    touching the corpus — so auditing 1000 sources costs half a
    million tiny array ops regardless of corpus size. Jaccard: the
    bottom-k of the union is a uniform sample of the union; the
    fraction of it present in BOTH sketches estimates |A∩B|/|A∪B|
    (error ~1/√k ≈ 6% at k=256)."""
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("kmv").alias("__ka")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("kmv").alias("__kb")
    )
    paired = a.join(b, F.col("group_a") < F.col("group_b"))
    u = kmv_merge(F.col("__ka"), F.col("__kb"), k)
    both = F.size(
        F.array_intersect(F.array_intersect("__ka", "__kb"), u)
    )
    union_est = kmv_estimate(u, k)
    jac = both.cast("double") / F.size(u)
    return paired.select(
        "group_a",
        "group_b",
        F.round(union_est, 6).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 6).alias("intersection_est"),
    )

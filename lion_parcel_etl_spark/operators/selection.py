"""DSIR-style importance resampling for training-data selection.

Implements the hashed n-gram importance-resampling recipe of Xie et
al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS 2023): fit bag-of-hashed-ngram (unigram+bigram)
bucket distributions on a TARGET corpus and on the RAW pool, weight
every raw document by the log-likelihood ratio of its features under
the two distributions, then resample without replacement via
Gumbel-top-k — selecting the raw documents most distributionally
similar to the target. Not in the reference (its 20-row tables need no
data selection); core to the engine's training-data surface: this is
the standard published method for "make my 100 TB crawl look like
Wikipedia".

Scale shape (the whole chain is JVM expressions + two hash
aggregates; no Python, no driver data):

- Fitting is one groupBy(bucket) per corpus. Map-side partial
  aggregation collapses each partition's token stream to ≤BUCKETS
  rows before the exchange, so the fit shuffles at most
  partitions×BUCKETS tiny rows no matter the corpus size — the
  bucket-count tables themselves are ≤BUCKETS rows and broadcast
  everywhere they are used.
- Scoring explodes features to (doc, bucket) rows, broadcast-joins
  the ≤BUCKETS-row log-ratio table, and groupBy(doc) sums. The
  explode is narrow (a doc's features stay in its partition), so the
  partial agg collapses to one row per doc before the one exchange —
  the shuffle carries n_docs score rows, never the token stream.
- Selection is logw + deterministic Gumbel noise, then
  orderBy().limit(k) — Spark plans TakeOrderedAndProject (per-
  partition top-k, k-row driver merge), not a global sort.

Determinism: buckets come from md5 (the :mod:`sampling` 60-bit
discipline) and the Gumbel uniforms from :func:`sampling.id_hash`, so
a DuckDB oracle replays every bit; per-doc sums of log-ratios are
order-sensitive only below the 1e-6 output rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators.sampling import (
    HASH_MOD,
    duck_id_hash,
    id_hash,
)

DSIR_BUCKETS = 4096


def ngram_features(toks: Column) -> Column:
    """Unigram + bigram features WITH multiplicity (DSIR counts
    feature instances, not the distinct set) from a token array.
    NULL tokens (null text) propagate to a NULL feature array."""
    from lion_parcel_etl_spark.operators.text import word_ngrams

    return F.concat(toks, word_ngrams(toks, 2))


def feature_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket) — one row per feature INSTANCE. The single feature
    spelling shared by fitting and scoring so the two cannot drift.

    explode_OUTER + post-filter on the generated column, not a plain
    explode: generate-filter inference would push ``size(concat(
    tokens, bigrams)) > 0`` below the projection and re-inline the
    whole tokenization chain into an interpreted per-row Filter (the
    audit's FOLD_IN_FILTER flag). Null/empty-text docs therefore fall
    out here — a doc with no features has no distribution to score.
    """
    from lion_parcel_etl_spark.operators.dedup import tokens

    keep = [F.col(id_col), *(F.col(c) for c in extra_cols)]
    staged = docs.select(*keep, tokens(F.col(text_col)).alias("__toks"))
    feats = staged.select(
        *keep, F.explode_outer(ngram_features(F.col("__toks"))).alias("__f")
    ).filter(F.col("__f").isNotNull())
    return feats.select(
        *keep,
        F.pmod(
            F.conv(F.substring(F.md5("__f"), 1, 15), 16, 10).cast("bigint"),
            F.lit(buckets),
        ).cast("int").alias("bucket"),
    )


def bucket_counts(feats: DataFrame, count_name: str = "cnt") -> DataFrame:
    """(bucket, cnt) hashed-feature histogram — ≤BUCKETS rows out;
    map-side combine bounds the exchange at partitions×BUCKETS."""
    return feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias(count_name)
    )


def dsir_logratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, lr) smoothed per-bucket log-likelihood ratio
    ln p̂_tgt(b) − ln p̂_raw(b) with add-one smoothing over the
    ``buckets``-cell feature space.

    LEFT join from the raw side, broadcast: in the DSIR flow the
    target is a slice of the fitted pool, so its buckets are a subset
    of raw's and the raw support covers every bucket a pool document
    can probe — a full-outer join would only add target-only buckets
    no raw doc can hit, at the price of a sort-merge exchange (Spark
    cannot broadcast a full outer). Totals are computed over the
    raw-support rows, which equals the full totals under the same
    subset property."""
    t = target_counts.select("bucket", F.col(target_counts.columns[1]).alias("__t"))
    r = raw_counts.select("bucket", F.col(raw_counts.columns[1]).alias("__r"))
    joined = r.join(F.broadcast(t), "bucket", "left").select(
        "bucket",
        F.coalesce("__t", F.lit(0)).alias("__t"),
        F.col("__r"),
    )
    # totals via an unpartitioned window, not a crossJoin with the
    # table's own aggregate (a self-join Catalyst resolves ambiguously)
    # — the single-partition exchange holds ≤buckets tiny rows by
    # construction, so "everything on one reducer" is the CHEAP shape
    # here, not a scale hazard.
    everything = Window.partitionBy()
    return joined.select(
        "bucket",
        (
            F.log(F.col("__t") + 1)
            - F.log(F.sum("__t").over(everything) + F.lit(buckets))
            - F.log(F.col("__r") + 1)
            + F.log(F.sum("__r").over(everything) + F.lit(buckets))
        ).alias("lr"),
    )


def dsir_fit(
    docs: DataFrame,
    target_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """One-pass log-ratio fit for the standard DSIR setup where the
    target is a SLICE of the pool (a predicate over the pool's own
    columns): a single feature pass builds BOTH histograms — count(*)
    for raw, a conditional sum for target — so the corpus is tokenized
    once instead of twice, and the raw-vs-target join disappears
    entirely (both counts live in the same ≤buckets-row table).
    Measured 3.35 → 2.36 s at sf0.1 vs the two-pass
    :func:`dsir_logratio` fit. Use the two-DataFrame form when the
    target is a separate corpus."""
    feats = feature_buckets(
        docs.withColumn("__is_tgt", target_cond),
        id_col,
        text_col,
        buckets,
        extra_cols=("__is_tgt",),
    )
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("__r"),
        F.sum(F.when(F.col("__is_tgt"), 1).otherwise(0))
        .cast("bigint")
        .alias("__t"),
    )
    everything = Window.partitionBy()
    return counts.select(
        "bucket",
        (
            F.log(F.col("__t") + 1)
            - F.log(F.sum("__t").over(everything) + F.lit(buckets))
            - F.log(F.col("__r") + 1)
            + F.log(F.sum("__r").over(everything) + F.lit(buckets))
        ).alias("lr"),
    )


def dsir_weights(
    raw: DataFrame,
    logratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, n_feats, logw) per-document log importance weight
    Σ_b c_b(x)·lr_b. In the standard DSIR flow the log-ratio table was
    fitted with THIS pool as the raw side, so every probe hits (a
    doc's bucket was counted); scoring docs from outside the fitted
    pool coalesces unseen buckets to a neutral 0.0 contribution —
    callers wanting the fully-smoothed unseen value should refit
    :func:`dsir_logratio` over the union instead."""
    feats = feature_buckets(raw, id_col, text_col, buckets)
    scored = feats.join(F.broadcast(logratio), "bucket", "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum(F.coalesce("lr", F.lit(0.0))).alias("logw"),
        )
    )


def logratio_values(logratio: DataFrame, buckets: int = DSIR_BUCKETS) -> list[float]:
    """Collect a fitted (bucket, lr) table into a dense buckets-long
    list (missing buckets → 0.0, the same neutral fallback
    :func:`dsir_weights` coalesces to). ≤buckets tiny rows reach the
    driver — the IVF-centroid precedent: an intentionally small model
    artifact crossing once at plan-build time so that SCORING can be a
    pure per-row expression (streaming-safe, no per-batch join)."""
    vals = [0.0] * buckets
    for r in logratio.collect():
        vals[r["bucket"]] = float(r["lr"])
    return vals


def bucketed_feature_rows(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Append (n_feats, __buckets) per row — the staged
    tokenize→ngram→md5-bucket spelling shared by every per-row scorer
    (:func:`dsir_score` here, ``classifier.logreg_score_row``) so the
    bucket hash cannot drift between fitting (:func:`feature_buckets`)
    and row scoring. Each expensive array (features, buckets) is
    staged in its own projection — higher-order functions are
    CodegenFallback with no subexpression reuse, so an inline spelling
    would tokenize once for size() and again for the fold."""
    from lion_parcel_etl_spark.operators.dedup import tokens

    others = list(docs.columns)
    staged = docs.select(
        *others, ngram_features(tokens(F.col(text_col))).alias("__feats")
    )
    return staged.select(
        *others,
        F.size("__feats").cast("bigint").alias("n_feats"),
        F.transform(
            "__feats",
            lambda f: F.pmod(
                F.conv(F.substring(F.md5(f), 1, 15), 16, 10).cast("bigint"),
                F.lit(buckets),
            ).cast("int"),
        ).alias("__buckets"),
    )


def dsir_score(
    docs: DataFrame,
    lr_values: list[float],
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Append (n_feats, logw) per-row: the fitted log-ratio table
    embedded as ONE array literal in the plan (the bpe-merge-table /
    LSH-hyperplane precedent) and indexed by each feature's bucket in
    a JVM fold. No shuffle, no state, no Python — exactly what a
    streaming append-mode admission filter needs, since a per-doc
    groupBy on an unbounded stream would demand watermarks the corpus
    doesn't have. The tokenize→bucket staging is the shared
    :func:`bucketed_feature_rows`. Scores equal
    :func:`dsir_weights` (same lr doubles, same sum) to well below the
    1e-6 output rounding; docs with no features carry NULL logw (their
    distribution is undefined — a threshold filter drops them, same as
    their absence from the batch weights table)."""
    lr_arr = F.array(*[F.lit(v) for v in lr_values])
    others = [c for c in docs.columns]
    bucketed = bucketed_feature_rows(docs, text_col, buckets)
    return bucketed.select(
        *others,
        F.when(F.col("n_feats") > 0, F.col("n_feats")).alias("n_feats"),
        F.when(
            F.col("n_feats") > 0,
            F.aggregate(
                F.col("__buckets"),
                F.lit(0.0),
                lambda acc, b: acc + F.element_at(lr_arr, b + 1),
            ),
        ).alias("logw"),
    )


def gumbel_key(logw: Column, id_c: Column, salt: str = "dsir") -> Column:
    """logw + Gumbel(0,1) noise from the deterministic 60-bit id hash:
    u = (h + 0.5)/2^60 is strictly inside (0,1), g = −ln(−ln u).
    Gumbel-top-k over these keys is an exact sample-without-replacement
    from softmax(logw) (Vieira 2014) — the DSIR resampling step."""
    u = (id_hash(id_c, salt) + F.lit(0.5)) / F.lit(float(HASH_MOD))
    return logw - F.log(-F.log(u))


def duck_gumbel_key(logw_expr: str, id_expr: str, salt: str = "dsir") -> str:
    """DuckDB spelling of :func:`gumbel_key` for oracle SQL."""
    u = f"(({duck_id_hash(id_expr, salt)}) + 0.5) / {float(HASH_MOD)!r}"
    return f"({logw_expr} - ln(-ln({u})))"


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Top-k Gumbel resample of a (id, …, logw) weights table —
    the selected training subset. TakeOrderedAndProject shape: no
    global sort, k rows cross the wire."""
    keyed = weights.withColumn(
        "gkey", gumbel_key(F.col("logw"), F.col(id_col), salt)
    )
    return keyed.orderBy(F.col("gkey").desc()).limit(k)

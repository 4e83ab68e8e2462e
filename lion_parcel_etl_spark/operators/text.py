"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (BASELINE.json north_star): language
ID, quality scoring, token counting, document fingerprinting — all as
pure JVM-side column expressions (no Python in the hot path), so they
whole-stage-codegen and scale linearly with input bytes.

Every operator here is deliberately expressible in ANSI SQL too: the
DuckDB oracles in ``__spark_entry__.py`` are generated from the same
constants below, which is what makes the correctness gate meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles. Accuracy is not the point at this
# corpus (synthetic word soup); determinism and scale shape are.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "la", "les", "des", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}

EN_STOPWORDS = LANG_PROFILES["en"]
PUNCT_CLASS = "[.,;:!?]"
TOKEN_PATTERN = r"\S+"


def token_count(text: Column) -> Column:
    """Whitespace-delimited token count (regex, codegen-friendly).
    Null text → null (size() alone yields -1 with ANSI off)."""
    return F.when(
        text.isNotNull(),
        F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)),
    ).cast("long")


def stopword_hits(text: Column, words: list[str]) -> Column:
    r"""Total occurrences of any profile word — word-boundary matches
    for ASCII profiles, plain occurrences for non-ASCII ones: ``\b``
    is ASCII-only in both Java regex and RE2, so a boundary-wrapped
    CJK word can NEVER match (space and the character are both
    non-word under ASCII ``\w``) and the zh profile would be dead
    code. The oracle SQL applies the identical rule."""
    pat = stopword_pattern(words)
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0)).cast("long")


def stopword_pattern(words: list[str]) -> str:
    """Shared Spark/DuckDB regex for a stopword profile."""
    body = "(" + "|".join(words) + ")"
    if all(w.isascii() for w in words):
        return r"\b" + body + r"\b"
    return body


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hit counts; 'und' when all zero.

    Tie-break: fixed profile order (en, de, es, fr, zh) — mirrored
    exactly by the CASE chain in the SQL oracle.

    One regex scan per language: the scores land in an array that a
    single fold argmaxes (strict > against the running max = first
    profile wins ties). A when-chain comparing each score against
    greatest(others) would re-reference — and re-evaluate — every
    regex count ~5×.
    """
    langs = list(LANG_PROFILES)
    scores = F.array(*[stopword_hits(text, LANG_PROFILES[lg]) for lg in langs])
    names = F.array(*[F.lit(lg) for lg in langs])
    pairs = F.zip_with(scores, names, lambda s, n: F.struct(s.alias("s"), n.alias("n")))
    best = F.aggregate(
        pairs,
        F.struct(F.lit(0).cast("long").alias("s"), F.lit("und").alias("n")),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
    )
    return best["n"]


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length, stopword density,
    punctuation noise. Weights are arbitrary but fixed and mirrored in
    the oracle SQL."""
    toks = token_count(text).cast("double")
    stop_ratio = F.when(
        toks > 0, stopword_hits(text, EN_STOPWORDS).cast("double") / toks
    ).otherwise(F.lit(0.0))
    len_score = F.least(toks / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(10.0))
    score = (
        F.lit(0.4) * len_score + F.lit(0.3) * stop_score + F.lit(0.3) * punct_score
    )
    # NULL text must not score 0.7 (F.least skips the NULL token count,
    # leaving len/punct scores at their 1.0 maxima) — an empty record
    # would outrank most genuine short documents in a quality filter
    return F.when(text.isNotNull(), score).otherwise(F.lit(0.0))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-collapsed, lower-cased text. Identical in any engine
    with md5 (DuckDB oracle uses the same normalization)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings via zipped slices — the
    same shingle construction MinHash uses; pure array exprs, no
    explode, no shuffle."""
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array — i.e.
    the count of the most frequent element — as one aggregate() fold
    with a (prev, run, best) struct accumulator. 0 for empty arrays."""

    def step(a: Column, x: Column) -> Column:
        run = F.when(x == a["prev"], a["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step, lambda a: a["best"])


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition statistics — the filter family used to
    drop degenerate/boilerplate documents from LLM training corpora
    (as popularized by the Gopher/MassiveText quality rules):

    - ``top2_mass``: fraction of all word 2-grams taken by the single
      most frequent 2-gram (a high value = looping/boilerplate text);
    - ``dup3_frac``: fraction of word 3-grams that are repeats of an
      earlier 3-gram (1 - distinct/total);
    - ``flagged``: either metric over its fixed threshold.

    Shape: one projection of per-row array expressions (sort + fold
    higher-order functions) — fully JVM-side, ZERO shuffle,
    embarrassingly parallel at any corpus size. The most-frequent-gram
    count is computed as the longest run in the SORTED gram list via
    one aggregate() fold: O(L log L) per row instead of the naive
    O(distinct·L) count-each-distinct (which measured 25 s vs ~1 s on
    the sf0.1 corpus); per-row cost is bounded by document length, not
    corpus size — for megabyte-scale documents chunk first
    (doc_chunking)."""
    from lion_parcel_etl_spark.operators.dedup import tokens

    # Staged projections, not one inline tree: higher-order functions
    # are CodegenFallback with NO runtime subexpression sharing, so an
    # inline tree re-tokenizes per gram slice and re-builds each gram
    # array per consumer (size guard, ratio, sort — measured 3.2 s vs
    # ~1 s at sf0.1). Each alias below is expensive and referenced
    # more than once downstream, which is exactly the condition under
    # which CollapseProject keeps the projection boundary — the same
    # mechanism minhash_signatures and bigram_frequency rely on.
    staged = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    staged = staged.select(
        id_col,
        word_ngrams(F.col("__toks"), 2).alias("__g2"),
        word_ngrams(F.col("__toks"), 3).alias("__g3"),
    )
    g2, g3 = F.col("__g2"), F.col("__g3")
    top2 = _max_run(F.array_sort(g2))
    top2_mass = F.when(
        F.size(g2) > 0, F.round(top2 / F.size(g2), 6)
    ).otherwise(F.lit(0.0))
    dup3 = F.when(
        F.size(g3) > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(g3)) / F.size(g3).cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))
    out = staged.select(
        F.col(id_col),
        top2_mass.alias("top2_mass"),
        dup3.alias("dup3_frac"),
    )
    return out.withColumn(
        "flagged",
        (F.col("top2_mass") > REP_TOP2_MAX) | (F.col("dup3_frac") > REP_DUP3_MAX),
    )


REP_TOP2_MAX = 0.18
REP_DUP3_MAX = 0.40


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach all text-analysis columns in one projection
    (single scan, fully codegen'd)."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        lang_id(t).alias("lang_guess"),
        F.round(quality_score(t), 6).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def tokens_long(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term) long form: lower-cased whitespace tokens exploded
    one row per occurrence — the shared first stage of the IR operators
    below. One scan; the explode multiplies rows but every downstream
    aggregate partial-aggregates before its exchange."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("term"),
    )


def source_token_counts(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, token, c_st) unigram counts per source — the exact,
    trivially-mergeable sufficient statistic of the vocab-KL drift
    diagnostic (counts are a sum-monoid, so per-batch tables merge by
    addition: the streaming twin stores these and never rescans the
    raw stream). One scan, one partial-aggregated exchange."""
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )


def vocab_kl_from_counts(st: DataFrame) -> DataFrame:
    """KL(source ‖ corpus) in bits from a (source, token, c_st) count
    table — the math shared by the batch query (plans/queries.
    q_vocab_kl) and the streaming monitor (streaming/jobs.
    read_vocab_kl), so stream-merged counts provably yield the
    identical statistic. The log argument is a ratio of exact integer
    counts, so engines (and the batch/stream twins) feed log2
    identical doubles; per-source sums round at 1e-6.

    Scale shape: everything re-aggregates from the count table —
    corpus token totals, per-source totals — and the KL join is
    vocabulary-sized; the corpus-token total is a broadcast 1-row
    scalar."""
    ct = st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    ns = st.groupBy("source").agg(
        F.sum("c_st").alias("n_s"), F.count(F.lit(1)).alias("v_s")
    )
    nn = ct.agg(F.sum("c_t").alias("nn"))
    term = (F.col("c_st").cast("double") / F.col("n_s")) * F.log2(
        (F.col("c_st").cast("double") * F.col("nn"))
        / (F.col("n_s").cast("double") * F.col("c_t"))
    )
    return (
        st.join(ct, "token")
        .join(ns, "source")
        .crossJoin(F.broadcast(nn))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.max("v_s").alias("vocab"),
            F.round(F.sum(term), 6).alias("kl_bits"),
        )
        .orderBy("source")
    )


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 5,
) -> DataFrame:
    """Top-N terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn smooth-idf form).

    Scale shape: tf partial-aggregates (doc, term) counts before its
    exchange; df aggregates the already-tiny tf table by term; the
    corpus size joins in as a broadcast 1-row aggregate (no collect).
    The tf⋈df join is deliberately UNhinted — document frequency tables
    are vocabulary-sized, which at web scale exceeds broadcast range;
    AQE promotes it to broadcast when small. Ranking orders by the
    ROUNDED score (then term) so cross-engine last-ulp float noise can
    never reorder the top-N.
    """
    from pyspark.sql import Window

    toks = tokens_long(docs, id_col, text_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top_n)
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Top-N documents for a bag-of-words query by BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the positive variant).

    Scale shape: the token stream filters to the QUERY terms before any
    aggregation (the predicate prunes ~|vocab|/|query| of the exploded
    rows map-side); per-term doc frequencies are ≤ |query| rows →
    broadcast; corpus stats (N, avg doc length) are a broadcast 1-row
    aggregate. Only documents containing ≥1 query term are scored —
    everything else never leaves its scan task. Final top-N is
    orderBy+limit (TakeOrderedAndProject: per-partition heaps, no
    global sort), ranked on the ROUNDED score for cross-engine order
    stability.
    """
    from pyspark.sql import Window

    terms = sorted({t.lower() for t in query_terms})
    toks = tokens_long(docs, id_col, text_col).filter(F.col("term").isin(terms))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(token_count(F.col(text_col)).cast("double")).alias("avgdl"),
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("double").alias("dl"),
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scores = contrib.groupBy("doc_id").agg(F.round(F.sum("c"), 6).alias("score"))
    top = scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(top_n)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    # the global window runs over top_n rows only — already limited
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def bm25_rank_keyed(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Per-QUERY BM25 top-N over a fixed query SET — the shape a real
    retrieval-eval harness has (one ranking per query, not one global
    ranking): (query_id, doc_id, score, rnk ≤ top_n).

    ``queries`` is a plan-time constant list of (query_id, terms);
    repeated terms within a query are deduplicated (query term
    frequency is 1 — the standard short-query simplification).

    Scale shape: the per-(doc, term) BM25 contribution is computed
    ONCE for the union of all query terms (the same
    filter-before-aggregate pruning as :func:`bm25_rank` — scoring Q
    queries costs one corpus pass, not Q), then a broadcast join to
    the ≤ Σ|terms| (query_id, term) table fans each contribution out
    to the queries containing that term, and one hash aggregate per
    (query, doc) sums the score. The per-query top-N runs as a
    row_number window PARTITIONED by query_id over candidate docs
    only (docs sharing ≥1 term with that query) — the single-query
    TakeOrderedAndProject becomes a per-key heap-equivalent sort, the
    standard keyed-top-k trade."""
    from pyspark.sql import Window

    qt_rows = sorted(
        {(qid, t.lower()) for qid, terms in queries for t in terms}
    )
    union_terms = sorted({t for _, t in qt_rows})
    spark = docs.sparkSession
    qt = spark.createDataFrame(qt_rows, "query_id string, term string")

    toks = tokens_long(docs, id_col, text_col).filter(
        F.col("term").isin(union_terms)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(token_count(F.col(text_col)).cast("double")).alias("avgdl"),
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("double").alias("dl"),
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scores = (
        contrib.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scores.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).filter(F.col("rnk") <= top_n)


# PII scrubbing patterns: (placeholder, regex). Deliberately simple,
# deterministic, and identical in Spark (Java regex) and DuckDB (RE2):
# no lookarounds, no backrefs — the intersection both engines compile
# the same way.
PII_PATTERNS: list[tuple[str, str]] = [
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<PHONE>", r"\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"),
    ("<IP>", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
]


def redact_pii(text: Column) -> tuple[Column, Column]:
    """(redacted_text, n_redactions): emails, phone numbers and IPv4
    literals replaced by typed placeholders — the scrubbing pass a
    training corpus runs before anything else. Pure per-row regex
    expressions (zero shuffle, whole-stage codegen).

    Each pattern is counted on the text AS ALREADY REDACTED by the
    previous patterns, so ``n_redactions`` equals the number of
    replacements actually performed even when patterns overlap (e.g.
    a phone number embedded in an email's local part is consumed by
    the email replacement and not double-counted). The SQL oracle
    mirrors the same replacement chain.
    """
    redacted = text
    n = F.lit(0).cast("long")
    for placeholder, pat in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(redacted, F.lit(pat), 0)).cast("long")
        redacted = F.regexp_replace(redacted, pat, placeholder)
    return redacted, n


def compression_ratio(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """zlib compressibility per document — the classic cheap
    repetition/boilerplate detector for training corpora (highly
    compressible ⇒ repetitive/templated text; near-incompressible ⇒
    random noise; natural prose sits in between). zlib is not
    expressible in SQL, so this is one of the few sanctioned Python
    crossings: an Arrow-batched pandas UDF (never row-at-a-time),
    deterministic for a fixed zlib level, validated on known inputs in
    tests/test_text.py. Zero shuffle — a pure projection; at 100 TB
    the cost is one streamed pass at C-compression speed."""

    @F.pandas_udf("double")
    def _ratio(texts):
        import zlib

        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return docs.select(
        F.col(id_col),
        F.round(_ratio(F.col(text_col)), 6).alias("compression_ratio"),
    )


def _bpe_merge_step(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of the adjacent symbol pair
    (left, right) with their concatenation — one learned BPE merge
    applied to a symbol sequence, as a pure array fold (no UDF). The
    fold consumes the merged token (no re-matching against its own
    output), the standard non-overlapping greedy application: 'xxxx'
    under (x,x) becomes [xx, xx], 'aaa' under (a,a) becomes [aa, a]."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    k_merges: int = 3,
    id_col: str | None = None,
) -> DataFrame:
    """Learn the first ``k_merges`` byte-pair-encoding merges over the
    corpus (Sennrich et al. 2016, arXiv:1508.07909) — the tokenizer-
    training step of a pretraining pipeline, distributed the way real
    BPE trainers scale: ONE corpus-sized aggregation builds the
    word-frequency vocabulary, and every iteration after that runs on
    the VOCABULARY table (distinct words x their symbol sequences,
    weighted by count) — per-merge cost is independent of corpus size.

    Each iteration counts adjacent symbol pairs (overlapping, weighted
    by word frequency — the get_stats convention), picks the argmax
    with a lexical tie-break, and applies it greedily left-to-right
    via :func:`_bpe_merge_step`. Only the single argmax row reaches
    the driver per iteration (the IVF-centroid pattern: the learned
    merge IS driver-sized, and the next plan embeds it as literals);
    the vocabulary is localCheckpointed per round like the
    connected-components loop, so lineage stays flat across merges.

    Returns the learned merge table (step, lhs, rhs, pair_count) —
    k_merges rows, the artifact a tokenizer trainer persists. Rounds
    stop early if no adjacent pair remains.

    Initial symbols come from ``split(word, '')``, which on the JVM
    splits by UTF-16 code unit — identical to per-code-point splitting
    for all BMP text (this corpus is ASCII) but it would halve astral
    characters into surrogates where a code-point engine (DuckDB's
    string_split) would not; real multilingual corpora should start
    from bytes (the GPT-2 convention) rather than code units anyway.
    """
    from lion_parcel_etl_spark.operators.dedup import tokens

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seqs = words.select(F.split("w", "").alias("syms"), "cnt").localCheckpoint()
    learned: list[tuple[int, str, str, int]] = []
    for step in range(1, k_merges + 1):
        n = F.greatest(F.size("syms") - 1, F.lit(0))
        zipped = F.arrays_zip(F.slice("syms", 1, n), F.slice("syms", 2, n))
        best = (
            seqs.select(F.explode(zipped).alias("p"), "cnt")
            .select(F.col("p")["0"].alias("s1"), F.col("p")["1"].alias("s2"), "cnt")
            .groupBy("s1", "s2")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        r = best[0]
        learned.append((step, r["s1"], r["s2"], r["pair_count"]))
        seqs = seqs.select(
            _bpe_merge_step(F.col("syms"), r["s1"], r["s2"]).alias("syms"), "cnt"
        ).localCheckpoint()
    return spark.createDataFrame(
        learned, "step int, lhs string, rhs string, pair_count long"
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule battery
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MEAN_WORD_LEN = 3.9
GOPHER_MAX_MEAN_WORD_LEN = 5.1
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_DUP2_FRAC = 0.06


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher/MassiveText-style quality rule battery (Rae et al. 2021,
    arXiv:2112.11446 §A.1.1): the standard pre-training document
    filter, emitted as per-rule booleans plus the conjunction, so a
    pipeline can both FILTER (keep) and AUDIT (which rule fired, at
    what rate per source — the reporting loop every curation run
    needs). Rules, with thresholds pinned as module constants:

    - ``r_word_count``: word count within [min, max];
    - ``r_word_len``: mean word length within [min, max] (screens
      encoding garbage / symbol soup);
    - ``r_stopwords``: at least N stopword occurrences (the "is it
      natural language at all" test);
    - ``r_repetition``: duplicate word-2-gram fraction at or below
      the cap (looping/boilerplate text).

    ``carry_cols`` pass through untouched (e.g. ``source`` for the
    per-source audit rollup) — still one projection, no join-back.

    Shape: ONE zero-shuffle projection of per-row array expressions —
    the same staged-projection discipline as repetition_metrics
    (tokens once, grams once; higher-order folds are CodegenFallback
    with no subexpression reuse, so each expensive array is built in
    its own select and referenced by name). Ratios are rounded at 1e-6
    BEFORE threshold comparison, and the oracle compares the same
    rounded values — a last-ulp division difference between engines
    cannot flip a rule verdict."""
    from lion_parcel_etl_spark.operators.dedup import tokens

    carry = list(carry_cols or [])
    staged = docs.select(
        F.col(id_col), *carry, tokens(F.col(text_col)).alias("__toks")
    )
    staged = staged.select(
        id_col,
        *carry,
        F.col("__toks"),
        word_ngrams(F.col("__toks"), 2).alias("__g2"),
    )
    toks, g2 = F.col("__toks"), F.col("__g2")
    # size(NULL) is -1 with ANSI off (the token_count hazard): a
    # NULL-text doc must report NULL counts — and NULL rule verdicts —
    # not -1s that read as a scored failure. The oracle's len(NULL)
    # does the same.
    n_words = F.when(toks.isNotNull(), F.size(toks)).cast("long")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_len = F.when(
        n_words > 0, F.round(total_chars.cast("double") / n_words, 6)
    ).otherwise(F.lit(0.0))
    stop_hits = F.when(
        toks.isNotNull(),
        F.size(F.filter(toks, lambda w: w.isin(*EN_STOPWORDS))),
    ).cast("long")
    dup2 = F.when(
        F.size(g2) > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2).cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))
    out = staged.select(
        F.col(id_col),
        *carry,
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        dup2.alias("dup2_frac"),
    )
    out = out.select(
        "*",
        ((F.col("n_words") >= GOPHER_MIN_WORDS)
         & (F.col("n_words") <= GOPHER_MAX_WORDS)).alias("r_word_count"),
        ((F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
         & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)).alias("r_word_len"),
        (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS).alias("r_stopwords"),
        (F.col("dup2_frac") <= GOPHER_MAX_DUP2_FRAC).alias("r_repetition"),
    )
    return out.withColumn(
        "keep",
        F.col("r_word_count") & F.col("r_word_len")
        & F.col("r_stopwords") & F.col("r_repetition"),
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge table to tokenize text — the
    inference half of the tokenizer loop whose training half is
    :func:`bpe_merges`. Merges apply in RANK order (merge 1
    everywhere, then merge 2, ... — the Sennrich/GPT-2 convention),
    each as the same greedy left-to-right :func:`_bpe_merge_step`
    array fold used during training.

    Shape — encode the VOCABULARY, not the token stream: the folds run
    once per DISTINCT word (Zipf: vocabulary ≪ token occurrences),
    then a keyed join maps every occurrence to its piece sequence and
    one per-doc regroup (collect_list sorted by token position)
    reassembles the document. Measured 4× faster than folding every
    occurrence inline at sf0.1 (1.1 s vs 4.2 s warm), and the gap IS
    the vocabulary/token ratio, so it widens with corpus size. The
    join is AQE's choice (broadcast while the piece table fits, keyed
    shuffle beyond); the regroup shuffles (doc, pos, pieces) — bounded
    by corpus token bytes. Empty and null-token docs survive via the
    outer explode (they emit an empty piece list, not a dropped row).

    Returns (id, n_pieces, pieces) with ``pieces`` the space-joined
    symbol sequence — deterministic, layout-independent, and
    SQL-replayable by unrolling the same folds."""
    from lion_parcel_etl_spark.operators.dedup import tokens

    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    tw = toked.select(
        id_col, F.posexplode_outer("__toks").alias("pos", "w")
    )
    vocab = tw.select("w").where(F.col("w").isNotNull()).distinct()
    syms = F.split("w", "")
    for left, right in merges:
        syms = _bpe_merge_step(syms, left, right)
    enc = vocab.select("w", syms.alias("__p"))
    entries = F.when(
        F.col("pos").isNotNull(), F.struct(F.col("pos"), F.col("__p"))
    )
    per = (
        tw.join(enc, "w", "left")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(entries)).getField("__p")
            ).alias("__pieces")
        )
    )
    return per.select(
        id_col,
        F.size("__pieces").cast("long").alias("n_pieces"),
        F.array_join("__pieces", " ").alias("pieces"),
    )


HASHED_EMB_DIMS = 64


def hashed_embedding(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = HASHED_EMB_DIMS,
) -> DataFrame:
    """Feature-hashed bag-of-words document embeddings (the hashing
    trick, Weinberger et al. 2009): token w adds sign(w) to dimension
    h(w) mod dims, then the vector is L2-normalized — a deterministic,
    model-free featurizer that bridges the text corpus into the ANN /
    dedup / clustering family (cosine on these vectors approximates
    token-multiset similarity). Hash and sign come from one md5 per
    token (hex 1-15 → dimension, hex 16 parity → sign), so the oracle
    replays every bit.

    Shape: explode + two codegen hash aggregates. Tokens explode to
    (id, dim, sign) cells, groupBy(id, dim) sums signs (map-side
    partial agg collapses each doc to ≤dims cells per partition, so
    the exchange carries at most docs×dims compact rows — bounded by
    the query's OWN output size, never the token stream), then a
    per-doc map + dense sequence explode emits all dims with zeros
    filled in. Per-row work is O(L) inside whole-stage codegen; the
    previously-pinned zero-shuffle fold shape (rebuild a dims-sized
    accumulator per token) is O(L·D) in a CodegenFallback higher-order
    function and MEASURED SLOWER at D=64 already: 1.68 s vs 1.15 s at
    sf0.1 isolated — interpreted per-token array rebuilds cost more
    than two exchanges of output-sized cell rows, and the gap widens
    with D. Sums of ±1.0 in doubles are exact, so the two shapes are
    bit-identical (verified cell-for-cell at sf0.1). Null-text docs
    are dropped by a cheap staged filter (matching the old outer-
    generate semantics); empty docs keep their all-zero vector via
    explode_outer. Output is long form (id, dim, value), values
    rounded at 1e-6 — the engine's fold tolerance."""
    from lion_parcel_etl_spark.operators.dedup import tokens

    staged = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .filter(F.col("__toks").isNotNull())
    )
    # one md5 per token: hash in its own transform, derive (dim, sign)
    # from the HEX STRING after the explode — an inline F.md5(w) in
    # both the dim and sign branches would run twice per token
    # (higher-order transforms are CodegenFallback with no
    # subexpression reuse)
    hexed = staged.select(
        id_col,
        F.transform(F.col("__toks"), lambda w: F.md5(w)).alias("__hex"),
    )
    # explode_OUTER: a plain explode triggers InferFiltersFromGenerate,
    # whose (size > 0 AND isnotnull) condition is pushed below the
    # projection with alias substitution — re-inlining the transform
    # chain into a per-row Filter. Outer semantics make the inference
    # illegal; empty docs keep one null-hash row that the map-entry
    # guard below excludes, leaving them an empty map (zero vector).
    cells = hexed.select(id_col, F.explode_outer("__hex").alias("__h")).select(
        id_col,
        F.pmod(
            F.conv(F.substring("__h", 1, 15), 16, 10).cast("bigint"),
            F.lit(dims),
        ).cast("int").alias("dim"),
        F.when(
            F.conv(F.substring("__h", 16, 1), 16, 10).cast("int") % 2 == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)).alias("sign"),
    )
    per_cell = cells.groupBy(id_col, "dim").agg(F.sum("sign").alias("__v"))
    per_doc = per_cell.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("dim").isNotNull(), F.struct("dim", "__v"))
            )
        ).alias("__m")
    )
    # the norm fold runs over ≤dims map values per doc — interpreted,
    # but O(D) per doc, not O(L·D); staged so the division below does
    # not re-run it per output element
    with_norm = per_doc.select(
        id_col,
        "__m",
        F.sqrt(
            F.aggregate(
                F.map_values("__m"), F.lit(0.0), lambda a, x: a + x * x
            )
        ).alias("__norm"),
    )
    dense = with_norm.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("pos"),
        "__m",
        "__norm",
    )
    return dense.select(
        id_col,
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(
            F.when(
                F.col("__norm") > 0,
                F.coalesce(F.col("__m")[F.col("pos")], F.lit(0.0))
                / F.col("__norm"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("value"),
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    compact_hashes: bool = False,
) -> DataFrame:
    """Per-document n-gram novelty / commonness profile: for each
    document's DISTINCT word ``n``-grams, how many other documents
    share them. Emits the novelty fraction (share of the doc's
    n-grams appearing in NO other document — high = original text,
    low = boilerplate or near-copy), the mean document frequency of
    its n-grams, and the worst-case (max) document frequency. The
    memorization-risk complement of span dedup: a doc can dodge
    16-token exact windows yet still score low novelty.

    Scale shape: n-grams are md5-hashed per row before the first
    exchange (shuffle carries (hash, doc) pairs only, map-side
    distinct), the document-frequency aggregate is output-bounded by
    the distinct n-gram vocabulary, and the join back to (hash, doc)
    is an equi-join on the hash both sides are already partitioned
    by. Per-doc stats then group on the doc id. No step is
    corpus-quadratic; nothing but hashes and counts ever shuffles.
    """
    from lion_parcel_etl_spark.operators.dedup import tokens

    toked = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )
    # Hash width is the shuffle knob: the exchanged (hash, doc) table
    # dominates cost. ``compact_hashes`` folds the gram to a 60-bit
    # BIGINT — measured at the 100k-doc smoke: 507 → 206 MB shuffled
    # and 15.2 → 7.7 s — at a collision risk of ~n²/2^61 expected
    # colliding gram pairs (≈0.4M at 10^12 distinct grams: noise for
    # a profile metric, which is why it is the recommended
    # corpus-scale setting; the md5 default stays collision-free for
    # oracle-exact runs).
    gram_hash = (
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("bigint")
        if compact_hashes
        else F.md5("g")
    )
    grams = (
        toked.select(
            "doc", F.explode(word_ngrams(F.col("__toks"), n)).alias("g")
        )
        .select("doc", gram_hash.alias("h"))
        .distinct()
    )
    df_counts = grams.groupBy("h").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    return (
        grams.join(df_counts, "h")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.round(
                F.avg(F.when(F.col("doc_freq") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novel_frac"),
            F.round(F.avg("doc_freq"), 6).alias("mean_df"),
            F.max("doc_freq").alias("max_df"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_ngrams",
            "novel_frac",
            "mean_df",
            "max_df",
        )
    )


def mlm_mask(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_pct: int = 15,
    salt: str = "",
) -> DataFrame:
    """Deterministic masked-language-model example construction: mask
    ``rate_pct`` % of each document's tokens (BERT-style MLM inputs),
    choosing positions by a content-free md5 draw over
    (doc, position, salt) — so the mask set is reproducible across
    runs, partitionings and engines, and re-salting draws an
    independent masking epoch. Emits the masked token stream, the
    supervision labels as a ``pos:token`` list (1-based positions),
    and the token/mask counts.

    Scale shape: zero shuffle — one pure per-row array expression
    over the token array (positions via a guarded ``sequence``, mask
    decision per position from md5), embarrassingly parallel and
    append-stable. The label list stays inside the row; nothing
    global is consulted.
    """
    from lion_parcel_etl_spark.operators.dedup import tokens

    toked = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    ).withColumn(
        # size(NULL) is -1 under legacy (non-ANSI) semantics — null
        # text needs the explicit isNull branch, not coalesce.
        "__n",
        F.when(F.col("__toks").isNull(), F.lit(0))
        .otherwise(F.size("__toks"))
        .cast("int"),
    )
    positions = F.when(
        F.col("__n") > 0, F.sequence(F.lit(1), F.col("__n"))
    ).otherwise(F.array().cast("array<int>"))

    def is_masked(i: Column) -> Column:
        from lion_parcel_etl_spark.operators.dedup import hash32

        key = F.concat_ws(
            ":", F.lit("mlm"), F.col("doc").cast("string"), i.cast("string"), F.lit(salt)
        )
        return (hash32(key) % 100) < rate_pct

    masked = F.transform(
        positions,
        lambda i: F.when(is_masked(i), F.lit("[MASK]")).otherwise(
            F.element_at(F.col("__toks"), i)
        ),
    )
    labels = F.transform(
        F.filter(positions, is_masked),
        lambda i: F.concat_ws(
            ":", i.cast("string"), F.element_at(F.col("__toks"), i)
        ),
    )
    return toked.select(
        F.col("doc").alias(id_col),
        F.array_join(masked, " ").alias("masked_text"),
        F.array_join(labels, "; ").alias("labels"),
        F.col("__n").cast("long").alias("n_tokens"),
        F.size(labels).cast("long").alias("n_masked"),
    )


def clm_examples(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Causal-LM example construction — the next-token twin of
    :func:`mlm_mask`: slide a fixed ``ctx``-token context window over
    each document at ``stride`` and emit (context, target-token)
    supervision pairs, the classic eager-materialization layout for
    LM training/eval batches. Window ``w`` starts at token
    ``w*stride + 1`` and must leave one target token after the
    context, so a doc yields ``floor((n_tokens - ctx - 1)/stride) + 1``
    examples (none when ``n_tokens <= ctx``).

    Scale shape: zero shuffle — a guarded position range and one
    posexplode of per-row array expressions; output rows ∝ corpus
    tokens / stride. Deterministic and partition-independent.
    """
    from lion_parcel_etl_spark.operators.dedup import tokens

    toked = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    ).withColumn(
        "__n",
        F.when(F.col("__toks").isNull(), F.lit(0))
        .otherwise(F.size("__toks"))
        .cast("int"),
    )
    n_ex = F.floor((F.col("__n") - F.lit(ctx + 1)) / F.lit(stride)) + 1
    windows = F.when(
        F.col("__n") > ctx, F.sequence(F.lit(0), (n_ex - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    start = lambda w: w * F.lit(stride)  # noqa: E731  0-based token offset
    examples = F.transform(
        windows,
        lambda w: F.struct(
            F.concat_ws(
                " ", F.slice(F.col("__toks"), (start(w) + 1).cast("int"), ctx)
            ).alias("context"),
            F.element_at(
                F.col("__toks"), (start(w) + ctx + 1).cast("int")
            ).alias("target"),
        ),
    )
    return toked.select(
        F.col("doc").alias(id_col),
        F.posexplode(examples).alias("example_id", "ex"),
    ).select(
        id_col,
        F.col("example_id").cast("long").alias("example_id"),
        F.col("ex.context").alias("context"),
        F.col("ex.target").alias("target"),
    )

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators.text import (
    analyze_documents,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

TD = "/root/testdata/sf0.001"


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("  leading and trailing  ",), (None,)], "text string"
    )
    out = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    assert out == [3, 0, 3, None]


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("der hund ist nicht in das haus",),
            ("el perro es de la casa que los gatos",),
            ("xyzzy plugh qwerty",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert out == ["en", "de", "es", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is in the yard " * 20,), ("!!!???...",), ("x",)],
        "text string",
    )
    out = [r[0] for r in df.select(quality_score(F.col("text"))).collect()]
    assert all(0.0 <= v <= 1.0 for v in out)
    assert out[0] > out[1]  # long clean prose beats punctuation soup


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], "text string"
    )
    out = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]
    assert out[0] == out[1] != out[2]


@pytest.mark.skipif(not os.path.isdir(TD), reason="testdata missing")
def test_analyze_documents_single_projection(spark):
    docs = spark.read.parquet(f"{TD}/documents.parquet")
    out = analyze_documents(docs)
    assert {"n_tokens", "lang_guess", "quality", "fingerprint"} <= set(out.columns)
    assert out.count() == docs.count()
    # whole plan is a single codegen'd projection: no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_topk_math_and_ordering(spark):
    from lion_parcel_etl_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, top_n=2).collect()
    got = {(r.doc_id, r.rnk): (r.term, r.tfidf) for r in out}
    import math

    def idf(df, n=3):
        return math.log((n + 1) / (df + 1)) + 1

    # doc 1: apple tf=2 df=1; banana tf=1 df=2
    assert got[(1, 1)][0] == "apple"
    assert abs(got[(1, 1)][1] - round(2 * idf(1), 6)) < 1e-9
    assert got[(1, 2)][0] == "banana"
    # doc 3: cherry tf=3 df=2 beats durian tf=1 df=1
    assert got[(3, 1)][0] == "cherry"
    # every doc emits at most top_n rows, ranks contiguous from 1
    from collections import Counter

    per_doc = Counter(r.doc_id for r in out)
    assert all(v <= 2 for v in per_doc.values())


def test_bm25_rank_prefers_matching_docs(spark):
    from lion_parcel_etl_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark join filter"),
            (3, "filter scan merge"),
            (4, "totally unrelated words only"),
        ],
        "doc_id long, text string",
    )
    out = bm25_rank(docs, ["spark"], top_n=10).collect()
    ids = [r.doc_id for r in out]
    # only docs containing a query term are ranked; higher tf wins
    assert set(ids) == {1, 2}
    assert ids[0] == 1 and out[0].rnk == 1
    assert out[0].score > out[1].score


def test_bm25_query_term_filter_prunes_before_shuffle(spark):
    """The scale contract: the term filter must sit under the first
    aggregation (map-side prune), not after a shuffle of all tokens."""
    from lion_parcel_etl_spark.operators.bucketing import plan_string
    from lion_parcel_etl_spark.operators.text import bm25_rank

    import re

    docs = spark.createDataFrame([(1, "spark x")], "doc_id long, text string")
    plan = plan_string(bm25_rank(docs, ["spark"]))
    # node ids number bottom-up: the Filter whose condition tests the
    # term column must have a LOWER id than every Exchange — i.e. it
    # runs in the scan/generate stage, before anything shuffles
    term_filters = [
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) Filter\nInput.*\nCondition : .*term#", plan)
    ]
    exchanges = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) Exchange", plan)]
    assert term_filters and exchanges
    assert min(term_filters) < min(exchanges)


def test_redact_pii_replaces_and_counts(spark):
    from lion_parcel_etl_spark.operators.text import redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.org and 555-123-4567 from 192.168.0.1"),
            (2, "no pii here at all"),
            (3, "two mails p@q.io r@s.com"),
        ],
        "id long, text string",
    )
    red, n = redact_pii(F.col("text"))
    got = {r.id: (r.red, r.n) for r in df.select("id", red.alias("red"), n.alias("n")).collect()}
    assert got[1] == ("mail <EMAIL> and <PHONE> from <IP>", 3)
    assert got[2] == ("no pii here at all", 0)
    assert got[3] == ("two mails <EMAIL> <EMAIL>", 2)


def test_redact_pii_overlapping_patterns_count_replacements(spark):
    """A phone embedded in an email's local part is consumed by the
    email replacement — it must count ONCE, not twice (counts run on
    the progressively-redacted text)."""
    from lion_parcel_etl_spark.operators.text import redact_pii

    df = spark.createDataFrame([(1, "reach me: 555-123-4567@corp.com")], "id long, text string")
    red, n = redact_pii(F.col("text"))
    r = df.select(red.alias("red"), n.alias("n")).first()
    assert r.red == "reach me: <EMAIL>"
    assert r.n == 1


def test_compression_ratio_orders_texts_sensibly(spark):
    from lion_parcel_etl_spark.operators.text import compression_ratio

    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(2000))
    rows = [
        (1, "abc " * 500),          # highly repetitive
        (2, noise),                 # incompressible noise
        (3, None),                  # null text -> null ratio
        (4, ""),                    # empty -> null ratio
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
    assert out[1] < 0.05                 # template text crushes
    assert out[2] > 0.8                  # noise does not
    assert out[3] is None and out[4] is None
    # deterministic across runs
    again = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
    assert out == again


def test_repetition_metrics_hand_computed(spark):
    from lion_parcel_etl_spark.operators.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            # tokens a b a b a b: bigrams [ab,ba,ab,ba,ab] -> top 3/5;
            # trigrams [aba,bab,aba,bab] -> 2 distinct of 4 -> 0.5
            (1, "a b a b a b"),
            # 12 distinct tokens: every gram unique
            (2, "q w e r t y u i o p a s"),
            (3, ""),  # no tokens -> zeros, not flagged
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert rows[1].top2_mass == 0.6 and rows[1].dup3_frac == 0.5 and rows[1].flagged
    assert rows[2].top2_mass == round(1 / 11, 6) and rows[2].dup3_frac == 0.0
    assert not rows[2].flagged
    assert rows[3].top2_mass == 0.0 and rows[3].dup3_frac == 0.0 and not rows[3].flagged


def test_zh_lang_id_actually_matches(spark):
    from lion_parcel_etl_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [("我 是 的 在",), ("the cat is on the mat and happy",), (None,)],
        "text string",
    )
    got = [r.g for r in df.select(lang_id(F.col("text")).alias("g")).collect()]
    assert got[0] == "zh" and got[1] == "en"


def test_quality_score_null_text_is_zero(spark):
    from lion_parcel_etl_spark.operators.text import quality_score

    df = spark.createDataFrame([(None,), ("",)], "text string")
    got = [r.q for r in df.select(quality_score(F.col("text")).alias("q")).collect()]
    assert got[0] == 0.0
    assert got[1] is not None and got[1] <= 0.4  # empty string: punct score only


def test_bpe_merge_step_greedy_nonoverlap(spark):
    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.operators.text import _bpe_merge_step

    df = spark.createDataFrame([("aabab",), ("abab",), ("aaa",), ("b",)], ["w"])
    out = df.select(_bpe_merge_step(F.split("w", ""), "a", "b").alias("m")).collect()
    assert [r["m"] for r in out] == [["a", "ab", "ab"], ["ab", "ab"], ["a", "a", "a"], ["b"]]
    out2 = df.select(_bpe_merge_step(F.split("w", ""), "a", "a").alias("m")).collect()
    assert out2[2]["m"] == ["aa", "a"]  # merged token never re-matches its own output


def test_bpe_merges_matches_python_reference(spark):
    """The learned merge sequence equals a sequential Python BPE
    trainer (overlapping pair counts weighted by word frequency,
    lexical tie-break, greedy non-overlapping application)."""
    from lion_parcel_etl_spark.operators.text import bpe_merges

    corpus = ["low low lower lowest", "newer newer new", "low newer"]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])

    words: dict[str, int] = {}
    for t in corpus:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    seqs = {w: list(w) for w in words}

    def learn_one():
        counts: dict[tuple, int] = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + words[w]
        if not counts:
            return None
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        for w, syms in seqs.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            seqs[w] = out
        return (a, b, c)

    want = []
    for step in range(1, 5):
        m = learn_one()
        want.append((step, m[0], m[1], m[2]))

    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merges(df, "text", k_merges=4).orderBy("step").collect()
    ]
    assert got == want


def test_bpe_merges_early_stop_on_exhausted_pairs(spark):
    from lion_parcel_etl_spark.operators.text import bpe_merges

    df = spark.createDataFrame([("a b c",)], ["text"])  # 1-char words: no pairs
    assert bpe_merges(df, "text", k_merges=3).count() == 0


def test_gopher_rules_battery(spark):
    from lion_parcel_etl_spark.operators.text import gopher_rules

    good = " ".join(f"tok{i:02d}" for i in range(40)) + " the is a"  # 43 words
    short = "the tiny doc is here"  # 5 words -> word_count fails
    longdoc = "the word count here runs long " + "token " * 95  # >90 words
    symbols = " ".join(["zz"] * 30) + " the is"  # mean len ~2 -> word_len fails
    nostop = " ".join(f"w{i:04d}xx" for i in range(40))  # no stopwords
    looped = "the cat sat " * 20 + "on a mat and it is fine"  # dup2 high
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([good, short, longdoc, symbols, nostop, looped])],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["r_word_count"] is False and rows[1]["keep"] is False
    assert rows[2]["r_word_count"] is False
    assert rows[3]["r_word_len"] is False
    assert rows[4]["r_stopwords"] is False
    assert rows[5]["r_repetition"] is False and rows[5]["keep"] is False
    # verdict is the conjunction of the rule columns, row by row
    for r in rows.values():
        assert r["keep"] == (
            r["r_word_count"] and r["r_word_len"]
            and r["r_stopwords"] and r["r_repetition"]
        )


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from lion_parcel_etl_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(0, "xxxx abab ba x"), (1, "")],
        "doc_id long, text string",
    )
    # rank order matters: (x,x) first makes xx from xxxx; then (a,b)
    # pairs abab into [ab, ab]; (ab,ab) merges those into one piece
    out = {
        r["doc_id"]: r.asDict()
        for r in bpe_encode(
            df, [("x", "x"), ("a", "b"), ("ab", "ab")]
        ).collect()
    }
    assert out[0]["pieces"] == "xx xx abab b a x"
    assert out[0]["n_pieces"] == 6
    assert out[1]["n_pieces"] == 0 and out[1]["pieces"] == ""


def test_hashed_embedding_unit_norm_and_determinism(spark):
    from collections import defaultdict

    from lion_parcel_etl_spark.operators.text import hashed_embedding

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # identical text
            (3, "Alpha  BETA gamma   delta"),  # tokenization normalizes
            (4, ""),                          # empty -> zero vector
            (5, None),                        # null text -> doc dropped
        ],
        "doc_id long, text string",
    )
    vecs = defaultdict(dict)
    for r in hashed_embedding(df).collect():
        vecs[r["doc_id"]][r["dim"]] = r["value"]
    assert 5 not in vecs
    assert all(len(v) == 64 for v in vecs.values())
    assert vecs[1] == vecs[2] == vecs[3]
    assert all(v == 0.0 for v in vecs[4].values())
    for d in (1, 2, 3):
        assert abs(sum(x * x for x in vecs[d].values()) - 1.0) < 1e-4


class TestNgramNovelty:
    def test_novelty_fractions(self, spark):
        from lion_parcel_etl_spark.operators.text import ngram_novelty

        shared = "one two three four five six seven eight"
        df = spark.createDataFrame(
            [
                (1, shared),                      # one 8-gram, shared with 2
                (2, shared),
                (3, "alpha beta gamma delta epsilon zeta eta theta"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in ngram_novelty(df, n=8).collect()}
        assert out[1].n_ngrams == 1 and out[1].novel_frac == 0.0
        assert out[1].max_df == 2
        assert out[3].novel_frac == 1.0 and out[3].mean_df == 1.0

    def test_short_docs_absent(self, spark):
        from lion_parcel_etl_spark.operators.text import ngram_novelty

        df = spark.createDataFrame(
            [(1, "too short"), (2, "a b c d e f g h")],
            "doc_id long, text string",
        )
        ids = [r.doc_id for r in ngram_novelty(df, n=8).collect()]
        assert ids == [2]


class TestMlmMask:
    def test_deterministic_and_rate_bounded(self, spark):
        from lion_parcel_etl_spark.operators.text import mlm_mask

        rows = [(i, " ".join(f"tok{j}" for j in range(50))) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {r.doc_id: r for r in mlm_mask(df, rate_pct=15).collect()}
        b = {r.doc_id: r for r in mlm_mask(df, rate_pct=15).collect()}
        assert a == b  # deterministic across runs
        total = sum(r.n_masked for r in a.values())
        n = sum(r.n_tokens for r in a.values())
        assert 0.08 * n < total < 0.22 * n  # ~15% of 1000 draws
        # labels reconstruct the original tokens at masked positions
        r = a[0]
        toks = r.masked_text.split(" ")
        for lab in filter(None, r.labels.split("; ")):
            pos, tok = lab.split(":")
            assert toks[int(pos) - 1] == "[MASK]"
            assert tok == f"tok{int(pos) - 1}"

    def test_salt_draws_independent_epoch(self, spark):
        from lion_parcel_etl_spark.operators.text import mlm_mask

        df = spark.createDataFrame(
            [(1, " ".join(f"w{j}" for j in range(100)))],
            "doc_id long, text string",
        )
        a = mlm_mask(df, rate_pct=15, salt="e1").collect()[0]
        b = mlm_mask(df, rate_pct=15, salt="e2").collect()[0]
        assert a.labels != b.labels

    def test_null_text(self, spark):
        from lion_parcel_etl_spark.operators.text import mlm_mask

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        r = mlm_mask(df).collect()[0]
        assert r.n_tokens == 0 and r.masked_text == "" and r.labels == ""


def test_ngram_novelty_compact_hashes_matches_md5(spark, sf_dir):
    from lion_parcel_etl_spark.operators.text import ngram_novelty

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(
        map(tuple, ngram_novelty(docs).collect())
    )
    b = sorted(
        map(tuple, ngram_novelty(docs, compact_hashes=True).collect())
    )
    assert a == b  # 60-bit folding collision-free at this scale


class TestClmExamples:
    def test_window_layout_and_targets(self, spark):
        from lion_parcel_etl_spark.operators.text import clm_examples

        toks = [f"t{i}" for i in range(15)]
        df = spark.createDataFrame(
            [(1, " ".join(toks))], "doc_id long, text string"
        )
        out = sorted(
            clm_examples(df, ctx=8, stride=4).collect(),
            key=lambda r: r.example_id,
        )
        # n=15 → floor((15-9)/4)+1 = 2 examples at starts 0 and 4
        assert len(out) == 2
        assert out[0].context == " ".join(toks[0:8])
        assert out[0].target == "t8"
        assert out[1].context == " ".join(toks[4:12])
        assert out[1].target == "t12"

    def test_short_and_null_docs_yield_nothing(self, spark):
        from lion_parcel_etl_spark.operators.text import clm_examples

        df = spark.createDataFrame(
            [(1, "a b c"), (2, None), (3, " ".join("x" * 1 for _ in range(8)))],
            "doc_id long, text string",
        )
        # 8 tokens = exactly ctx → no room for a target
        assert clm_examples(df, ctx=8, stride=4).count() == 0

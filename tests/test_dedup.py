from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra token"),  # near dup
        (4, "completely different words here about spark engines and shuffles"),
        (5, "another unrelated document mentioning joins aggregates and windows"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").orderBy("keep_id").collect()
    groups = {r.keep_id: r.n_docs for r in out}
    assert groups[1] == 2  # docs 1 and 2 identical
    assert groups[3] == 1 and groups[4] == 1 and groups[5] == 1


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert found[(1, 2)] == 1.0
    assert (1, 3) in found and 0.5 <= found[(1, 3)] < 1.0
    assert not any({a, b} & {4, 5} and {a, b} != {4, 5} for a, b in found)


def test_minhash_agrees_with_exact(spark, docs):
    mh = minhash_near_dup(docs, "doc_id", "text", threshold=0.5).collect()
    mh_pairs = {(r.id_a, r.id_b) for r in mh}
    assert (1, 2) in mh_pairs and (1, 3) in mh_pairs
    # verification step reports the exact jaccard
    for r in mh:
        assert r.jaccard >= 0.5


def test_minhash_signature_shape(spark, docs):
    sig = docs.select(minhash_signature(F.col("text")).alias("s")).first()["s"]
    assert len(sig) == 16 and all(v >= 0 for v in sig)


def test_simhash_near_dup(spark, docs):
    sh = {r.doc_id: r.s for r in docs.select("doc_id", simhash(F.col("text")).alias("s")).collect()}
    assert sh[1] == sh[2]
    pairs = {(r.id_a, r.id_b) for r in simhash_near_dup(docs, "doc_id", "text", max_hamming=6).collect()}
    assert (1, 2) in pairs


@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.001"), reason="testdata missing")
def test_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = exact_dedup(docs, "doc_id", "text")
    assert out.count() > 0
    # digest cardinality == distinct text cardinality
    assert out.count() == docs.select("text").distinct().count()


def test_connected_components_chain_and_singleton(spark):
    from lion_parcel_etl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 10)], ["src", "dst"]
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    # chain 1-2-3-4 collapses to min label 1 (multi-round propagation)
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    # 10-11 + 20-10 is one component with min 10
    assert comp[10] == comp[11] == comp[20] == 10


def test_connected_components_is_transitive_closure(spark, docs):
    from lion_parcel_etl_spark.operators.dedup import connected_components

    pairs = minhash_near_dup(docs, "doc_id", "text", threshold=0.5)
    comp = {r.node: r.component for r in connected_components(pairs, "id_a", "id_b").collect()}
    # every paired node got a label; labels are component minima
    for r in pairs.collect():
        assert comp[r.id_a] == comp[r.id_b]
        assert comp[r.id_a] <= min(r.id_a, r.id_b)


@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.001"), reason="testdata missing")
def test_minhash_parameterized_recall_vs_exact(spark):
    """Both parameter shapes against ground truth on real documents:
    precision is 1.0 by construction (exact-Jaccard verification), and
    the corpus shape (k=64, bands=16: same rows-per-band, 4x bands)
    must not lose recall vs the oracle shape (k=16, bands=4)."""
    from lion_parcel_etl_spark.operators.dedup import (
        MINHASH_BANDS_CORPUS,
        MINHASH_K_CORPUS,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = 0.3
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=t).collect()
    }
    assert exact, "ground truth must be non-empty for the recall test to mean anything"

    def pairs(k, bands):
        got = minhash_near_dup(docs, "doc_id", "text", k=k, bands=bands, threshold=t).collect()
        assert all(r.jaccard >= t for r in got)  # precision 1.0
        return {(r.id_a, r.id_b) for r in got}

    small = pairs(16, 4)
    big = pairs(MINHASH_K_CORPUS, MINHASH_BANDS_CORPUS)
    assert small <= exact and big <= exact
    recall_small = len(small) / len(exact)
    recall_big = len(big) / len(exact)
    assert recall_big >= recall_small
    assert recall_big >= 0.8


def test_minhash_coeffs_prefix_stable():
    from lion_parcel_etl_spark.operators.dedup import MINHASH_COEFFS, minhash_coeffs

    assert minhash_coeffs(64)[:16] == MINHASH_COEFFS
    assert len(set(minhash_coeffs(64))) == 64


def test_minhash_rejects_indivisible_bands(spark, docs):
    with pytest.raises(ValueError):
        minhash_near_dup(docs, "doc_id", "text", k=16, bands=5)


def test_connected_components_long_chain_pointer_doubling(spark):
    """A 400-hop path graph: plain min-label propagation needs ~400
    rounds (far beyond max_iter=25) — pointer doubling must converge
    within the default budget and label every node with the chain's
    minimum."""
    from lion_parcel_etl_spark.operators.dedup import connected_components

    n = 400
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    # threshold 0 forces the DISTRIBUTED rounds — the small-graph gate
    # would otherwise route this fixture through driver union-find and
    # leave the pointer-doubling loop untested
    got = {
        r.node: r.component
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    assert len(got) == n + 1
    assert set(got.values()) == {0}
    # and the fast path agrees on the same graph
    fast = {r.node: r.component for r in connected_components(edges).collect()}
    assert fast == got


@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.001"), reason="testdata missing")
def test_minhash_incremental_matches_full_run(spark):
    """Incremental dedup against a persisted signature store must find
    exactly the full-run pairs that touch a new doc — old x old pairs
    are the store's business, not the batch's."""
    from lion_parcel_etl_spark.operators.dedup import (
        minhash_near_dup_incremental,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter("doc_id % 4 != 0")
    new = docs.filter("doc_id % 4 = 0")
    t = 0.3

    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup(docs, "doc_id", "text", threshold=t).collect()
    }
    expected = {p: j for p, j in full.items() if p[0] % 4 == 0 or p[1] % 4 == 0}
    assert expected, "split must produce cross pairs for the test to bite"

    store = minhash_signatures(old, "doc_id", "text")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup_incremental(
            store, new, "doc_id", "text", threshold=t
        ).collect()
    }
    assert got == expected


def test_minhash_incremental_store_never_shuffles(spark):
    """Plan contract: the batch's bands broadcast; no shuffle Exchange
    feeds the candidate join (the store side streams)."""
    from lion_parcel_etl_spark.operators.bucketing import plan_string
    from lion_parcel_etl_spark.operators.dedup import (
        minhash_near_dup_incremental,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} common text tokens here for shingles today ok") for i in range(8)],
        "doc_id long, text string",
    )
    store = minhash_signatures(docs.filter("doc_id < 6"), "doc_id", "text")
    out = minhash_near_dup_incremental(store, docs.filter("doc_id >= 6"), "doc_id", "text")
    plan = plan_string(out)
    assert "BroadcastHashJoin" in plan


def test_edit_distance_pairs_complete_vs_brute_force(spark):
    from lion_parcel_etl_spark.operators.dedup import edit_distance_pairs

    names = [
        "alpha", "alphb", "alph", "alphas",  # subst / delete / insert of alpha
        "beta", "betz", "gamma", "gamm", "gxmma",
        "x", "y", "",  # tiny strings; "" vs 1-char = distance 1
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "id", "name").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j, lev(a, b))
        for (i, a) in rows
        for (j, b) in rows
        if i < j and lev(a, b) <= 1
    }
    assert got == want


def test_contamination_flags_exact_overlap_semantics(spark):
    from lion_parcel_etl_spark.operators.dedup import contamination_flags

    ev = spark.createDataFrame(
        [(0, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox sleeps"),   # shares 2 shingles
            (11, "a totally different sentence"), # shares none
            (12, "quick brown fox"),              # shares 1 (whole text)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_shared, r.contaminated)
           for r in contamination_flags(corpus, ev, "doc_id", "text").collect()}
    assert out[10] == (2, True)
    assert out[11] == (0, False)
    assert out[12] == (1, True)
    assert set(out) == {10, 11, 12}  # every corpus doc reported


def test_duplicate_spans_finds_shared_passage_only(spark):
    from lion_parcel_etl_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 x y"),
            (2, "head2 " + shared),
            (3, "completely different words " + " ".join(f"u{i}" for i in range(16))),
        ],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, "doc_id", "text", window=16).collect()
    # exactly one 16-token window is common to docs 1 and 2
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 2 and r.n_occ == 2 and r.doc_list == "1; 2"
    # a repeated span WITHIN one doc does not qualify (needs >= 2 docs)
    solo = spark.createDataFrame(
        [(9, shared + " mid " + shared)], "doc_id long, text string"
    )
    assert duplicate_spans(solo, "doc_id", "text", window=16).count() == 0


def test_empty_docs_do_not_explode_candidates(spark):
    """Empty/short docs share degenerate signatures (all-sentinel
    MinHash, SimHash 0) — they must not pair with each other through
    the band/quarter joins."""
    from lion_parcel_etl_spark.operators.dedup import (
        minhash_near_dup,
        simhash,
        simhash_near_dup,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "   "), (4, "real text with many words here ok")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.sh for r in docs.select(
        "doc_id", simhash(F.col("text")).alias("sh")).collect()}
    assert sigs[1] is None and sigs[3] is None and sigs[4] is not None
    assert simhash_near_dup(docs, "doc_id", "text").count() == 0
    assert minhash_near_dup(docs, "doc_id", "text").count() == 0


def test_giant_exact_cluster_exact_first_bounds_lsh_pairs(spark):
    """The documented minhash_near_dup hotspot (one giant cluster of
    byte-identical docs collides in EVERY band → quadratic candidate
    pairs): composing exact_dedup FIRST and running LSH only on the
    per-digest representatives keeps the band join's pair volume
    bounded by distinct TEXTS, and the full duplicate relation is
    recoverable exactly — within-digest pairs are jaccard 1.0 by
    construction, cross-group pairs inherit their representatives'.
    """
    from itertools import combinations

    from lion_parcel_etl_spark.operators.dedup import exact_dedup, minhash_near_dup

    giant = "the same boilerplate sentence repeated across the corpus " + " ".join(
        f"g{i}" for i in range(12)
    )
    near = giant + " trailing variation"
    distinct = [
        f"document number {i} " + " ".join(f"d{i}w{j}" for j in range(14))
        for i in range(8)
    ]
    CLUSTER = 60
    rows = [(i, giant) for i in range(CLUSTER)]
    rows += [(1000, near)]
    rows += [(2000 + i, t) for i, t in enumerate(distinct)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # naive: the identical cluster alone yields C(60,2) verified pairs
    raw = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert len(raw) >= CLUSTER * (CLUSTER - 1) // 2

    # exact-first: one representative per digest enters the band join
    groups = exact_dedup(docs, "doc_id", "text")
    reps = docs.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n_texts = len({giant, near, *distinct})
    assert reps.count() == n_texts
    rep_pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup(reps, "doc_id", "text", threshold=0.5).collect()
    }
    # pair volume bounded by distinct texts, not corpus size
    assert len(rep_pairs) <= n_texts * (n_texts - 1) // 2
    assert len(rep_pairs) < len(raw) / 100

    # reconstruct the full relation from (groups, rep_pairs)
    digest_rows = (
        docs.select(F.md5("text").alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.collect_list("doc_id").alias("ids"), F.min("doc_id").alias("rep"))
        .collect()
    )
    members = {r.rep: sorted(r.ids) for r in digest_rows}
    rebuilt = {}
    for ids in members.values():  # within-digest: all jaccard 1.0
        for a, b in combinations(ids, 2):
            rebuilt[(a, b)] = 1.0
    for (ra, rb), j in rep_pairs.items():  # cross-group: inherit rep score
        for a in members[ra]:
            for b in members[rb]:
                lo, hi = min(a, b), max(a, b)
                rebuilt[(lo, hi)] = j
    assert rebuilt == raw


def test_simhash_incremental_matches_full_run(spark):
    """The SimHash continuous-ingest path: incremental pairs against a
    persisted signature store must equal the full quarter-join run
    restricted to pairs touching a new doc."""
    from lion_parcel_etl_spark.operators.dedup import (
        simhash_near_dup,
        simhash_near_dup_incremental,
        simhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    h = 6  # loose threshold so the sf0.001 corpus yields cross pairs

    full = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup(docs, "doc_id", "text", max_hamming=h).collect()
    }
    expected = {p: d for p, d in full.items() if p[0] % 4 == 0 or p[1] % 4 == 0}
    assert expected, "split must produce cross pairs for the test to bite"

    store = simhash_signatures(docs.filter("doc_id % 4 != 0"), "doc_id", "text")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_incremental(
            store, docs.filter("doc_id % 4 = 0"), "doc_id", "text", max_hamming=h
        ).collect()
    }
    assert got == expected


def test_simhash_incremental_batch_broadcasts(spark):
    from lion_parcel_etl_spark.operators.bucketing import plan_string
    from lion_parcel_etl_spark.operators.dedup import (
        simhash_near_dup_incremental,
        simhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} common text tokens here for quarters today ok") for i in range(8)],
        "doc_id long, text string",
    )
    store = simhash_signatures(docs.filter("doc_id < 6"), "doc_id", "text")
    out = simhash_near_dup_incremental(
        store, docs.filter("doc_id >= 6"), "doc_id", "text"
    )
    plan = plan_string(out)
    assert "BroadcastHashJoin" in plan


class TestRemoveDuplicateSpans:
    def test_rewrite_removes_later_copies_keeps_first(self, spark):
        # 32 tokens = exactly two 16-token chunks; doc 11 repeats doc
        # 10's first chunk as its second chunk.
        a = " ".join(f"a{i}" for i in range(16))
        b = " ".join(f"b{i}" for i in range(16))
        c = " ".join(f"c{i}" for i in range(16))
        from lion_parcel_etl_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(
            [(10, f"{a} {b}"), (11, f"{c} {a}")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in remove_duplicate_spans(
                df, "doc_id", "text", window=16
            ).collect()
        }
        assert out[10].clean_text == f"{a} {b}"
        assert out[10].n_removed == 0
        assert out[11].clean_text == c
        assert out[11].n_removed == 1
        assert out[11].n_chunks == 2

    def test_all_chunks_removed_yields_empty_text(self, spark):
        from lion_parcel_etl_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        a = " ".join(f"x{i}" for i in range(16))
        df = spark.createDataFrame(
            [(1, a), (2, a)], "doc_id long, text string"
        )
        out = {
            r.doc_id: r
            for r in remove_duplicate_spans(
                df, "doc_id", "text", window=16
            ).collect()
        }
        # canonical first occurrence is (1, 0): doc 1 keeps, doc 2 empties
        assert out[1].clean_text == a and out[1].n_removed == 0
        assert out[2].clean_text == "" and out[2].n_removed == 1

    def test_partial_trailing_chunk_and_null_text(self, spark):
        from lion_parcel_etl_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(
            [(1, "only five little tokens here"), (2, None)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in remove_duplicate_spans(
                df, "doc_id", "text", window=16
            ).collect()
        }
        assert out[1].n_chunks == 1
        assert out[1].clean_text == "only five little tokens here"
        assert out[2].n_chunks == 0 and out[2].clean_text == ""


def test_edit_distance_pairs_block_cols_tighten_matches(spark):
    from lion_parcel_etl_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [
            (1, "smith", "US"),
            (2, "smyth", "US"),   # dist 1, same block → match
            (3, "smitt", "DE"),   # dist 1, different block → no match
            (4, "smith", None),   # null block only matches null block
            (5, "smiths", None),  # dist 1, null block → matches 4
        ],
        "id long, name string, region string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(
            df, "id", "name", block_cols=("region",)
        ).collect()
    }
    assert got == {(1, 2), (4, 5)}
    # without blocking the cross-region pair appears too
    loose = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, "id", "name").collect()
    }
    assert (1, 3) in loose and (2, 3) not in loose  # smyth↔smitt is dist 2

"""Mechanical physical-plan anti-pattern audit, shared by the
``tools/explain_audit.py`` CLI and the ``tests/test_plan_audit.py``
regression gate (so a plan regression breaks ``pytest`` instead of
waiting for a per-round judge re-run).

Flags the shapes that kill 100 TB jobs:

- ``CARTESIAN`` — CartesianProduct nodes (always accidental here),
- ``BNLJ`` — BroadcastNestedLoopJoin outside the documented allowlist
  of scalar/tiny-table fan-ins,
- ``PY_UDF_ROW_AT_A_TIME`` — BatchEvalPython (row-at-a-time Python in
  the hot path; every sanctioned Python crossing is Arrow-batched),
- ``SMJ`` — SortMergeJoin outside the two provably-necessary cases.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

# Intentional BNLJs: cosine_topk broadcasts a tiny query set;
# tfidf/bm25/histogram/dormant_customers cross-join a broadcast
# ONE-ROW stats aggregate (N, avgdl, min/max, avg balance) — a scalar
# fan-in, not a pair explosion; pq_topk cross-joins the broadcast
# 16-row PQ codebook (encode + query lookup tables); lm_surprisal
# cross-joins the broadcast ONE-ROW vocabulary size; ivf_topk_seeded
# cross-joins the broadcast 16-row seed table; heavy_hitters_exact and
# frequent_tokens cross-join the broadcast ONE-ROW total-N (threshold /
# provability guard); column_profile crosses its two ONE-ROW stat
# aggregates; ivf_topk (refined) cross-joins the broadcast 16-row
# seed/refined-centroid tables exactly like its seeded twin;
# semantic_dedup cross-joins the same broadcast 16-row seed table for
# its assignment argmax; pmi_collocations crosses its two broadcast
# ONE-ROW token/bigram totals (the lm_surprisal pattern); lm_backoff
# crosses its broadcast ONE-ROW (n_train, vsize) scalar for the
# unigram-floor tier (same pattern); knn_label_eval contains
# cosine_topk's broadcast tiny-query-set pair join (the cosine_topk
# entry, composed), as does hard_negatives (the same neighbor stage
# with a label-mismatch filter); corpus_summary crosses its three broadcast
# ONE-ROW stat aggregates (the column_profile pattern);
# temperature_mix crosses its broadcast ONE-ROW Σ n**alpha normalizer
# (the lm_surprisal scalar pattern); perplexity_buckets contains the
# lm_surprisal chain verbatim (same broadcast ONE-ROW vocabulary
# scalar), composed with a per-lang NTILE; psi_drift crosses each
# group row with the broadcast ≤(bins+2)-row baseline histogram and a
# ONE-ROW total (the column_profile pattern) to build the dense
# group×bin grid; bootstrap_ci crosses the ONE-ROW point estimate with
# the ONE-ROW order-statistic CI (two scalar aggregates, the
# column_profile pattern); kmv_overlap's pairwise
# group_a < group_b join runs over the G-row SKETCH table (k-length
# arrays, one row per source) — the all-pairs stage is the operator's
# entire point and never touches corpus-sized data; classifier_auc
# crosses its ONE-ROW rank-sum aggregate with its ONE-ROW confusion
# aggregate (the column_profile pattern); cluster_quality contains
# seeded_assignment's broadcast 16-row seed crossJoin (the
# semantic_dedup entry, shared code) plus the clusters²
# centroid-pair join over the ≤clusters-row centroid table;
# hybrid_rrf contains the bm25_rank chain verbatim (its broadcast
# ONE-ROW corpus-stats crossJoin — the fusion itself is a hash
# aggregate, not a join); retrieval_ndcg composes hybrid_rrf and adds
# its own ONE-ROW dcg × idcg scalar crossJoin (the column_profile
# pattern); ann_recall composes cosine_topk + lsh_topk +
# ivf_topk_seeded + pq_topk (their allowlisted tiny-query-set /
# seed-table / codebook fan-ins) and adds only a broadcast queries×k
# hit join; hybrid_rrf_multi contains the bm25_rank_keyed chain (the
# same broadcast ONE-ROW corpus-stats crossJoin as bm25_rank — the
# query dimension enters through broadcast hash joins on term/dim,
# not through the cross); retrieval_ndcg_multi composes
# hybrid_rrf_multi (its dcg/idcg/mean stages are hash aggregates and
# ≤queries-row broadcast joins, no crosses of their own);
# retrieval_mrr composes hybrid_rrf_multi (the same bm25_rank_keyed
# ONE-ROW corpus-stats crossJoin; its own stages are hash aggregates
# and ≤queries-row broadcast joins); mrl_recall is three truncated
# cosine_topk rankings plus the exact baseline — the cosine_topk
# broadcast tiny-query-set pair join, four times, never corpus×corpus;
# domain_reweight contains the lm_surprisal chain verbatim (the same
# broadcast ONE-ROW vocabulary scalar) plus its own ONE-ROW reference-
# loss and token-total crossJoins (the column_profile pattern) — every
# iteration after the corpus aggregate runs on the |domains|-sized
# table; quant_recall is the cosine_topk broadcast tiny-query-set pair
# join three times (two quantized variants + the exact baseline — the
# mrl_recall shape); dedup_pr_eval crosses its per-config counts with
# the broadcast ONE-ROW ground-truth total (the column_profile
# pattern); vocab_kl crosses the vocabulary-sized KL stream with its
# broadcast ONE-ROW corpus-token total (the lm_surprisal scalar
# pattern); market_basket crosses the rule stream with its broadcast
# ONE-ROW order total (the same scalar pattern); rfm_segments crosses
# the |customers|-sized RFM aggregate with its broadcast ONE-ROW
# reference date (the same scalar pattern); rfm_segments_approx and
# rfm_agreement add a second ONE-ROW cross — the broadcast
# sample-quantile boundary scalars that replace the exact NTILEs'
# global sorts (that zero-sort trade is the query's entire point);
# ks_drift crosses the |distinct values|-sized count table with the
# broadcast |groups|-row group list (the ECDF grid fan-out — groups is
# a handful of rows) plus the ONE-ROW corpus total; benford_audit
# crosses its 9-row digit table with the ONE-ROW total (the
# column_profile pattern); ks_drift_binned inherits ks_drift's grid
# fan-in PLUS the rfm_segments_approx ONE-ROW cross (the broadcast
# sample-quantile boundary scalars that replace a global sort — the
# bounded-grid trade is the query's entire point); ks_agreement joins
# the two twins' 5-row outputs, inheriting both.
BNLJ_ALLOWED = frozenset(
    {
        "cosine_topk",
        "tfidf_topk",
        "bm25_rank",
        "histogram",
        "dormant_customers",
        "pq_topk",
        "lm_surprisal",
        "perplexity_buckets",
        "ivf_topk_seeded",
        "ivf_topk",
        "heavy_hitters_exact",
        "frequent_tokens",
        "column_profile",
        "semantic_dedup",
        "pmi_collocations",
        "lm_backoff",
        "knn_label_eval",
        "hard_negatives",
        "corpus_summary",
        "temperature_mix",
        "kmv_overlap",
        "psi_drift",
        "bootstrap_ci",
        "classifier_auc",
        "cluster_quality",
        "hybrid_rrf",
        "hybrid_rrf_multi",
        "retrieval_ndcg",
        "retrieval_ndcg_multi",
        "ann_recall",
        "domain_reweight",
        "retrieval_mrr",
        "mrl_recall",
        "quant_recall",
        "dedup_pr_eval",
        "vocab_kl",
        "market_basket",
        "rfm_segments",
        "rfm_segments_approx",
        "rfm_agreement",
        "ks_drift",
        "ks_drift_binned",
        "ks_agreement",
        "benford_audit",
    }
)

# pagerank's per-iteration join is SMJ BY DESIGN: both sides are pinned
# hash-partitioned on the join key (exchange-free iterations), and the
# rank vector is |nodes|-sized — NOT broadcastable at graph scale, so
# forcing BHJ would be the scale bug. snapshot_diff (like
# full_outer_join, kept flagged as the known-justified sentinel) is a
# FULL-outer join: neither side can be the build side, so SMJ is the
# only correct strategy. semantic_dedup's kept-flag join (corpus LEFT
# JOIN its own duplicate-id set on vec_id) is corpus-sized on BOTH
# sides — the duplicate set grows with the corpus, so broadcasting it
# would be the scale bug; a shuffle join on the id key is the honest
# plan (AQE downgrades it to broadcast at small scale on its own).
# ppr_seeded shares pagerank's iteration join verbatim (same pinned
# hash-partitioned operands, same |nodes|-sized non-broadcastable rank
# vector), so it inherits the same SMJ justification.
# apply_changelog contains snapshot_diff's full-outer SMJ verbatim
# (composed — the changelog is produced by table_diff), plus the
# replay's left-anti join of the old snapshot against the changelog's
# key set: both sides are snapshot-scale (the changelog grows with the
# change volume, unbounded at 100 TB), so broadcasting the changelog
# would be the scale bug, and the anti-join's null-safe key equality
# rules out a plain shuffled-hash anti under Spark's default
# preference — a keyed shuffle join is the honest plan (AQE downgrades
# it to broadcast at small scale on its own).
SMJ_ALLOWED = frozenset(
    {
        "pagerank",
        "ppr_seeded",
        "snapshot_diff",
        "apply_changelog",
        "semantic_dedup",
    }
)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        flags.append("BNLJ")
    if "BatchEvalPython" in plan:
        flags.append("PY_UDF_ROW_AT_A_TIME")
    if "SortMergeJoin" in plan and name not in SMJ_ALLOWED:
        flags.append("SMJ")
    if _fold_reeval_in_filter(plan):
        flags.append("FOLD_IN_FILTER")
    if _SUFFIX_FRAME.search(plan):
        # a window frame that STARTS past unbounded-preceding and ENDS
        # at UNBOUNDED FOLLOWING re-aggregates the partition suffix for
        # EVERY row — O(rows²) per key (measured 29 s vs 7 s on
        # resample_interpolate's 1M-row grid). A FULL-partition frame
        # (unboundedpreceding..unboundedfollowing) is fine — computed
        # once per partition. The O(rows) spelling for suffix scans is
        # a running frame over the REVERSED ordering: last(...) over
        # (ORDER BY t DESC ROWS UNBOUNDED PRECEDING..CURRENT).
        flags.append("SUFFIX_WINDOW_FRAME")
    return flags


# the lower-bound lookahead must absorb the whitespace itself —
# a separate \s* would backtrack to empty and let the lookahead pass
# on the space before "unboundedpreceding"
_SUFFIX_FRAME = __import__("re").compile(
    r"specifiedwindowframe\((?:Row|Range)Frame,(?!\s*unboundedpreceding)"
    r"[^,]*,\s*unboundedfollowing"
)


_HOF_NAMES = "aggregate|transform|zip_with|filter|reduce|exists|forall|array_sort"
# isnotnull whose ARGUMENT opens with a HOF chain (no intervening
# close-paren between "isnotnull(" and the HOF name — the printed
# signature of an inferred null-filter rewritten from isnotnull(col)
# into isnotnull(<fold chain>)), and ONLY on a line that prints a
# condition: formatted physical plans put Filter predicates on
# "Condition :" detail lines, and tree-form plans print them as
# "+- Filter (...)" / "+- *(n) Filter (...)" nodes. Two shapes are
# deliberately NOT flagged: a HOF under isnotnull inside a Project
# (projecting when(fold.isNotNull(), ...) evaluates the fold once and
# is fine), and a condition line where isnotnull CLOSES before any
# HOF appears — e.g. a pushed user filter containing a null GUARD
# like CASE WHEN isnotnull(regexp(...)) THEN size(filter(...)): the
# folds there are the filter's actual work, evaluated once, not an
# inferred re-evaluation (requiring no ")" before the HOF keeps the
# true chains isnotnull(transform(aggregate(... flagged).
_COND_LINE = __import__("re").compile(
    r"^\s*(?:Condition\s*:|[:+\-\s|]*(?:\*\(\d+\)\s*)?Filter\b)"
)
_HOF_UNDER_ISNOTNULL = __import__("re").compile(
    rf"isnotnull\([^\n)]*?(?:{_HOF_NAMES})\("
)


def _fold_reeval_in_filter(plan: str) -> bool:
    """Detect a higher-order-function fold re-evaluated inside a
    Filter condition — the signature of a null-filter (usually
    INFERRED from a null-intolerant join) pushed through an
    unmaterialized projection and rewritten from ``isnotnull(col)``
    into ``isnotnull(<entire computed expression>)``. HOFs are
    CodegenFallback, so the filter re-runs the interpreted fold once
    per row on top of the projection's own evaluation (measured 2.4×
    wall on simhash_incremental before its store was pinned). The fix
    at the query layer is a materialization barrier (pin / persisted
    table) or folding the null-drop into the consumer (see
    dedup._quarters)."""
    return any(
        _COND_LINE.match(line) and _HOF_UNDER_ISNOTNULL.search(line)
        for line in plan.split("\n")
    )

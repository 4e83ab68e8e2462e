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

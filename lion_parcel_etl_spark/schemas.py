"""Explicit StructTypes for every table the engine touches.

The reference mixes inferred and declared schemas (SURVEY.md §1.3); the
Spark engine declares everything explicitly so schema-on-read is exact
and JSON parsing never silently widens types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Retail pipeline (reference: public/source_transaction_lion_parcel.py:30-42,
# dbt/models/marts/retail_transactions*.sql — see FIXTURES.md §1-4)
# ---------------------------------------------------------------------------

SOURCE_TRANSACTION = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("last_status", T.StringType()),
        T.StructField("pos_origin", T.StringType()),
        T.StructField("pos_destination", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

STG_RETAIL_TRANSACTIONS = T.StructType(
    list(SOURCE_TRANSACTION.fields) + [T.StructField("loaded_at", T.TimestampType())]
)

RETAIL_TRANSACTIONS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("last_status", T.StringType()),
        T.StructField("pos_origin", T.StringType()),
        T.StructField("pos_destination", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("deleted_at", T.TimestampType()),
    ]
)

RETAIL_TRANSACTIONS_SCD = T.StructType(
    list(RETAIL_TRANSACTIONS.fields)
    + [
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("is_current", T.BooleanType()),
        T.StructField("dw_inserted_at", T.TimestampType()),
        T.StructField("dw_updated_at", T.TimestampType()),
    ]
)

# Open-ended validity sentinel (reference retail_transactions_scd.sql:115,215).
SCD_SENTINEL = "9999-12-31 23:59:59"

# ---------------------------------------------------------------------------
# Bonus metrics-JSON pipeline (reference downloads_json/*.json, parsed at
# public/lion_parcell_bonus_test_stg.py:175-212 — see FIXTURES.md §5-7)
# ---------------------------------------------------------------------------

METRIC_DATA_RESULT = T.StructType(
    [
        T.StructField("Id", T.StringType()),
        T.StructField("Label", T.StringType()),
        T.StructField("Timestamps", T.ArrayType(T.StringType())),
        T.StructField("Values", T.ArrayType(T.DoubleType())),
        T.StructField("StatusCode", T.StringType()),
    ]
)

# `Messages` is heterogeneous (string OR object elements) so it is NOT in
# this schema; it is extracted from the raw document text and normalized
# separately (see sources/metrics_json.py and SURVEY.md §7 hard part 1).
METRICS_DOC = T.StructType(
    [T.StructField("MetricDataResults", T.ArrayType(METRIC_DATA_RESULT))]
)

METRICS_DETAIL = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("runtime_date", T.StringType()),  # lexicographic max, stays string
        T.StructField("sum_ms", T.DoubleType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("load_time", T.DoubleType()),
        T.StructField("Message", T.StringType()),
        T.StructField("source_file", T.StringType()),
    ]
)

METRICS_FINAL = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("runtime_date", T.StringType()),  # ISO-8601 with +00:00
        T.StructField("load_time", T.DoubleType()),
        T.StructField("Message", T.StringType()),
    ]
)

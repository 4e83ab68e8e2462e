"""Schema-on-read source for the metrics JSON corpus.

Reference behavior being re-expressed (NOT ported): per-file
``json.load`` + manual flatten at
``public/lion_parcell_bonus_test_stg.py:175-212`` with skip-on-error at
``:250-260``.

Spark-first design: each document is one row of ``spark.read.text(...,
wholetext=True)`` — distributed file listing and IO, no driver loop —
then ``from_json`` with the strict schema for ``MetricDataResults``.

The ``Messages`` field is heterogeneous (``array<string | object>``,
e.g. ``result-json-6.json`` holds ``[{"Description": ...}]``), which no
Spark JSON schema can type (SURVEY.md §7 hard part 1). We extract the
raw array text with ``get_json_object`` and normalize it with a
vectorized Pandas UDF that mirrors the reference's fallback chain
(string → itself; object → first of Message/message/text, else compact
JSON dump; other → str). This is a deliberate, justified Python escape
hatch: it runs once per *document*, not per value, so it is never the
hot path.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from lion_parcel_etl_spark.schemas import METRICS_DOC


@F.pandas_udf(StringType())
def _normalize_messages(raw: pd.Series) -> pd.Series:
    """JSON array text → '; '-joined normalized message strings.

    Mirrors extract_messages semantics
    (reference public/lion_parcell_bonus_test_stg.py:161-173).
    """

    def one(txt):
        if txt is None:
            return ""
        try:
            msgs = json.loads(txt)
        except (ValueError, TypeError):
            return ""
        if not isinstance(msgs, list):
            msgs = [msgs]
        out = []
        for m in msgs:
            if isinstance(m, str):
                out.append(m)
            elif isinstance(m, dict):
                val = m.get("Message") or m.get("message") or m.get("text")
                out.append(val if isinstance(val, str) else json.dumps(m))
            else:
                out.append(str(m))
        return "; ".join(out)

    return raw.map(one)


def read_metrics_docs(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Read a directory/glob of metrics JSON documents.

    Returns one row per document:
      source_file string, metrics array<struct<Id,Label,Timestamps,Values,StatusCode>>,
      messages string ('; '-joined, normalized), corrupt boolean.

    Malformed documents get ``corrupt=true`` and null metrics (the
    skip-on-error analog); callers filter them out.

    ``streaming=True`` returns the same plan over a file-stream source
    (new files picked up per micro-batch; see streaming/jobs.py).
    """
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path, wholetext=True).select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source_file"),
        F.col("value").alias("raw"),
    )
    parsed = raw.select(
        "source_file",
        F.from_json("raw", METRICS_DOC).alias("doc"),
        F.get_json_object("raw", "$.Messages").alias("raw_messages"),
    )
    return parsed.select(
        "source_file",
        F.col("doc.MetricDataResults").alias("metrics"),
        _normalize_messages(F.col("raw_messages")).alias("messages"),
        F.col("doc").isNull().alias("corrupt"),
    )

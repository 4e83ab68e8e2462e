"""lion_parcel_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL stack (RakaWibowo88/lion-parcel-etl):
staging loads, incremental merge-upsert with soft delete, SCD Type 2
history, and a semi-structured JSON metrics pipeline — plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB pipeline needs.

Everything is expressed through the DataFrame API so Catalyst/Tungsten
handle optimization and physical execution; custom code lives only at the
materialization layer (merge, SCD2, atomic swaps) and in a handful of
clearly-marked Pandas-UDF escape hatches.
"""

from lion_parcel_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

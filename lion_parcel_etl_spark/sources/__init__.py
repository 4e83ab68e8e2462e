from lion_parcel_etl_spark.sources.metrics_json import read_metrics_docs

__all__ = ["read_metrics_docs"]

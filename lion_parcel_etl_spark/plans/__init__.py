from lion_parcel_etl_spark.plans.queries import QUERIES, load_tables

__all__ = ["QUERIES", "load_tables"]

from lion_parcel_etl_spark.operators.merge_upsert import merge_upsert, sync_columns
from lion_parcel_etl_spark.operators.scd2 import scd2_apply

__all__ = ["merge_upsert", "sync_columns", "scd2_apply"]

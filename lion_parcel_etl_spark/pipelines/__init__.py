from lion_parcel_etl_spark.pipelines.bonus import metrics_detail, metrics_final
from lion_parcel_etl_spark.pipelines.retail import (
    retail_transactions_model,
    stage_source,
)

__all__ = [
    "metrics_detail",
    "metrics_final",
    "stage_source",
    "retail_transactions_model",
]

from fifa_data_pipeline_spark.functions.scalar import (
    avg_int,
    concat_label,
    cast_columns,
)

__all__ = ["avg_int", "concat_label", "cast_columns"]

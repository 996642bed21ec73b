from psd_project_spark.functions.measures import (
    MEASURE_COLS,
    grouped_measures,
    grouped_measures_oracle_sql,
    measures_to_long,
    sorted_array_measures,
    windowed_measures,
)

__all__ = [
    "MEASURE_COLS",
    "grouped_measures",
    "grouped_measures_oracle_sql",
    "measures_to_long",
    "sorted_array_measures",
    "windowed_measures",
]

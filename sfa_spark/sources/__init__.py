from sfa_spark.sources.events import (
    load_table,
    series_arrays_from_events,
    series_from_events,
    series_to_arrays,
)
from sfa_spark.sources.ucr import read_ucr
from sfa_spark.sources.synthetic import random_walk

__all__ = [
    "load_table",
    "series_arrays_from_events",
    "series_from_events",
    "series_to_arrays",
    "read_ucr",
    "random_walk",
]

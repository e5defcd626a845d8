from go_streaming_spark.operators.base import Operator, compose, op
from go_streaming_spark.operators.filters import (
    contains,
    even,
    filter_,
    greater,
    limit,
    odd,
    smaller,
)
from go_streaming_spark.operators.maps import (
    convert,
    flat_map,
    map_expr,
    observe,
    select_from_map,
    tokenize,
)
from go_streaming_spark.operators.windows import (
    CountingWindow,
    TemporalWindow,
    batch_count,
    batch_sum,
    counting_window_agg,
    fan_in,
    windowed_agg,
)
from go_streaming_spark.operators.joins import as_of_join, window_join

__all__ = [
    "Operator", "compose", "op",
    "filter_", "greater", "smaller", "even", "odd", "limit", "contains",
    "map_expr", "convert", "select_from_map", "observe", "flat_map", "tokenize",
    "TemporalWindow", "CountingWindow",
    "batch_sum", "batch_count", "windowed_agg", "counting_window_agg", "fan_in",
    "window_join", "as_of_join",
]

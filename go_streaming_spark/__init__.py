"""go_streaming_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `ottenwbe/go-streaming` reference library.

Architecture (Spark-first, NOT a port):

- Every stream is a DataFrame carrying the *event envelope*
  (``seq, event_start, event_end, meta, value``) — see :mod:`.events`.
- Operators are pure ``DataFrame -> DataFrame`` functions built from native
  Column expressions so Catalyst can push down / prune / fuse them
  (reference operators: ``pkg/processing/default_operators.go``,
  ``pkg/processing/default_filter_operators.go``).
- Windowing policies (``pkg/events/selection_policy.go``) compile to
  ``F.window`` (temporal) or dense-sequence arithmetic (counting windows).
- The fluent builder (``pkg/processing/query_builder.go``) composes operators
  into a logical DataFrame graph; ``Build`` resolves sources, ``Run`` starts
  a batch action or a Structured Streaming query.
- Batch-first, streaming-compatible: the same operator objects run on static
  DataFrames (DuckDB-oracle correctness) and on streaming DataFrames
  (``availableNow`` replay).
"""

from go_streaming_spark.engine import Engine
from go_streaming_spark.session import configure_session, get_session

__version__ = "0.1.0"

__all__ = ["Engine", "configure_session", "get_session", "__version__"]

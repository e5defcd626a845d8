"""Fluent query builder → continuous query lifecycle.

Reference (`pkg/processing/query_builder.go`, `continuous_query.go`):
``NewBuilder().From(Source[T](topic)).ConnectTo(Operator(op))...Build(run)``
then ``Subscribe``/``Run``/``Close``.  The reference's IR is two maps of
creation closures plus a frontier of unconnected streams (`query_builder.go:
31-37,158-194`); Build validates exactly one output remains (`:204-209`).

Spark-first: the "IR" is the lazily-composed DataFrame itself — Catalyst is
the plan representation and optimizer, so ConnectTo simply applies an
Operator to the frontier DataFrame.  Fan-out = reusing a DataFrame in two
branches (no UUID intermediate topics needed — Catalyst fuses or reuses);
fan-in/merge = union or ``operators.fan_in``.  Build → resolve + validate;
Run → start the action (batch collect/write or ``writeStream.start``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from go_streaming_spark.operators.base import Operator


class AmbiguousOutputError(ValueError):
    """> 1 frontier stream at Build (≈ ``ErrAmbiguousOutput``,
    `query_builder.go:204-209`)."""


class OutputUndefinedError(ValueError):
    """No frontier stream at Build (≈ ``ErrOutputUndefined``)."""


@dataclass
class QueryBuilder:
    engine: "object"
    _frontier: list[DataFrame] = field(default_factory=list)
    _streaming: bool = False

    # From / AddInput (`query_builder.go:64-84`)
    def from_source(self, topic: str, streaming: bool = False) -> "QueryBuilder":
        self._frontier.append(self.engine.stream(topic, streaming=streaming))
        self._streaming = self._streaming or streaming
        return self

    def from_df(self, df: DataFrame) -> "QueryBuilder":
        self._frontier.append(df)
        self._streaming = self._streaming or df.isStreaming
        return self

    # ConnectTo (`query_builder.go:158-194`): applies to the whole frontier.
    def connect(self, operator: Operator | Callable[[DataFrame], DataFrame]) -> "QueryBuilder":
        self._frontier = [operator(df) for df in self._frontier]
        return self

    # fan-in of the current frontier into one stream via a 2+-ary function
    def combine(self, fn: Callable[..., DataFrame]) -> "QueryBuilder":
        self._frontier = [fn(*self._frontier)]
        return self

    # Merge (`query_builder.go:87-122`): union another builder's frontier.
    def merge(self, other: "QueryBuilder") -> "QueryBuilder":
        self._frontier.extend(other._frontier)
        self._streaming = self._streaming or other._streaming
        return self

    def build(self, name: str | None = None) -> "ContinuousQuery":
        if not self._frontier:
            raise OutputUndefinedError("no source/frontier stream defined")
        if len(self._frontier) > 1:
            raise AmbiguousOutputError(
                f"{len(self._frontier)} frontier streams; combine() or merge them"
            )
        q = ContinuousQuery(self._frontier[0], name=name, streaming=self._streaming)
        if name:
            self.engine.register_query(name, q)
        return q


@dataclass
class ContinuousQuery:
    """≈ ``TypedContinuousQuery`` (`continuous_query.go:34-47`)."""

    df: DataFrame
    name: str | None = None
    streaming: bool = False
    _sq: "object" = None  # pyspark StreamingQuery when running

    def collect(self):
        return self.df.collect()

    def subscribe_batch(self, sink_fn, output_mode: str = "append"):
        """Streaming subscribe via foreachBatch (≈ ``Subscribe``,
        `continuous_query.go:103-116`)."""
        self._sq = (
            self.df.writeStream.outputMode(output_mode)
            .foreachBatch(sink_fn)
            .trigger(availableNow=True)
            .start()
        )
        return self._sq

    def subscribe(self, callback, ordered_by=None, output_mode: str = "append"):
        """Per-event subscriber: one ``callback(row)`` call per event — the
        reference's primary sink (``Subscribe(func(Event[T]))``,
        `continuous_query.go:103-116`; every example uses it).

        Delivery is driver-side, matching the reference's model: its
        subscriber is a single consumer goroutine fed from the stream's
        notifier (`pkg/pubsub/stream.go:309-339`) — a convergence point, not
        a distributed path.  Rows stream through ``toLocalIterator`` so a
        large micro-batch never materializes on the driver at once; use
        ``subscribe_batch`` for distributed/bulk sinks.

        ``ordered_by``: optional column list to sort each micro-batch before
        dispatch (the reference delivers in stream order; Spark partitions
        are unordered without an explicit sort).  Works on batch queries too
        (one "micro-batch" = the whole result)."""
        cols = list(ordered_by) if ordered_by else None

        def dispatch(batch_df, batch_id=None):
            it = batch_df.orderBy(*cols) if cols else batch_df
            for row in it.toLocalIterator():
                callback(row)

        if not self.streaming:
            dispatch(self.df)
            return None
        return self.subscribe_batch(dispatch, output_mode=output_mode)

    def run_memory(self, query_name: str, output_mode: str = "append"):
        """Run to a memory sink (test harness; ≈ Run, `continuous_query.go:118-139`)."""
        self._sq = (
            self.df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        return self._sq

    def await_done(self) -> None:
        if self._sq is not None:
            self._sq.awaitTermination()

    def stop(self) -> None:
        if self._sq is not None and self._sq.isActive:
            self._sq.stop()

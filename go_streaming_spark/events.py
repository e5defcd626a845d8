"""The event envelope — the engine-wide data model.

Reference data model (`pkg/events/event.go:9-29`, `pkg/events/timestamps.go:12-16`):
an event is typed content plus an *interval* timestamp ``{StartTime, EndTime}``
and free-form ``Meta``.  In Spark terms every stream is a DataFrame with:

====================  =======================  =====================================
column                type                     reference concept
====================  =======================  =====================================
``seq``               BIGINT                   arrival order (Spark has no implicit
                                               row order; count windows / Limit are
                                               arrival-order dependent)
``event_start``       TIMESTAMP                ``TimeStamp.StartTime`` (event time)
``event_end``         TIMESTAMP                ``TimeStamp.EndTime``
``meta``              MAP<STRING,STRING>       ``TimeStamp.Meta``
``value``             any (scalar/struct/map)  ``Event.Content``
====================  =======================  =====================================

New events default to processing time ``StartTime = EndTime = now``
(`pkg/events/timestamper.go:8-20`); derived events merge lineage:
``StartTime = min(inputs)``, ``EndTime = max(inputs)``, meta union
(`pkg/events/timestamper.go:22-50`).  In aggregations that is
``min(event_start) / max(event_end)`` and an optional map-union — see
:func:`lineage_agg`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENVELOPE_COLS = ("seq", "event_start", "event_end", "meta", "value")


def to_events(
    df: DataFrame,
    value: str | Column | list[str] | None = None,
    event_time: str | Column | None = None,
    event_end: str | Column | None = None,
    seq: str | Column | None = None,
    meta: Column | None = None,
) -> DataFrame:
    """Normalize an arbitrary DataFrame into the event envelope.

    ``value`` may be a column name/expression (scalar payload), a list of
    names (packed into a struct payload), or None (all non-envelope columns
    packed into a struct).  Missing ``event_time`` defaults to processing
    time, mirroring `pkg/events/timestamper.go:8-20`.
    """
    if isinstance(value, str):
        value_col = F.col(value)
    elif isinstance(value, Column):
        value_col = value
    else:
        names = value if value is not None else [
            c for c in df.columns if c not in ENVELOPE_COLS
        ]
        value_col = F.struct(*[F.col(c) for c in names])

    start = (
        F.col(event_time) if isinstance(event_time, str)
        else event_time if event_time is not None
        else F.current_timestamp()
    )
    end = (
        F.col(event_end) if isinstance(event_end, str)
        else event_end if event_end is not None
        else start
    )
    seq_col = (
        F.col(seq).cast("long") if isinstance(seq, str)
        else seq.cast("long") if seq is not None
        else F.monotonically_increasing_id()
    )
    meta_col = meta if meta is not None else F.create_map().cast("map<string,string>")

    return df.select(
        seq_col.alias("seq"),
        start.alias("event_start"),
        end.alias("event_end"),
        meta_col.alias("meta"),
        value_col.alias("value"),
    )


def lineage_agg(merge_meta: bool = False) -> list[Column]:
    """Aggregate expressions implementing the reference's lineage merge
    (`pkg/events/timestamper.go:22-50`): min start, max end, meta union.

    Meta union is off by default: collecting every input map per group is a
    memory cost that only pays when meta is actually populated.
    """
    aggs = [
        F.min("event_start").alias("event_start"),
        F.max("event_end").alias("event_end"),
    ]
    if merge_meta:
        aggs.append(
            F.map_from_entries(
                F.flatten(F.collect_list(F.map_entries("meta")))
            ).alias("meta")
        )
    else:
        aggs.append(F.first("meta").alias("meta"))
    return aggs


def with_value(df: DataFrame, expr: Column) -> DataFrame:
    """Replace the payload, keeping the envelope (Map-engine semantics:
    output keeps the input's stamp — `pkg/processing/operator_engine.go:450-510`)."""
    return df.withColumn("value", expr)

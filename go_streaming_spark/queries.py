"""The engine's query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable, paired with a DuckDB-runnable ANSI-SQL
oracle in ORACLES.  This is the correctness surface for SURVEY.md §2.

Determinism rules (so Spark and DuckDB hash-match exactly):

- Money/measure doubles are cast to DECIMAL(18,4) *at the leaf* before any
  arithmetic; all downstream aggregation is exact decimal.  Casting a raw
  2-decimal-ish double to 4 decimals is deterministic across engines (the
  value is far from a 4th-decimal rounding boundary); rounding *after* a
  double aggregation is not (sum order / shortest-repr differences).
- The FINAL output column is then cast DECIMAL → DOUBLE on BOTH sides.
  The decimal value is exact, and decimal→double is the correctly-rounded
  conversion in both engines (scaled magnitudes stay < 2^53), so the two
  doubles are bit-identical — and the driver's value-hash canonicalizes
  doubles stably, unlike wide decimals (round-1 gate failed 14 queries on
  DECIMAL(38,4) stringification alone; see ADVICE.md).
- Sums of 4-dec × 4-dec PRODUCTS carry scale 8, whose scaled int can top
  2^53 (~3e9 in money units) — there DuckDB's int→double + /10^8 double-
  rounds while Spark single-rounds.  Such sums are cast to DECIMAL(38,4)
  FIRST (exact: the factors have ≤2 real decimals, so digits 5-8 are 0),
  then to DOUBLE, on both sides.
- Window starts are emitted as epoch seconds BIGINT, not timestamps.
- Float→int truncation is explicit ``trunc`` (Go ``int()`` truncates toward
  zero; DuckDB's CAST rounds — the oracle uses trunc()).
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_streaming_spark import operators as ops
from go_streaming_spark.engine import Engine
from go_streaming_spark.events import to_events
from go_streaming_spark.functions.util import q6
from go_streaming_spark.operators.joins import window_join
from go_streaming_spark.operators.windows import CountingWindow, TemporalWindow

DEC = "decimal(18,4)"
# final-output type for exact-decimal aggregates: see determinism rules above
DEC_OUT = "double"

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def register(fn):
        if name in QUERIES:
            # a silent last-import-wins overwrite makes a documented
            # capability unreachable by the correctness gate (this
            # happened twice pre-r9) — fail loudly at import time instead
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already bound to {QUERIES[name].__module__}."
                f"{QUERIES[name].__qualname__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table → envelope: seq=event_id, event time=ts, payload=value."""
    eng = Engine(spark, sf_dir=sf_dir)
    return to_events(eng.stream("events"), value="value", event_time="ts", seq="event_id")


def _events_typed(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    eng = Engine(spark, sf_dir=sf_dir)
    raw = eng.stream("events").filter(F.col("event_type") == event_type)
    return to_events(
        raw, value=["user_id", "event_id", "value"], event_time="ts", seq="event_id"
    )


# ---------------------------------------------------------------------------
# Filter family (SURVEY §2.2 #1-7)
# ---------------------------------------------------------------------------

@query(
    "filter_greater",
    "SELECT event_id, value FROM events WHERE value > 100",
)
def filter_greater(spark, sf_dir):
    env = _events(spark, sf_dir)
    out = ops.greater(100)(env)
    return out.select(F.col("seq").alias("event_id"), "value")


@query(
    "filter_smaller",
    "SELECT event_id, value FROM events WHERE value < 50",
)
def filter_smaller(spark, sf_dir):
    env = _events(spark, sf_dir)
    return ops.smaller(50)(env).select(F.col("seq").alias("event_id"), "value")


@query(
    "filter_even",
    "SELECT event_id, value FROM events WHERE CAST(trunc(value) AS BIGINT) % 2 = 0",
)
def filter_even(spark, sf_dir):
    env = _events(spark, sf_dir)
    return ops.even()(env).select(F.col("seq").alias("event_id"), "value")


@query(
    "filter_odd",
    "SELECT event_id, value FROM events WHERE CAST(trunc(value) AS BIGINT) % 2 <> 0",
)
def filter_odd(spark, sf_dir):
    env = _events(spark, sf_dir)
    return ops.odd()(env).select(F.col("seq").alias("event_id"), "value")


@query(
    "filter_contains",
    "SELECT event_id, event_type FROM events WHERE event_type LIKE '%rror%'",
)
def filter_contains(spark, sf_dir):
    eng = Engine(spark, sf_dir=sf_dir)
    env = to_events(eng.stream("events"), value="event_type", event_time="ts", seq="event_id")
    out = ops.contains("rror")(env)
    return out.select(F.col("seq").alias("event_id"), F.col("value").alias("event_type"))


@query(
    "limit_first",
    "SELECT event_id, value FROM events ORDER BY event_id LIMIT 50",
)
def limit_first(spark, sf_dir):
    env = _events(spark, sf_dir)
    return ops.limit(50)(env).select(F.col("seq").alias("event_id"), "value")


# ---------------------------------------------------------------------------
# Map family (SURVEY §2.2 #8-13)
# ---------------------------------------------------------------------------

@query(
    "map_affine",
    "SELECT event_id, value * 2 + 1 AS mapped FROM events",
)
def map_affine(spark, sf_dir):
    env = _events(spark, sf_dir)
    out = ops.map_expr(F.col("value") * 2 + 1)(env)
    return out.select(F.col("seq").alias("event_id"), F.col("value").alias("mapped"))


@query(
    "convert_long",
    "SELECT event_id, CAST(trunc(value) AS BIGINT) AS value_long FROM events",
)
def convert_long(spark, sf_dir):
    env = _events(spark, sf_dir)
    out = ops.convert("long")(env)
    return out.select(F.col("seq").alias("event_id"), F.col("value").alias("value_long"))


@query(
    "select_from_map",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k"
    " FROM events",
)
def select_from_map(spark, sf_dir):
    # props is a JSON string; parse to MAP then project key 'k'
    # (SelectFromMap over map[string]any content, default_operators.go:81-101)
    eng = Engine(spark, sf_dir=sf_dir)
    raw = eng.stream("events")
    env = to_events(
        raw,
        value=F.from_json(F.col("props"), "map<string,string>"),
        event_time="ts",
        seq="event_id",
    )
    out = ops.select_from_map("k")(env)
    return out.select(
        F.col("seq").alias("event_id"), F.col("value").cast("long").alias("k")
    )


@query(
    "observe_passthrough",
    "SELECT event_id, value FROM events",
)
def observe_passthrough(spark, sf_dir):
    # Observe: side-effect metrics, events pass through unchanged
    # (`default_operators.go:245-261`); df.observe evaluates the metric
    # during the action — no second pass over the data
    env = _events(spark, sf_dir)
    out = ops.observe("observe_passthrough_metrics")(env)
    return out.select(F.col("seq").alias("event_id"), "value")


@query(
    "tokenize_wordcount",
    "SELECT word, count(*) AS n FROM ("
    " SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents"
    ") t WHERE word <> '' GROUP BY word",
)
def tokenize_wordcount(spark, sf_dir):
    # Tokenize (1→n FlatMap) + word count — the reference's WordCount example
    # (examples/processing/customOperator/main.go:17-38)
    eng = Engine(spark, sf_dir=sf_dir)
    env = to_events(eng.stream("documents"), value="text", seq="doc_id")
    words = ops.tokenize()(env)
    return words.groupBy(F.col("value").alias("word")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "flatmap_chars",
    "SELECT event_id, CAST(unnest(range(1, CAST(len(event_type) AS BIGINT) + 1))"
    " AS BIGINT) AS i FROM events",
)
def flatmap_chars(spark, sf_dir):
    # FlatMap 1→n demo: emit one event per character position of the payload
    # (FlatMap semantics incl. 0-output case, default_operators.go:221-242)
    eng = Engine(spark, sf_dir=sf_dir)
    env = to_events(eng.stream("events"), value="event_type", event_time="ts", seq="event_id")
    out = ops.flat_map(F.sequence(F.lit(1), F.length("value")))(env)
    return out.select(
        F.col("seq").alias("event_id"),
        F.col("value").cast("long").alias("i"),
    )


# ---------------------------------------------------------------------------
# Temporal windows + batch aggregation (SURVEY §2.2 #14-15, §2.3)
# ---------------------------------------------------------------------------

@query(
    "window_sum_tumbling",
    "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,"
    " count(*) AS n_events"
    " FROM events GROUP BY 1",
)
def window_sum_tumbling(spark, sf_dir):
    env = _events(spark, sf_dir)
    env = env.withColumn("value", F.col("value").cast(DEC))
    agg = ops.windowed_agg(
        TemporalWindow("1 hour"),
        [
            F.sum("value").cast(DEC_OUT).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        ],
        lineage=False,
    )(env)
    return agg.select(
        F.unix_timestamp("window_start").alias("ws"), "sum_value", "n_events"
    )


@query(
    "window_count_sliding",
    # 1h window sliding by 15m: each event in 4 windows; mirror of the
    # engine's arithmetic (micros since epoch, w in [wmin, wmax])
    "SELECT (w * 900) AS ws, count(*) AS n_events FROM ("
    " SELECT unnest(range((epoch_us(ts) - 3600000000 + 900000000) // 900000000,"
    "                     epoch_us(ts) // 900000000 + 1)) AS w"
    " FROM events) t GROUP BY 1",
)
def window_count_sliding(spark, sf_dir):
    env = _events(spark, sf_dir)
    agg = ops.batch_count(
        TemporalWindow("1 hour", "15 minutes"), lineage=False
    )(env)
    return agg.select(
        F.unix_timestamp("window_start").alias("ws"), F.col("value").alias("n_events")
    )


@query(
    "window_lineage",
    "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws,"
    " CAST(min(epoch_us(ts)) AS BIGINT) AS lineage_start_us,"
    " CAST(max(epoch_us(ts)) AS BIGINT) AS lineage_end_us,"
    " count(*) AS n_events"
    " FROM events GROUP BY 1",
)
def window_lineage(spark, sf_dir):
    # lineage merge through the oracle gate: derived events carry
    # min(start)/max(end) of their window inputs
    # (`pkg/events/timestamper.go:22-50`)
    env = _events(spark, sf_dir)
    agg = ops.windowed_agg(
        TemporalWindow("1 hour"),
        [F.count(F.lit(1)).alias("n_events")],
        lineage=True,
    )(env)
    return agg.select(
        F.unix_timestamp("window_start").alias("ws"),
        F.unix_micros("event_start").alias("lineage_start_us"),
        F.unix_micros("event_end").alias("lineage_end_us"),
        "n_events",
    )


@query(
    "window_sum_per_user",
    "SELECT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS ws,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value"
    " FROM events GROUP BY user_id, 2",
)
def window_sum_per_user(spark, sf_dir):
    # keyed windowed aggregation: window id + group key in ONE shuffle;
    # the key rides inside the struct payload
    eng = Engine(spark, sf_dir=sf_dir)
    env = to_events(
        eng.stream("events"), value=["user_id", "value"], event_time="ts", seq="event_id"
    )
    env = env.select(
        "event_start", F.col("value.user_id").alias("user_id"),
        F.col("value.value").cast(DEC).alias("value"),
    )
    agg = ops.windowed_agg(
        TemporalWindow("1 day"),
        [F.sum("value").cast(DEC_OUT).alias("sum_value")],
        keys=("user_id",),
        lineage=False,
    )(env)
    return agg.select(
        "user_id", F.unix_timestamp("window_start").alias("ws"), "sum_value"
    )


@query(
    "json_struct_extract",
    # mirror from_json("k long") semantics exactly: only JSON INTEGER
    # values parse (strings/doubles/arrays/objects -> NULL) and malformed
    # JSON degrades to NULL instead of erroring — DuckDB's bare
    # json_extract THROWS on invalid JSON (fuzz-caught), so both the
    # validity and the type are guarded
    # DuckDB types ANY non-negative JSON integer as UBIGINT (even 42 —
    # probed, contra the r6 advisory's premise), so UBIGINT must stay in
    # the guard; TRY_CAST is the actual fix: values above int64 max (where
    # CAST throws) degrade to NULL, matching Spark's from_json("k long")
    "WITH j AS (SELECT event_id, event_type,"
    "  CASE WHEN json_valid(props)"
    "       AND json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')"
    "  THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k FROM events)"
    " SELECT event_id, k, event_type FROM j WHERE k > 50",
)
def json_struct_extract(spark, sf_dir):
    # JSON event ingestion with a declared schema (NewEventFromJSON,
    # `pkg/events/event.go:54-62`) — from_json to a typed struct, filter
    # pushes through the parsed field
    eng = Engine(spark, sf_dir=sf_dir)
    ev = eng.stream("events")
    parsed = ev.withColumn("p", F.from_json(F.col("props"), "k long"))
    return parsed.filter(F.col("p.k") > 50).select(
        "event_id", F.col("p.k").alias("k"), "event_type"
    )


@query(
    "window_sampling",
    # shift > length ("sampling" windows with gaps): 10-minute window every
    # hour — events outside the first 10 minutes of each hour are dropped
    "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws, count(*) AS n_events"
    " FROM events WHERE epoch_us(ts) % 3600000000 < 600000000 GROUP BY 1",
)
def window_sampling(spark, sf_dir):
    env = _events(spark, sf_dir)
    agg = ops.batch_count(
        TemporalWindow("10 minutes", "1 hour"), lineage=False
    )(env)
    return agg.select(
        F.unix_timestamp("window_start").alias("ws"), F.col("value").alias("n_events")
    )


@query(
    "session_window_count",
    # gaps-and-islands oracle for Spark's session_window(gap=30m): a new
    # session starts when the gap to the previous event EXCEEDS 30 minutes
    # — Spark merges t <= prev_end (an event exactly at prev + gap still
    # extends the session; verified empirically, and the >= form diverged
    # under the oracle fuzz on an exact-boundary gap)
    "WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),"
    " marks AS (SELECT user_id, t, CASE WHEN t - lag(t) OVER w > 1800000000"
    "   OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS new_s FROM e"
    "   WINDOW w AS (PARTITION BY user_id ORDER BY t)),"
    " sess AS (SELECT user_id, t, sum(new_s) OVER (PARTITION BY user_id"
    "   ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM marks)"
    " SELECT user_id, min(t) AS session_start_us, count(*) AS n_events"
    " FROM sess GROUP BY user_id, sid",
)
def session_window_count(spark, sf_dir):
    # session windows (gap-based) — absent in the reference (SURVEY §2.5),
    # native in Spark; one shuffle on the session key
    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            "n_events",
        )
    )


@query(
    "distinct_users_per_type",
    "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events"
    " FROM events GROUP BY event_type",
)
def distinct_users_per_type(spark, sf_dir):
    # exact distinct aggregation (Spark plans a two-phase partial-distinct)
    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Counting windows (SURVEY §2.3 CountingWindowPolicy) — dense seq arithmetic
# ---------------------------------------------------------------------------

@query(
    "counting_window_tumbling",
    "SELECT event_id // 100 AS window_id,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value"
    " FROM events GROUP BY 1 HAVING count(*) = 100",
)
def counting_window_tumbling(spark, sf_dir):
    env = _events(spark, sf_dir)
    env = env.withColumn("value", F.col("value").cast(DEC))
    agg = ops.counting_window_agg(
        CountingWindow(100),
        [F.sum("value").cast(DEC_OUT).alias("sum_value")],
        lineage=False,
    )(env)
    return agg.select("window_id", "sum_value")


@query(
    "counting_window_sliding",
    "SELECT w AS window_id,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value"
    " FROM (SELECT value, unnest(range("
    "   CASE WHEN event_id - 100 + 40 < 0 THEN 0 ELSE (event_id - 100 + 40) // 40 END,"
    "   event_id // 40 + 1)) AS w FROM events) t"
    " GROUP BY w HAVING count(*) = 100",
)
def counting_window_sliding(spark, sf_dir):
    env = _events(spark, sf_dir)
    env = env.withColumn("value", F.col("value").cast(DEC))
    agg = ops.counting_window_agg(
        CountingWindow(100, 40),
        [F.sum("value").cast(DEC_OUT).alias("sum_value")],
        lineage=False,
    )(env)
    return agg.select("window_id", "sum_value")


@query(
    "counting_window_skip",
    # shift > n: windows of 50 every 200 events — 150-event gaps skipped
    "SELECT event_id // 200 AS window_id, count(*) AS n_events,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value"
    " FROM events WHERE event_id % 200 < 50 GROUP BY 1 HAVING count(*) = 50",
)
def counting_window_skip(spark, sf_dir):
    env = _events(spark, sf_dir)
    env = env.withColumn("value", F.col("value").cast(DEC))
    agg = ops.counting_window_agg(
        CountingWindow(50, 200),
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").cast(DEC_OUT).alias("sum_value"),
        ],
        lineage=False,
    )(env)
    return agg.select("window_id", "n_events", "sum_value")


@query(
    "counting_window_per_type",
    "WITH r AS (SELECT event_type, value,"
    "  row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS rn"
    "  FROM events)"
    " SELECT event_type, rn // 50 AS window_id,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value"
    " FROM r GROUP BY event_type, 2 HAVING count(*) = 50",
)
def counting_window_per_type(spark, sf_dir):
    # keyed counting windows: per-key dense arrival index (ranking window,
    # one shuffle on the key) + the same closed-form window arithmetic —
    # the scalable form of CountingWindowPolicy (state shards by key)
    from pyspark.sql.window import Window
    from go_streaming_spark.operators.windows import assign_counting_windows

    eng = Engine(spark, sf_dir=sf_dir)
    ev = eng.stream("events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    ranked = ev.select(
        "event_type",
        F.col("value").cast(DEC).alias("value"),
        (F.row_number().over(w) - 1).alias("rn"),
    )
    assigned = assign_counting_windows(ranked, CountingWindow(50), seq_col="rn")
    return (
        assigned.groupBy("event_type", "window_id")
        .agg(
            F.sum("value").cast(DEC_OUT).alias("sum_value"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") == 50)
        .drop("_n")
    )


# ---------------------------------------------------------------------------
# Windowed joins (SURVEY §2.2 #16-17)
# ---------------------------------------------------------------------------

_JOIN_ORACLE = """
SELECT CAST(epoch(date_trunc('hour', l.ts)) AS BIGINT) AS ws,
       l.user_id AS user_id,
       l.event_id AS l_event_id,
       r.event_id AS r_event_id,
       r.value AS r_value
FROM (SELECT * FROM events WHERE event_type = 'signup') l
{join} JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND date_trunc('hour', l.ts) = date_trunc('hour', r.ts)
"""


def _join_query(spark, sf_dir, how):
    left = _events_typed(spark, sf_dir, "signup")
    right = _events_typed(spark, sf_dir, "purchase")
    j = window_join(left, right, "user_id", TemporalWindow("1 hour"), how=how)
    return j.select(
        F.unix_timestamp("window_start").alias("ws"),
        F.col("value.l.user_id").alias("user_id"),
        F.col("value.l.event_id").alias("l_event_id"),
        F.col("value.r.event_id").alias("r_event_id"),
        F.col("value.r.value").alias("r_value"),
    )


@query("window_join_inner", _JOIN_ORACLE.format(join="INNER"))
def window_join_inner(spark, sf_dir):
    return _join_query(spark, sf_dir, "inner")


@query(
    "window_join_sliding",
    # 1h windows sliding by 30m: each event in 2 windows; pairs join once
    # per SHARED window (overlap semantics of DuoTemporalWindowPolicy)
    "WITH l AS (SELECT user_id, event_id, unnest(range("
    " (epoch_us(ts) - 3600000000 + 1800000000) // 1800000000,"
    " epoch_us(ts) // 1800000000 + 1)) AS w"
    " FROM events WHERE event_type = 'signup'),"
    " r AS (SELECT user_id, event_id, unnest(range("
    " (epoch_us(ts) - 3600000000 + 1800000000) // 1800000000,"
    " epoch_us(ts) // 1800000000 + 1)) AS w"
    " FROM events WHERE event_type = 'purchase')"
    " SELECT l.w * 1800 AS ws, l.user_id AS user_id,"
    " l.event_id AS l_event_id, r.event_id AS r_event_id"
    " FROM l JOIN r ON l.user_id = r.user_id AND l.w = r.w",
)
def window_join_sliding(spark, sf_dir):
    left = _events_typed(spark, sf_dir, "signup")
    right = _events_typed(spark, sf_dir, "purchase")
    j = window_join(
        left, right, "user_id", TemporalWindow("1 hour", "30 minutes"), how="inner"
    )
    return j.select(
        F.unix_timestamp("window_start").alias("ws"),
        F.col("value.l.user_id").alias("user_id"),
        F.col("value.l.event_id").alias("l_event_id"),
        F.col("value.r.event_id").alias("r_event_id"),
    )


@query("window_join_left", _JOIN_ORACLE.format(join="LEFT"))
def window_join_left(spark, sf_dir):
    return _join_query(spark, sf_dir, "left")


# ---------------------------------------------------------------------------
# Fan-in (SURVEY §2.1 FanInOperatorEngine)
# ---------------------------------------------------------------------------

@query(
    "fan_in_sum",
    "SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS ws,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,"
    " count(*) AS n_events"
    " FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1",
)
def fan_in_sum(spark, sf_dir):
    # two homogeneous inputs share one temporal window (operator_engine.go:164-292)
    eng = Engine(spark, sf_dir=sf_dir)
    raw = eng.stream("events")
    mk = lambda t: to_events(
        raw.filter(F.col("event_type") == t),
        value=F.col("value").cast(DEC),
        event_time="ts",
        seq="event_id",
    )
    out = ops.fan_in(
        [mk("click"), mk("purchase")],
        TemporalWindow("1 day"),
        [
            F.sum("value").cast(DEC_OUT).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        ],
    )
    return out.select(
        F.unix_timestamp("window_start").alias("ws"), "sum_value", "n_events"
    )


@query(
    "fan_in_per_source",
    "SELECT src, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS ws,"
    " count(*) AS n_events FROM ("
    "  SELECT 0 AS src, ts FROM events WHERE event_type = 'click'"
    "  UNION ALL SELECT 1, ts FROM events WHERE event_type = 'purchase'"
    " ) t GROUP BY src, 2",
)
def fan_in_per_source(spark, sf_dir):
    # fan-in with per-input grouping: the reference hands the fan-in function
    # {inputIndex: [events]} (`operator_engine.go:241-259`)
    eng = Engine(spark, sf_dir=sf_dir)
    raw = eng.stream("events")
    mk = lambda t: to_events(
        raw.filter(F.col("event_type") == t), value="value", event_time="ts", seq="event_id"
    )
    out = ops.fan_in(
        [mk("click"), mk("purchase")],
        TemporalWindow("1 day"),
        [F.count(F.lit(1)).alias("n_events")],
        per_source=True,
    )
    return out.select(
        F.col("source_id").alias("src"),
        F.unix_timestamp("window_start").alias("ws"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Relational completeness (SURVEY §7 M6) — Spark-native scans/joins/aggs
# ---------------------------------------------------------------------------

@query(
    "star_join_agg",
    "SELECT c_mktsegment,"
    " CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    "          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DECIMAL(38,4)) AS DOUBLE)"
    "   AS revenue,"
    " count(*) AS n_items"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " JOIN customer ON o_custkey = c_custkey"
    " GROUP BY c_mktsegment",
)
def star_join_agg(spark, sf_dir):
    eng = Engine(spark, sf_dir=sf_dir)
    li, orders, cust = eng.stream("lineitem"), eng.stream("orders"), eng.stream("customer")
    # customer is the small dimension side — broadcast it; lineitem⋈orders
    # co-partitions on the orderkey (sort-merge/shuffle-hash via AQE).
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # cust is SF-proportional: no pinned broadcast — AQE decides
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast(DEC))
            ).cast("decimal(38,4)").cast(DEC_OUT).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "pricing_summary",
    "SELECT l_returnflag, l_linestatus,"
    " CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,"
    " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,"
    " CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    "          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,"
    " count(*) AS count_order"
    " FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def pricing_summary(spark, sf_dir):
    # TPC-H Q1-shaped pricing summary (scan + group + many aggs)
    eng = Engine(spark, sf_dir=sf_dir)
    li = eng.stream("lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast(DEC_OUT).alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC_OUT).alias("sum_base_price"),
        F.sum(
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1) - F.col("l_discount").cast(DEC))
        ).cast("decimal(38,4)").cast(DEC_OUT).alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "regional_revenue",
    "SELECT r_name, n_name,"
    " CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    "          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,"
    " count(*) AS n_items"
    " FROM lineitem"
    " JOIN supplier ON l_suppkey = s_suppkey"
    " JOIN nation ON s_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " GROUP BY r_name, n_name",
)
def regional_revenue(spark, sf_dir):
    # TPC-H Q5-shaped snowflake rollup: the three dimension hops
    # (supplier → nation → region) are all broadcast — the fact table
    # shuffles once, for the final aggregation only
    eng = Engine(spark, sf_dir=sf_dir)
    li = eng.stream("lineitem")
    sup, nat, reg = eng.stream("supplier"), eng.stream("nation"), eng.stream("region")
    return (
        # sup is SF-proportional: no pinned broadcast — AQE decides
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast(DEC))
            ).cast("decimal(38,4)").cast(DEC_OUT).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "part_type_stats",
    "SELECT p_type,"
    " CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,"
    " CAST(MIN(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS min_price,"
    " CAST(MAX(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price,"
    " count(DISTINCT l_partkey) AS n_parts"
    " FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_type",
)
def part_type_stats(spark, sf_dir):
    # part-dimension rollup: broadcast dim, fact shuffles once on p_type
    eng = Engine(spark, sf_dir=sf_dir)
    li, part = eng.stream("lineitem"), eng.stream("part")
    return (
        # part is SF-proportional: no pinned broadcast — AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast(DEC_OUT).alias("sum_qty"),
            F.min(F.col("p_retailprice").cast(DEC)).cast(DEC_OUT).alias("min_price"),
            F.max(F.col("p_retailprice").cast(DEC)).cast(DEC_OUT).alias("max_price"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


@query(
    "event_gaps",
    "SELECT user_id, event_id, epoch_us(ts) -"
    " lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS gap_us"
    " FROM events",
)
def event_gaps(spark, sf_dir):
    # lag analytic: per-user inter-event gap (first event → NULL)
    from pyspark.sql.window import Window

    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = F.unix_micros("ts")
    return ev.select(
        "user_id", "event_id", (t - F.lag(t).over(w)).alias("gap_us")
    )


@query(
    "running_totals",
    "SELECT user_id, event_id,"
    " CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id"
    "  ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE)"
    " AS running_value FROM events",
)
def running_totals(spark, sf_dir):
    # cumulative window aggregate: exact decimal running sum per user
    from pyspark.sql.window import Window

    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast(DEC_OUT).alias("running_value"),
    )


@query(
    "semi_join_urgent_customers",
    "SELECT c_mktsegment, count(*) AS n_customers FROM customer c"
    " WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    "  AND o.o_orderpriority = '1-URGENT')"
    " GROUP BY c_mktsegment",
)
def semi_join_urgent_customers(spark, sf_dir):
    # EXISTS → left-semi join (no row multiplication, probe-only hash join)
    eng = Engine(spark, sf_dir=sf_dir)
    cust, orders = eng.stream("customer"), eng.stream("orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "anti_join_no_urgent_customers",
    "SELECT c_mktsegment, count(*) AS n_customers FROM customer c"
    " WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    "  AND o.o_orderpriority = '1-URGENT')"
    " GROUP BY c_mktsegment",
)
def anti_join_no_urgent_customers(spark, sf_dir):
    # NOT EXISTS → left-anti join
    eng = Engine(spark, sf_dir=sf_dir)
    cust, orders = eng.stream("customer"), eng.stream("orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "revenue_by_dow",
    # DuckDB dow(): 0=Sunday; Spark dayofweek(): 1=Sunday — aligned by +1
    "SELECT CAST(date_part('dow', o_orderdate) AS INT) + 1 AS dow,"
    " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,"
    " count(*) AS n_orders"
    " FROM orders GROUP BY 1",
)
def revenue_by_dow(spark, sf_dir):
    # calendar extraction (date functions — SURVEY §2.5 free-from-Spark)
    orders = Engine(spark, sf_dir=sf_dir).stream("orders")
    return orders.groupBy(F.dayofweek("o_orderdate").alias("dow")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast(DEC_OUT).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# stat_aggregates: the second moments are computed from EXACT decimal sums
# (Σxy, Σx, Σy, Σx², n) with one fixed double-arithmetic expression shared
# verbatim by both engines — Spark's and DuckDB's native one-pass co-moment
# aggregates differ in the last ulp (accumulation-order), which the oracle
# fuzz caught landing exactly on a 6-dec rounding boundary; native corr
# additionally DIVIDES BY ZERO under ANSI on a zero-variance group.  The
# sums are decimal-exact and rounded to scale 4 BEFORE the double cast
# (a scale-8 sum of 1e9-scale values pushes the scaled integer past
# 2^53, where DuckDB's decimal→double conversion double-rounds but
# Spark's single-rounds — fuzz-caught); every division is
# IEEE-correctly-rounded, and
# the 6-dec quantization is floor(x*1e6 + 1/2)/1e6 — identical double
# ops in both engines, unlike round(double, 6), whose tie handling
# diverges when x sits on a representation boundary (fuzz-caught), and
# n=1 / zero-variance degrade to NULL on both sides (Spark try-semantics
# via nullif; DuckDB float division by zero yields NULL).
def _moment_exprs(x: str, y: str, prec: int) -> dict:
    """covar/stddev/corr SQL built from exact decimal sums, parameterized
    by decimal precision — ONE builder emits both the Spark expressions
    (prec=18) and the DuckDB oracle (prec=19: DuckDB DECIMAL(18)
    multiplication overflows int64, fuzz-caught r6), so the two copies
    cannot drift (advisor-caught r6).  The floating-point op sequence is
    byte-identical between engines by construction."""
    dec = f"DECIMAL({prec},4)"
    n = "(CAST(count(*) AS DOUBLE))"

    def dsum(a: str, b: str | None = None) -> str:
        term = f"CAST({a} AS {dec})" + (f" * CAST({b} AS {dec})" if b else "")
        return f"(CAST(round(SUM({term}), 4) AS DOUBLE))"

    def comoment(a: str, b: str) -> str:
        return (
            f"({dsum(a, b)} - {dsum(a)} * {dsum(b)} / {n})"
            f" / nullif({n} - 1, 0)"
        )

    def sd(a: str) -> str:
        return f"sqrt(greatest({comoment(a, a)}, 0))"

    covar = comoment(x, y)
    return {
        "covar": covar,
        "sd_x": sd(x),
        "corr": f"({covar}) / nullif(({sd(x)}) * ({sd(y)}), 0)",
        # OLS ingredients (round-8): slope = covar/var, intercept from the
        # means — same exact-decimal-sums discipline, same shared text
        "var_x": comoment(x, x),
        "mean_x": f"({dsum(x)} / {n})",
        "mean_y": f"({dsum(y)} / {n})",
    }


# quantizer shared by both engines: floor(x*1e6 + 1/2)/1e6 with the 1e6
# DOUBLE literal (not 1000000.0, which Spark parses as decimal)
_Q6 = "floor(({})*1e6 + 0.5)/1e6"
_MOM_SPARK = _moment_exprs("l_quantity", "l_extendedprice", 18)
_MOM_ORACLE = _moment_exprs("l_quantity", "l_extendedprice", 19)


@query(
    "stat_aggregates",
    "SELECT l_returnflag,"
    f" {_Q6.format(_MOM_ORACLE['corr'])} AS corr_qty_price,"
    f" {_Q6.format(_MOM_ORACLE['covar'])} AS covar_qty_price,"
    f" {_Q6.format(_MOM_ORACLE['sd_x'])} AS stddev_qty"
    " FROM lineitem GROUP BY l_returnflag",
)
def stat_aggregates(spark, sf_dir):
    # statistical aggregates (SURVEY §2.5: absent in the reference, free in
    # Spark) — decimal-exact partial-aggregated moments, one shuffle
    li = Engine(spark, sf_dir=sf_dir).stream("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(_Q6.format(_MOM_SPARK["corr"])).alias("corr_qty_price"),
        F.expr(_Q6.format(_MOM_SPARK["covar"])).alias("covar_qty_price"),
        F.expr(_Q6.format(_MOM_SPARK["sd_x"])).alias("stddev_qty"),
    )


@query(
    "value_percentiles",
    "SELECT event_type, floor(quantile_cont(value, 0.5)*1e6 + 0.5)/1e6 AS p50,"
    " floor(quantile_cont(value, 0.9)*1e6 + 0.5)/1e6 AS p90,"
    " floor(quantile_cont(value, 0.99)*1e6 + 0.5)/1e6 AS p99"
    " FROM events GROUP BY event_type",
)
def value_percentiles(spark, sf_dir):
    # exact linear-interpolation percentiles (SURVEY §2.5: absent in the
    # reference, free in Spark); for 100 TB use approx_percentile — exact
    # percentile is a per-group sort
    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    return ev.groupBy("event_type").agg(
        q6(F.percentile("value", F.lit(0.5))).alias("p50"),
        q6(F.percentile("value", F.lit(0.9))).alias("p90"),
        q6(F.percentile("value", F.lit(0.99))).alias("p99"),
    )


@query(
    "rollup_revenue",
    "SELECT coalesce(o_orderpriority, 'ALL') AS priority,"
    " coalesce(l_returnflag, 'ALL') AS returnflag,"
    " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,"
    " count(*) AS n_items"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    " GROUP BY ROLLUP(o_orderpriority, l_returnflag) HAVING count(*) > 0",
)
def rollup_revenue(spark, sf_dir):
    # two-phase rollup: aggregate to the finest cells FIRST (priority ×
    # returnflag ≈ 15 rows), then rollup the cell table.  A direct
    # .rollup() Expands every fact row 3× before aggregating; here the
    # Expand runs over the cells.  Decimal sums are exact and associative,
    # so sum-of-sums equals the one-phase result bit-for-bit.
    eng = Engine(spark, sf_dir=sf_dir)
    li, orders = eng.stream("lineitem"), eng.stream("orders")
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("rev_dec"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        cells.rollup("o_orderpriority", "l_returnflag")
        .agg(
            F.sum("rev_dec").cast(DEC_OUT).alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            "revenue",
            "n_items",
        )
    )


@query(
    "rank_topn_per_segment",
    "SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM ("
    " SELECT c_mktsegment, o_orderkey, o_totalprice,"
    "  row_number() OVER (PARTITION BY c_mktsegment"
    "   ORDER BY o_totalprice DESC, o_orderkey) AS rn"
    " FROM orders JOIN customer ON o_custkey = c_custkey) t WHERE rn <= 3",
)
def rank_topn_per_segment(spark, sf_dir):
    # per-group top-n via ranking window function: one shuffle on the group
    # key; customer is broadcast so the join adds none
    from pyspark.sql.window import Window

    eng = Engine(spark, sf_dir=sf_dir)
    orders, cust = eng.stream("orders"), eng.stream("customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        # cust is SF-proportional: no pinned broadcast — AQE decides
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "set_intersect_users",
    "SELECT user_id FROM events WHERE event_type = 'click'"
    " INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'",
)
def set_intersect_users(spark, sf_dir):
    # distinct set intersection (SQL INTERSECT semantics)
    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@query(
    "set_except_user_days",
    "SELECT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s"
    " FROM events WHERE event_type = 'click'"
    " EXCEPT SELECT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT)"
    " FROM events WHERE event_type = 'purchase'",
)
def set_except_user_days(spark, sf_dir):
    # distinct set difference (SQL EXCEPT semantics): (user, day) pairs with
    # a click but no purchase
    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", day)
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(buys)


@query(
    "asof_join_signup",
    "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events"
    "  WHERE event_type = 'purchase'),"
    " s AS (SELECT user_id, epoch_us(ts) AS t_us FROM events"
    "  WHERE event_type = 'signup')"
    " SELECT p.event_id, p.user_id, s.t_us AS signup_us"
    " FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.t_us >= s.t_us",
)
def asof_join_signup(spark, sf_dir):
    # backward as-of join: each purchase → most recent signup at-or-before;
    # union+window implementation, one shuffle on user_id (operators/joins.py)
    from go_streaming_spark.operators.joins import as_of_join

    ev = Engine(spark, sf_dir=sf_dir).stream("events")
    # compare in integer microseconds on both sides (the oracle compares
    # epoch_us too — timestamp-typed comparison would differ at ns ties)
    with_us = ev.withColumn("t_us", F.unix_micros("ts"))
    purchases = with_us.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    signups = with_us.filter(F.col("event_type") == "signup").select(
        "user_id", "t_us"
    )
    out = as_of_join(
        purchases,
        signups,
        on="user_id",
        left_time="t_us",
        right_time="t_us",
        right_vals={"signup_us": F.col("t_us")},
        how="inner",
    )
    return out.select("event_id", "user_id", "signup_us")


@query(
    "topk_orders",
    "SELECT o_orderkey, o_totalprice FROM orders"
    " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)
def topk_orders(spark, sf_dir):
    # top-k: Spark plans TakeOrderedAndProject (per-partition partial top-k,
    # single merge — no global sort shuffle)
    eng = Engine(spark, sf_dir=sf_dir)
    return (
        eng.stream("orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )

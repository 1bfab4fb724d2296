"""Relational query suite over the driver test tables, with DuckDB oracles.

Each query is the Spark-first restatement of an operator from SURVEY.md §2
(citation in each docstring), exercised on the driver-provided TPC-H-ish
tables (TESTDATA.md).  ``ORACLES[name]`` is the ANSI-SQL equivalent DuckDB
runs on the same parquet for the driver's t2 hash-compare — column names are
aliased identically on both sides, doubles rounded identically, timestamps
emitted as epoch-microsecond BIGINTs.

Scale notes are per query; the common rules: dims broadcast, aggregations
rely on partial (map-side) aggregation, windows partition by high-cardinality
keys, and nothing collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
OracleFactory = Callable[[str], str]

QUERIES: dict[str, QueryFn] = {}
# str for static SQL; a factory of sf_dir for the IVF/PQ family whose SQL
# bakes per-corpus constants (codebook, n_probe, ADC shortlist) — the same
# constants the Spark plans select via _codebook()/_pq_shortlist(), so a
# correctness run at ANY scale factor compares like against like.
ORACLES: dict[str, "str | OracleFactory"] = {}


def resolve_oracles(sf_dir: str) -> dict[str, str]:
    """Materialize the oracle registry for one corpus: factories are
    called with ``sf_dir``, static strings pass through."""
    return {k: v(sf_dir) if callable(v) else v for k, v in ORACLES.items()}


def _register(name: str, oracle: "str | OracleFactory | None" = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__doc__ = fn.__doc__
        wrapped.__name__ = fn.__name__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# q01 — pricing summary (grouped aggregation; A7-style multi-agg)
# ---------------------------------------------------------------------------


@_register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)   AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)      AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate scan (the reference's running-stats shape,
    diagnostics/src/daq_trace/mod.rs:151-168 → SURVEY §2.4 A7).  Partial
    aggregation map-side; filter + 7-column projection pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    # exact DECIMAL sums: a distributed double sum is summation-order-
    # dependent in its last bits, which can flip any post-hoc rounding on
    # boundary groups.  The source values sit on a 2-dp grid, so DECIMAL
    # arithmetic is exact and order-independent in both engines; the cast
    # to DOUBLE of the identical exact value is bit-identical (doubles are
    # never exactly X.XX5, so the double→decimal cast agrees too).
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — star-schema join (J3/J4 equi-join + broadcast dims)
# ---------------------------------------------------------------------------


@_register(
    "q02_revenue_by_region",
    oracle="""
    SELECT r.r_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, year(o.o_orderdate)
    """,
)
def q02_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact(lineitem) ⋈ orders ⋈ broadcast dims (J3 equi-join,
    trace-viewer/src/finder/task/binary_by_timestamp.rs:96-135; J4 broadcast
    lookup).  Plan shape: revenue pre-aggregates PER ORDER first (map-side
    combine shrinks the fact 4:1 before the only big shuffle), so the
    oracle's count(DISTINCT o_orderkey) becomes a plain count(*) — no
    distinct-expand pass; nation/region/customer broadcast — no fact-side
    shuffle for the dim joins at any scale.

    Money math is EXACT scaled-integer (cents × discount-percent BIGINTs,
    /1e4 only at output): a distributed double sum is summation-order-
    dependent in its last bits, which flips post-hoc rounding on boundary
    groups — integer sums are order-independent at any scale and fit
    BIGINT to ~1e14 rows/group."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_pct = F.round(F.col("l_discount") * 100).cast("bigint")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents * (F.lit(100) - disc_pct)).alias("_rev_e4")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum("_rev_e4") / 10000.0).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — top-k (O1/O2 sort + limit)
# ---------------------------------------------------------------------------


@_register(
    "q03_top_suppliers",
    oracle="""
    SELECT s.s_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY revenue DESC, s.s_name
    LIMIT 10
    """,
)
def q03_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit (SURVEY §2.6 O1/O2): global top-k after a broadcast-dim
    join.  Spark executes LIMIT as per-partition top-k + single merge —
    no full sort at scale.  Revenue is an exact DECIMAL sum (order-
    independent; see q01) so the top-k cut line cannot flip on float noise."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — time-bucketed rates (A7 DAQ running stats / T2 poll cadence analog)
# ---------------------------------------------------------------------------


@_register(
    "q04_event_rates",
    oracle="""
    SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
           count(*) AS n,
           round(sum(value), 2) / count(*) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def q04_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-key per-time-bucket count/avg/min/max
    (diagnostics/src/daq_trace/mod.rs:151-168,216-277).  Tumbling window =
    date_trunc; fully partial-aggregatable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us")
    ).agg(
        F.count("*").alias("n"),
        (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# q05 — running totals (A5 event_index)
# ---------------------------------------------------------------------------


@_register(
    "q05_running_totals",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w - 1 AS n_before,
           round(sum(value) OVER w, 2) AS cum_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q05_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: running event count/sum per key, the event_index computation
    (nexus-writer/src/nexus_structure/entry/event_data.rs:195-196,236-244)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.count("*").over(w) - 1).alias("n_before"),
        F.round(F.sum("value").over(w), 2).alias("cum_value"),
    )


# ---------------------------------------------------------------------------
# q06 — sliding mean/variance (W1 SmoothingWindow)
# ---------------------------------------------------------------------------


@_register(
    "q06_sliding_stats",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER w, 2) / count(*) OVER w AS smooth_mean,
           CASE WHEN count(*) OVER w >= 5 THEN
               (round(sum(value * value) OVER w, 4)
                - round(sum(value) OVER w, 2) * round(sum(value) OVER w, 2) / 5.0) / 4.0
           END AS smooth_var
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q06_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 SmoothingWindow(5): sliding mean + sample variance
    (pulse_detection/window/smoothing_window.rs:41-83).  The reference only
    emits once the window fills — mirrored by NULLing variance below 5 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    cnt = F.count("*").over(w)
    # running-sums form, exactly the reference's sum/sum-of-squares state
    # (smoothing_window.rs:46-78), made engine-deterministic by rounding the
    # grid-granular sums before the arithmetic
    s_ = F.round(F.sum("value").over(w), 2)
    s2 = F.round(F.sum(F.col("value") * F.col("value")).over(w), 4)
    return ev.select(
        "event_id",
        "user_id",
        (s_ / cnt).alias("smooth_mean"),
        F.when(cnt >= 5, (s2 - s_ * s_ / F.lit(5.0)) / F.lit(4.0)).alias("smooth_var"),
    )


# ---------------------------------------------------------------------------
# q07 — finite differences (W2)
# ---------------------------------------------------------------------------


@_register(
    "q07_finite_differences",
    oracle="""
    SELECT event_id, user_id, value,
           value - lag(value) OVER w AS d1,
           value - 2 * lag(value) OVER w + lag(value, 2) OVER w AS d2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q07_finite_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 FiniteDifferences<3>: backward differences with binomial
    coefficients (pulse_detection/window/finite_differences.rs:12-61) as
    lag() windows — pure JVM, whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return ev.select(
        "event_id",
        "user_id",
        v.alias("value"),
        (v - F.lag("value", 1).over(w)).alias("d1"),
        (v - 2 * F.lag("value", 1).over(w) + F.lag("value", 2).over(w)).alias("d2"),
    )


# ---------------------------------------------------------------------------
# q08 — interval (run) matching: J1/J2 as a range join
# ---------------------------------------------------------------------------


@_register(
    "q08_interval_match",
    oracle="""
    WITH runs AS (
        SELECT user_id, ts AS collect_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS collect_until
        FROM events WHERE event_type = 'error'
    )
    SELECT e.user_id, epoch_us(r.collect_from) AS run_from_us,
           count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e
    JOIN runs r ON e.user_id = r.user_id
               AND e.ts > r.collect_from
               AND (r.collect_until IS NULL OR e.ts < r.collect_until)
    GROUP BY e.user_id, r.collect_from
    """,
)
def q08_interval_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: event→run interval matching with open-ended runs
    (nexus-writer/src/run_engine/engine.rs:54-66; predicate
    run_parameters.rs:156-175).  Runs are derived as the intervals between
    'error' events per user — including a final open run (collect_until
    NULL).  The runs side is small → broadcast range join, no fact shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("collect_from"),
            F.lead("ts").over(w).alias("collect_until"),
        )
    )
    joined = ev.join(
        F.broadcast(runs),
        (ev.user_id == runs.r_user_id)
        & (ev.ts > runs.collect_from)
        & (runs.collect_until.isNull() | (ev.ts < runs.collect_until)),
    )
    return joined.groupBy("user_id", "collect_from").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    ).select(
        "user_id",
        F.unix_micros("collect_from").alias("run_from_us"),
        "n_events",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# q09 — dedup, keep-first (J5)
# ---------------------------------------------------------------------------


@_register(
    "q09_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q09_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 duplicate rejection: keep the first message per key
    (digitiser-aggregator/src/frame/cache.rs:71-74).  Deterministic
    dropDuplicates via row_number (the reference keeps arrival-first; we
    order by event time)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
    )


# ---------------------------------------------------------------------------
# q10 — bitwise OR + sorted distinct set (P7 veto flags, A3 digitisers_present)
# ---------------------------------------------------------------------------


@_register(
    "q10_frame_flags",
    oracle="""
    SELECT user_id,
           bit_or(CAST(event_id % 256 AS INT)) AS veto_flags,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS present,
           CAST(count(DISTINCT event_type) AS INT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q10_frame_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 veto-flag OR-accumulation (digitiser-aggregator/src/frame/
    partial.rs:80-82) + A3 sorted distinct contributor list
    (partial.rs:42-48) as one grouped aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bit_or((F.col("event_id") % 256).cast("int")).alias("veto_flags"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("present"),
        F.countDistinct("event_type").cast("int").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# q11 — GpsTime decompose/rebuild (P3/P4 time conversions)
# ---------------------------------------------------------------------------


@_register(
    "q11_gps_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(year(ts) - 2000 AS INT) AS gps_year,
           CAST(dayofyear(ts) AS INT)   AS day_of_year,
           CAST(hour(ts) AS INT)        AS gps_hour,
           CAST(minute(ts) AS INT)      AS gps_minute,
           CAST(second(ts) AS INT)      AS gps_second,
           CAST(epoch_us(ts) % 1000000 AS BIGINT) AS gps_micro,
           epoch_us(make_timestamp(year(ts), month(ts), day(ts),
                                   hour(ts), minute(ts), 0.0))
               + CAST(second(ts) AS BIGINT) * 1000000
               + epoch_us(ts) % 1000000 AS rebuilt_us,
           epoch_us(ts) AS ts_us
    FROM events
    """,
)
def q11_gps_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: GpsTime (year-since-2000 / day-of-year / h / m / s / subsec) ↔
    UTC timestamp round trip (streaming-types/src/time_conversions.rs:13-56)
    and P4 epoch conversions — all JVM-side date functions."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    rebuilt = (
        F.unix_micros(
            F.make_timestamp(
                F.year(ts), F.month(ts), F.dayofmonth(ts), F.hour(ts), F.minute(ts), F.lit(0.0)
            )
        )
        + F.second(ts).cast("bigint") * 1_000_000
        + F.unix_micros(ts) % 1_000_000
    )
    return ev.select(
        "event_id",
        (F.year(ts) - 2000).cast("int").alias("gps_year"),
        F.dayofyear(ts).cast("int").alias("day_of_year"),
        F.hour(ts).cast("int").alias("gps_hour"),
        F.minute(ts).cast("int").alias("gps_minute"),
        F.second(ts).cast("int").alias("gps_second"),
        (F.unix_micros(ts) % 1_000_000).cast("bigint").alias("gps_micro"),
        rebuilt.alias("rebuilt_us"),
        F.unix_micros(ts).alias("ts_us"),
    )


# ---------------------------------------------------------------------------
# q12 — timestamp search + acquire-N (O3/O4/O5)
# ---------------------------------------------------------------------------


@_register(
    "q12_search_topk",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND value > 200.0
    ORDER BY ts, event_id
    LIMIT 100
    """,
)
def q12_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O4: time-indexed search — bisect-to-timestamp then collect first N
    matching a predicate (trace-viewer/src/finder/task/
    binary_by_timestamp.rs:20-72).  The Kafka offset bisect becomes parquet
    min/max pruning + pushed predicate + per-partition top-k."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"))
            & (F.col("value") > 200.0)
        )
        .orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", F.unix_micros("ts").alias("ts_us"), "value")
    )


# ---------------------------------------------------------------------------
# q13 — deterministic sampling (O6)
# ---------------------------------------------------------------------------


@_register(
    "q13_deterministic_sample",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) / count(*) AS avg_value
    FROM events
    WHERE event_id % 97 < 5
    GROUP BY event_type
    """,
)
def q13_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 random sampling (trace-reader/src/main.rs:72-85) made
    reproducible: a key-hash filter (the oracle-checkable analog of
    df.sample; production uses df.sample(fraction) which pushes a
    Bernoulli sampler into the scan)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") % 97 < 5)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"))
    )


# ---------------------------------------------------------------------------
# q15 — typed union decode (P9 f144 log decoding)
# ---------------------------------------------------------------------------


@_register(
    "q15_log_union_decode",
    oracle="""
    SELECT event_id, event_type AS value_type,
           CASE WHEN event_type IN ('click', 'view')
                THEN CAST(CAST(trunc(value) AS BIGINT) AS DOUBLE) END AS int_value,
           CASE WHEN event_type NOT IN ('click', 'view') THEN value END AS double_value,
           CAST(json_extract(props, '$.k') AS INT) AS prop_k,
           CASE WHEN event_type = 'error' THEN 'MAJOR' WHEN event_type = 'signup'
                THEN 'MINOR' ELSE 'OK' END AS severity
    FROM events
    """,
)
def q15_log_union_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: f144/al00 union decoding — extract the typed payload from a
    tagged union into per-type-family columns plus a severity enum
    (nexus-writer/src/nexus/logs/f114.rs:1-79, schemas/
    ecs_al00_alarm.fbs:159-173).  The event_type column plays the union
    tag; props is the semi-structured sidecar (get_json_object pushes to a
    single JSON parse, all branches are codegen'd CASE WHEN — no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    is_int = F.col("event_type").isin("click", "view")
    return ev.select(
        "event_id",
        F.col("event_type").alias("value_type"),
        # emitted as DOUBLE (not nullable BIGINT) so pandas/Arrow bridges on
        # either side of the comparator can't widen it inconsistently
        F.when(is_int, F.expr("cast(cast(value as bigint) as double)")).alias("int_value"),
        F.when(~is_int, F.col("value")).alias("double_value"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.when(F.col("event_type") == "error", F.lit("MAJOR"))
        .when(F.col("event_type") == "signup", F.lit("MINOR"))
        .otherwise(F.lit("OK"))
        .alias("severity"),
    )


# ---------------------------------------------------------------------------
# q16 — per-sample timestamp expansion (P10 se00)
# ---------------------------------------------------------------------------

_Q16_DELTA_US = 250  # sample period (µs) — se00 time_delta analog


@_register(
    "q16_se00_expand",
    oracle=f"""
    SELECT e.event_id,
           i AS sample_index,
           epoch_us(e.ts) + i * {_Q16_DELTA_US} AS sample_ts_us,
           round(e.value + i * 0.5, 2) AS sample_value
    FROM events e, unnest(generate_series(0, CAST(e.event_id % 4 AS INT))) AS t(i)
    """,
)
def q16_se00_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: se00 sample-environment waveform expansion — each message
    carries a packet timestamp plus N samples at fixed time_delta; the
    per-sample timestamp is ``packet_ts + i*delta``
    (schemas/ecs_se00_data.fbs:143-150, nexus/logs/se00.rs).  posexplode of
    a generated index array; the ns arithmetic stays on BIGINT micros.
    Row explosion is narrow (no shuffle) and scales linearly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "ts",
            "value",
            F.posexplode(F.sequence(F.lit(0), (F.col("event_id") % 4).cast("int"))).alias(
                "sample_index", "_i"
            ),
        )
        .select(
            "event_id",
            F.col("sample_index").cast("bigint").alias("sample_index"),
            (F.unix_micros("ts") + F.col("sample_index") * _Q16_DELTA_US).alias("sample_ts_us"),
            F.round(F.col("value") + F.col("sample_index") * 0.5, 2).alias("sample_value"),
        )
    )


# ---------------------------------------------------------------------------
# q17 — stream correlation equi-join (J3)
# ---------------------------------------------------------------------------


@_register(
    "q17_correlate_streams",
    oracle="""
    WITH v AS (
        SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_views,
               round(sum(value), 2) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), p AS (
        SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_purchases,
               round(sum(value), 2) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT v.user_id, epoch_us(v.day) AS day_us, v.n_views, v.view_value,
           p.n_purchases, p.purchase_value
    FROM v JOIN p ON v.user_id = p.user_id AND v.day = p.day
    """,
)
def q17_correlate_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: trace↔event-list correlation — two independently-derived streams
    matched on the composite natural key (digitiser id, timestamp)
    (trace-viewer/src/finder/task/binary_by_timestamp.rs:96-135).  Both
    sides aggregate before the join so the shuffle carries pre-reduced
    rows; the equi-join keys are identical partitionings, so AQE can plan
    a single co-partitioned exchange."""
    ev = load_table(spark, sf_dir, "events")

    def side(etype: str, n_name: str, v_name: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
            .agg(
                F.count("*").alias(n_name),
                F.round(F.sum("value"), 2).alias(v_name),
            )
        )

    v = side("view", "n_views", "view_value")
    p = side("purchase", "n_purchases", "purchase_value").withColumnsRenamed(
        {"user_id": "p_user_id", "day": "p_day"}
    )
    return (
        v.join(p, (v.user_id == p.p_user_id) & (v.day == p.p_day))
        .select(
            "user_id",
            F.unix_micros("day").alias("day_us"),
            "n_views",
            "view_value",
            "n_purchases",
            "purchase_value",
        )
    )


# ---------------------------------------------------------------------------
# q18 — array sanity aggregate (A8)
# ---------------------------------------------------------------------------


@_register(
    "q18_embedding_sanity",
    oracle="""
    SELECT label,
           count(*) AS n_vecs,
           CAST(max(len(embedding)) AS INT) AS dims,
           CAST(min(len(embedding)) = max(len(embedding)) AS BOOLEAN) AS uniform_dims,
           round(CAST(min(embedding[1]) AS DOUBLE), 6) AS min_first,
           round(CAST(max(embedding[1]) AS DOUBLE), 6) AS max_first,
           round(sum(round(sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding])), 6)), 2)
               / count(*) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def q18_embedding_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: trace sanity aggregate — per group: row count, vector length,
    all-lengths-equal check, element ranges, mean L2 norm
    (diagnostics/src/daq_trace/mod.rs:222-237: num channels + equal-length
    verification over trace arrays).  Pure higher-order array functions —
    JVM-side, partial-aggregatable, zero Python."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.round(
        F.sqrt(F.expr("aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (a, x) -> a + x)")),
        6,
    )
    first = F.element_at("embedding", 1).cast("double")
    return (
        e.select("label", F.size("embedding").alias("dims"), norm.alias("norm"), first.alias("e1"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.max("dims").alias("dims"),
            (F.min("dims") == F.max("dims")).alias("uniform_dims"),
            F.round(F.min("e1"), 6).alias("min_first"),
            F.round(F.max("e1"), 6).alias("max_first"),
            (F.round(F.sum("norm"), 2) / F.count("*")).alias("avg_norm"),
        )
        .select(
            "label", "n_vecs", "dims", "uniform_dims", "min_first", "max_first", "avg_norm"
        )
    )


# ---------------------------------------------------------------------------
# q19 — dragnet search (O5)
# ---------------------------------------------------------------------------

_Q19_TARGET = "2024-02-01 00:00:00"
_Q19_DIST_US = 7 * 24 * 3600 * 1_000_000  # ±7 days


@_register(
    "q19_dragnet",
    oracle=f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           abs(epoch_us(ts) - epoch_us(TIMESTAMP '{_Q19_TARGET}')) AS dist_us, value
    FROM events
    WHERE abs(epoch_us(ts) - epoch_us(TIMESTAMP '{_Q19_TARGET}')) <= {_Q19_DIST_US}
      AND event_type = 'error' AND value > 150.0
    ORDER BY dist_us, event_id
    LIMIT 50
    """,
)
def q19_dragnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 dragnet search: around a target timestamp, collect the first N
    messages matching a predicate within a fixed distance
    (trace-viewer/src/finder/task/dragnet.rs:14-60).  The Kafka
    backstep+forward scan becomes a pushed-down timestamp band filter
    (parquet min/max pruning) + distance-ordered per-partition top-k."""
    ev = load_table(spark, sf_dir, "events")
    target_us = F.unix_micros(F.lit(_Q19_TARGET).cast("timestamp"))
    dist = F.abs(F.unix_micros("ts") - target_us)
    return (
        ev.filter(
            (dist <= _Q19_DIST_US) & (F.col("event_type") == "error") & (F.col("value") > 150.0)
        )
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            dist.alias("dist_us"),
            "value",
        )
        .orderBy("dist_us", "event_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q14 — threshold detector vs SQL islands oracle (W4!)
# ---------------------------------------------------------------------------

_Q14_THRESHOLD = 100.0
_Q14_DURATION = 2


@_register(
    "q14_threshold_detect",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx
        FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN value > {_Q14_THRESHOLD} AND
                         coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY idx), -1e99)
                             <= {_Q14_THRESHOLD}
                    THEN 1 ELSE 0 END AS island_start
        FROM ordered
    ), islands AS (
        SELECT user_id, idx, value,
               sum(island_start) OVER (PARTITION BY user_id ORDER BY idx) AS island_id
        FROM flagged WHERE value > {_Q14_THRESHOLD}
    ), user_max AS (
        SELECT user_id, max(idx) AS max_idx FROM ordered GROUP BY user_id
    )
    SELECT i.user_id, CAST(min(i.idx) AS BIGINT) AS event_time,
           max(i.value) AS pulse_height
    FROM islands i JOIN user_max m ON i.user_id = m.user_id
    GROUP BY i.user_id, i.island_id, m.max_idx
    HAVING CASE WHEN max(i.idx) = m.max_idx
                THEN count(*) - 1 >= {_Q14_DURATION}
                ELSE count(*) >= {_Q14_DURATION} END
    """,
)
def q14_threshold_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 ThresholdDetector (pulse_detection/detectors/
    threshold_detector.rs:44-118) run by the REAL detector implementation,
    verified against an independent SQL islands-and-gaps oracle.

    Plan shape: the per-key series is assembled and sorted JVM-side
    (``array_sort(collect_list(struct))`` — partial aggregation applies),
    then a single Arrow-batched scalar pandas UDF detects over each array.
    This keeps the sort and the shuffle in Tungsten and amortizes the
    Python boundary over whole Arrow batches of series — measured ~4×
    faster than the per-group ``applyInPandas`` formulation at sf0.1,
    and the shuffle key (user_id) is the same high-cardinality layout
    the production event-formation uses."""
    from ..operators.pulse_detection import threshold_detector

    ev = load_table(spark, sf_dir, "events")

    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("event_time", T.LongType()),
                T.StructField("pulse_height", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def detect(series: pd.Series) -> pd.Series:
        out = []
        for vals in series:
            v = np.asarray(vals, dtype=np.float64)
            t = np.arange(len(v), dtype=np.float64)
            et, eh = threshold_detector(t, v, _Q14_THRESHOLD, _Q14_DURATION, 0)
            out.append([(int(a), float(b)) for a, b in zip(et, eh)])
        return pd.Series(out)

    return (
        ev.select("user_id", F.struct("ts", "event_id", "value").alias("s"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select("user_id", F.explode(detect(F.col("arr.value"))).alias("e"))
        .select(
            "user_id",
            F.col("e.event_time").alias("event_time"),
            F.col("e.pulse_height").alias("pulse_height"),
        )
    )


# ---------------------------------------------------------------------------
# q35 — one-sided log→run matching (J2)
# ---------------------------------------------------------------------------


@_register(
    "q35_log_run_match",
    oracle="""
    WITH runs AS (
        SELECT user_id, ts AS collect_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS collect_until
        FROM events WHERE event_type = 'error'
    ), matched AS (
        SELECT e.event_id, e.user_id, e.value, min(r.collect_from) AS run_from
        FROM events e
        JOIN runs r ON e.user_id = r.user_id
                   AND (r.collect_until IS NULL OR e.ts < r.collect_until)
        GROUP BY e.event_id, e.user_id, e.value
    )
    SELECT user_id, epoch_us(run_from) AS run_from_us,
           count(*) AS n_logs, round(sum(value), 2) AS sum_value
    FROM matched GROUP BY user_id, run_from
    """,
)
def q35_log_run_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: log → earliest run not ending before ts
    (nexus-writer/src/run_engine/engine.rs:68-80,246-288) — the one-sided
    variant of q08, so logs PRECEDING a run's start land in it.

    The oracle expresses "earliest matching run" as a min-over-candidates
    per log; the Spark plan instead rewrites the tiny runs side into
    disjoint accept-intervals (lag window over runs only) and broadcast
    range-joins — one match per log, no shuffle and no dedup pass on the
    big side (see operators/run_matching.match_logs_to_runs)."""
    from ..operators.run_matching import match_logs_to_runs

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("collect_from"),
        F.lead("ts").over(w).alias("collect_until"),
    )
    matched = match_logs_to_runs(
        ev.select("user_id", "ts", "value"), runs, partition_cols=["user_id"]
    )
    return (
        matched.groupBy("user_id", "collect_from")
        .agg(F.count("*").alias("n_logs"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("collect_from").alias("run_from_us"),
            "n_logs",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q36 — se00 expansion, explicit-timestamps branch (P10 completion)
# ---------------------------------------------------------------------------


@_register(
    "q36_se00_timestamps",
    oracle="""
    SELECT e.event_id AS message_counter,
           CAST(i AS BIGINT) AS sample_index,
           CASE WHEN e.event_id % 2 = 0 THEN epoch_us(e.ts) + i * i * 1000
                ELSE epoch_us(e.ts) + i * 250 END AS sample_ts_us,
           round(e.value + i * 0.5, 2) AS sample_value,
           e.event_id % 2 = 0 AS from_explicit
    FROM events e, unnest(generate_series(0, CAST(e.event_id % 4 AS INT))) AS t(i)
    """,
)
def q36_se00_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 both branches: se00 messages with an explicit (non-uniform)
    ``timestamps[]`` vector expand from it; delta-compressed messages fall
    back to ``packet_ts + i*time_delta`` (schemas/ecs_se00_data.fbs:143-150).
    The se00 table is derived from events (even event_ids carry explicit
    quadratic timestamps so a wrong branch cannot hash-match); expansion is
    operators/selog.expand_se00 — JVM-only, narrow."""
    from ..operators.selog import expand_se00

    ev = load_table(spark, sf_dir, "events")
    seq = F.sequence(F.lit(0), (F.col("event_id") % 4).cast("int"))
    selog = ev.select(
        F.col("event_id").alias("message_counter"),
        F.col("ts").alias("packet_ts"),
        F.lit(250_000.0).alias("time_delta"),  # ns between samples
        F.transform(seq, lambda i: F.round(F.col("value") + i * 0.5, 2)).alias("values"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.transform(
                seq,
                lambda i: F.unix_micros("ts") * 1000
                + (i * i).cast("bigint") * 1_000_000,
            ),
        ).alias("timestamps"),
    )
    out = expand_se00(selog)
    return out.select(
        "message_counter",
        "sample_index",
        # integer DIV: ns→µs must not round-trip through double (2^53 < ns epoch)
        F.expr("sample_ts_ns DIV 1000").alias("sample_ts_us"),
        "sample_value",
        "from_explicit",
    )


# ---------------------------------------------------------------------------
# q65 — as-of attach (latest preceding reading joined to each event)
# ---------------------------------------------------------------------------


@_register(
    "q65_asof_attach",
    oracle="""
    WITH o AS (
        SELECT event_id, user_id, ts, event_type, value,
               last_value(CASE WHEN event_type = 'view' THEN event_id END
                          IGNORE NULLS) OVER w AS last_view_id,
               last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
                          IGNORE NULLS) OVER w AS last_view_ts_us,
               last_value(CASE WHEN event_type = 'view' THEN value END
                          IGNORE NULLS) OVER w AS last_view_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
           last_view_id, last_view_ts_us, last_view_value
    FROM o WHERE event_type = 'purchase' AND last_view_id IS NOT NULL
    """,
)
def q65_asof_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event carries the most recent strictly-
    preceding view reading of the same user — the attach-latest-sample
    semantics the reference's writer applies when it stamps events with
    the prevailing sample-environment value (nexus-writer selects the log
    entry at-or-before each event time; see the J2/O4 backstep machinery,
    trace-viewer/src/finder/task/backstep.rs and q35's one-sided match).

    Scale shape: NOT a join at all — the classic distributed as-of
    formulation is one hash exchange on the entity key and a per-key
    ordered window with last(..., ignorenulls) over strictly-preceding
    rows.  Both sides ride the same shuffle, skew is bounded by per-user
    event counts, and no range-join explosion exists.  Tie-break is
    (ts, event_id) — total, deterministic, identical in the oracle.
    Inner as-of semantics (the SQL ASOF JOIN default): a purchase with no
    preceding view has nothing to attach and drops."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def last_view(col):
        return F.last(
            F.when(F.col("event_type") == "view", col), ignorenulls=True
        ).over(w)

    return (
        ev.withColumns(
            {
                "last_view_id": last_view(F.col("event_id")),
                "last_view_ts_us": last_view(F.unix_micros("ts")),
                "last_view_value": last_view(F.col("value")),
            }
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_id").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            "last_view_id",
            "last_view_ts_us",
            "last_view_value",
        )
    )


# ---------------------------------------------------------------------------
# q66 — gap-based sessionization (session_window)
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30


@_register(
    "q66_sessionize",
    oracle=f"""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM o
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL {_SESSION_GAP_MIN} MINUTE) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, sess_no
    """,
)
def q66_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a user's events belong to one session
    until a {_SESSION_GAP_MIN}-minute silence, the standard behavioral
    grouping (and the relational form of the frame cache's first-arrival
    TTL grouping, digitiser-aggregator/src/frame/cache.rs:121-142 — events
    cohere while arrivals keep the window alive).

    Spark-native: ``F.session_window`` — the engine merges overlapping
    per-event windows during the ONE hash aggregation on user_id, so the
    plan is a single exchange with partial merge, no self-join and no
    per-user sort pass; the oracle restates it as lag/gap-flag/cumsum.
    The same expression runs under Structured Streaming with a watermark
    (state evicts once the watermark passes a session's close), pinned by
    tests/test_sessionize_stream.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q67 — exact grouped percentiles (latency-quantile shape)
# ---------------------------------------------------------------------------


@_register(
    "q67_value_quantiles",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q67_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the DAQ-stats tail-latency
    readout shape, diagnostics/src/daq_trace/mod.rs:151-168 extended to
    distribution tails).  Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation definition, so the
    oracle is value-exact.

    Scale note: exact percentiles buffer each group's values — fine for
    bounded group counts (event types); at 100 TB row volume per group the
    drop-in is ``percentile_approx`` (t-digest, mergeable partial aggs),
    same plan shape, bounded memory."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(pct.getItem(0), 6).alias("p50"),
            F.round(pct.getItem(1), 6).alias("p95"),
            F.round(pct.getItem(2), 6).alias("p99"),
        )
    )


# ---------------------------------------------------------------------------
# q68 — rollup (multi-level aggregation lattice)
# ---------------------------------------------------------------------------


@_register(
    "q68_corpus_rollup",
    oracle="""
    SELECT COALESCE(source, 'ALL') AS source,
           COALESCE(lang, 'ALL') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP (source, lang)
    """,
)
def q68_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation lattice over the corpus: per-(source, lang), per-source,
    and grand totals in ONE pass via ROLLUP — the report-card rollup (q49)
    generalized to the lattice an operator dashboard reads.

    Scale shape: Spark expands grouping sets map-side and shares one
    exchange across all three levels — strictly cheaper than three
    aggregations and a union.  NULL lattice markers are coalesced to
    'ALL' (lang/source are never null in data, so the marker is
    unambiguous)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_chars",
        )
    )


# ---------------------------------------------------------------------------
# q71 — pivot (long → wide aggregation)
# ---------------------------------------------------------------------------

_PIVOT_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


@_register(
    "q71_lang_source_pivot",
    oracle=f"""
    SELECT lang,
           {", ".join(
               f"CAST(COALESCE(sum(CASE WHEN source = '{s}' THEN n_chars END), 0)"
               f" AS BIGINT) AS chars_{s}" for s in _PIVOT_SOURCES)}
    FROM documents GROUP BY lang
    """,
)
def q71_lang_source_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-language character totals across a FIXED list
    of sources — the report-matrix shape.  The pivot value list is
    explicit (never inferred): inference costs an extra distinct scan and
    makes the output schema data-dependent, which breaks downstream
    consumers at scale.  One partial-agg exchange, same as any groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    out = (
        docs.groupBy("lang")
        .pivot("source", _PIVOT_SOURCES)
        .agg(F.sum("n_chars"))
    )
    return out.select(
        "lang",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(f"chars_{s}")
            for s in _PIVOT_SOURCES
        ],
    )


# ---------------------------------------------------------------------------
# q72/q73 — anti-join and semi-join (existence predicates)
# ---------------------------------------------------------------------------


@_register(
    "q72_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, CAST(round(c.c_acctbal * 100) AS BIGINT)
               AS acctbal_cents
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q72_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left ANTI join — the set-difference probe (TPC-H
    Q22's core).  Anti joins keep only the probe side's columns, so the
    build side shuffles ids alone; at scale the orders side pre-projects
    to its key before the exchange (visible as a one-column ReadSchema).
    Money compared in exact cents (the q02 rule)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
        )
    )


@_register(
    "q73_suppliers_of_large_parts",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_nationkey
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM part p
        WHERE p.p_size >= 40 AND p.p_partkey % 10 = s.s_suppkey % 10
    )
    """,
)
def q73_suppliers_of_large_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left SEMI join: suppliers linked (by the synthetic
    partkey↔suppkey relation) to at least one size-≥40 part.  Semi joins
    short-circuit per probe row — no fan-out, no dedup pass afterwards —
    and the filter on the build side is pushed below the exchange."""
    s = load_table(spark, sf_dir, "supplier")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select((F.col("p_partkey") % 10).alias("pk_mod"))
    )
    return (
        s.join(p, (s.s_suppkey % 10) == p.pk_mod, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    )


# ---------------------------------------------------------------------------
# q85 — corpus manifest: per-table row counts + content checksums
# ---------------------------------------------------------------------------
#
# The integrity primitive a 100 TB pipeline runs after every copy,
# migration, or engine swap: an order-independent fingerprint per table.
# `key_xor` folds a 60-bit md5 digest of the stable columns with XOR
# (commutative — partitioning and row order cannot move it; no overflow);
# float columns are fingerprinted separately as an exact DECIMAL sum of
# per-row rounded values (XOR of text-formatted floats would be fragile
# across engines; decimal addition is exact and order-independent).
# One narrow pass + scalar aggregate per table; rows never shuffle.


def _manifest_duck(table: str, key_expr: str, num_expr: str) -> str:
    return f"""
    SELECT '{table}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(('0x' || substr(md5({key_expr}), 1, 15))::UBIGINT::BIGINT)
               AS key_xor,
           round(CAST(sum({num_expr}) AS DOUBLE), 4) AS numeric_sum
    FROM {table}
    """


@_register(
    "q85_corpus_manifest",
    oracle=(
        _manifest_duck(
            "documents",
            "concat_ws('|', doc_id::VARCHAR, lang, source, text)",
            "n_chars::DECIMAL(28, 6)",
        )
        + " UNION ALL "
        + _manifest_duck(
            "embeddings",
            "concat_ws('|', vec_id::VARCHAR, label::VARCHAR)",
            "round(list_sum(embedding::DOUBLE[]), 6)::DECIMAL(28, 6)",
        )
        + " UNION ALL "
        + _manifest_duck(
            "events",
            "concat_ws('|', event_id::VARCHAR, epoch_us(ts)::VARCHAR,"
            " user_id::VARCHAR, event_type, props)",
            "round(value, 6)::DECIMAL(28, 6)",
        )
    ),
)
def q85_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content manifest over the LLM-pipeline tables (documents,
    embeddings, events): row count, an XOR-folded md5 fingerprint of the
    stable columns, and an exact decimal sum of the numeric payload —
    see the section comment for why each piece is engine- and
    order-stable.  Two runs disagree iff the data changed."""
    def digest(key_col):
        return F.expr(
            f"cast(conv(substr(md5({key_col}), 1, 15), 16, 10) as bigint)"
        )

    docs = load_table(spark, sf_dir, "documents")
    d_row = docs.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(concat_ws('|', cast(doc_id as string),"
            " lang, source, text)), 1, 15), 16, 10) as bigint))"
        ).alias("key_xor"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(28,6)")).cast("double"), 4
        ).alias("numeric_sum"),
    ).select(F.lit("documents").alias("table_name"), "n_rows", "key_xor", "numeric_sum")

    emb = load_table(spark, sf_dir, "embeddings")
    e_row = emb.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(concat_ws('|', cast(vec_id as string),"
            " cast(label as string))), 1, 15), 16, 10) as bigint))"
        ).alias("key_xor"),
        F.round(
            F.sum(
                F.expr(
                    "cast(round(aggregate(transform(embedding,"
                    " x -> cast(x as double)), 0D, (a, x) -> a + x), 6)"
                    " as decimal(28,6))"
                )
            ).cast("double"),
            4,
        ).alias("numeric_sum"),
    ).select(F.lit("embeddings").alias("table_name"), "n_rows", "key_xor", "numeric_sum")

    ev = load_table(spark, sf_dir, "events")
    v_row = ev.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(concat_ws('|', cast(event_id as string),"
            " cast(unix_micros(ts) as string), cast(user_id as string),"
            " event_type, props)), 1, 15), 16, 10) as bigint))"
        ).alias("key_xor"),
        F.round(
            F.sum(F.expr("cast(round(value, 6) as decimal(28,6))")).cast("double"), 4
        ).alias("numeric_sum"),
    ).select(F.lit("events").alias("table_name"), "n_rows", "key_xor", "numeric_sum")

    return d_row.unionByName(e_row).unionByName(v_row)


# ---------------------------------------------------------------------------
# q86 — gap-filled resampling with forward fill (telemetry densification)
# ---------------------------------------------------------------------------


@_register(
    "q86_gap_fill",
    oracle="""
    WITH obs AS (
        SELECT event_type, date_trunc('hour', ts) AS h, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY event_type, date_trunc('hour', ts))
                   AS n_events
        FROM events
    ), per_hour AS (
        SELECT event_type, h, value AS last_value_in_hour, n_events
        FROM obs WHERE rn = 1
    ), bounds AS (
        SELECT event_type, min(h) AS h0, max(h) AS h1 FROM per_hour GROUP BY 1
    ), grid AS (
        SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT g.event_type, epoch_us(g.h) AS hour_us,
           CAST(coalesce(p.n_events, 0) AS INT) AS n_events,
           round(last_value(p.last_value_in_hour IGNORE NULLS)
                     OVER (PARTITION BY g.event_type ORDER BY g.h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS filled_value,
           p.h IS NULL AS is_gap
    FROM grid g LEFT JOIN per_hour p
      ON p.event_type = g.event_type AND p.h = g.h
    """,
)
def q86_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream onto a dense hourly grid per event type,
    forward-filling the last observed value across gaps — the
    densification step between raw telemetry and any fixed-step consumer
    (rate dashboards, training-feature grids, the reference's fixed-cadence
    DAQ statistics in A7).  Within an hour the carried value is the
    latest event's (ts, then event_id as the deterministic tie-break);
    hours before a type's first event stay NULL rather than inventing a
    reading.

    Scale shape: one keyed aggregation to per-(type, hour) summaries
    (map-side combine over the raw stream — the only pass that sees all
    events), a tiny per-type bounds row feeding a sequence() explode (the
    grid is O(hours x types), independent of event volume), one
    broadcast-able join of summaries onto the grid, and a per-type window
    for the fill whose partitions are bounded by the grid, not the data."""
    ev = load_table(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts"))
    wobs = Window.partitionBy("event_type", "h").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    per_hour = (
        ev.select("event_type", h.alias("h"), "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(wobs))
        .withColumn("n_events", F.count("*").over(Window.partitionBy("event_type", "h")))
        .filter(F.col("rn") == 1)
        .select("event_type", "h", F.col("value").alias("last_value_in_hour"), "n_events")
    )
    bounds = per_hour.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    joined = grid.join(per_hour, ["event_type", "h"], "left")
    wfill = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.unix_micros(F.col("h")).alias("hour_us"),
        F.coalesce("n_events", F.lit(0)).cast("int").alias("n_events"),
        F.round(
            F.last("last_value_in_hour", ignorenulls=True).over(wfill), 6
        ).alias("filled_value"),
        F.col("last_value_in_hour").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# q87 — weekly retention cohorts
# ---------------------------------------------------------------------------


@_register(
    "q87_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
        FROM events GROUP BY user_id
    ), cohort_sizes AS (
        SELECT cohort_w, count(*) AS cohort_size FROM first_seen GROUP BY 1
    ), activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT epoch_us(f.cohort_w) AS cohort_week_us,
           CAST(date_diff('day', f.cohort_w, a.w) / 7 AS INT) AS week_offset,
           CAST(s.cohort_size AS INT) AS cohort_size,
           CAST(count(DISTINCT a.user_id) AS INT) AS n_active,
           round(count(DISTINCT a.user_id)::DOUBLE / s.cohort_size, 4) AS retention
    FROM activity a
    JOIN first_seen f USING (user_id)
    JOIN cohort_sizes s ON s.cohort_w = f.cohort_w
    GROUP BY f.cohort_w, date_diff('day', f.cohort_w, a.w) / 7, s.cohort_size
    """,
)
def q87_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic cohort-retention matrix: users grouped by first-seen
    week, each cohort's share still active N weeks later — the product
    analytics every event pipeline eventually serves (and the template
    for data-freshness cohorts over a training corpus's crawl dates).

    Scale shape: first-seen is one keyed aggregation on user_id; weekly
    activity dedups on (user, week) — both shuffle on the user axis,
    which is the natural high-cardinality key (no skew: a user's rows are
    bounded).  Cohort sizes are a tiny table BROADCAST into the final
    aggregation; week_offset arithmetic is exact (date_trunc('week')
    aligns Mondays in both engines, datediff/7 is integral)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    cohort_sizes = first_seen.groupBy("cohort_w").agg(
        F.count("*").cast("int").alias("cohort_size")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    joined = (
        activity.join(first_seen, "user_id")
        .join(F.broadcast(cohort_sizes), "cohort_w")
        .select(
            F.unix_micros("cohort_w").alias("cohort_week_us"),
            (F.datediff("w", "cohort_w") / 7).cast("int").alias("week_offset"),
            "cohort_size",
            "user_id",
        )
    )
    return joined.groupBy("cohort_week_us", "week_offset", "cohort_size").agg(
        F.countDistinct("user_id").cast("int").alias("n_active"),
        F.round(
            F.countDistinct("user_id").cast("double") / F.col("cohort_size"), 4
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# q88 — mergeable distinct-count sketches (HLL) vs exact
# ---------------------------------------------------------------------------


@_register(
    "q88_distinct_sketches",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS INT) AS n_exact,
           TRUE AS hll_within_bound
    FROM events GROUP BY event_type
    """,
)
def q88_distinct_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, exact AND via a DataSketches HLL
    sketch (lgConfigK=12) — the cardinality primitive that actually
    scales: `count(DISTINCT)` needs a full shuffle of the key universe,
    while sketches are ~KB-sized MERGEABLE partial aggregates (map-side
    combine; union across partitions, days, or tenants is associative —
    pinned by tests/test_curation_ops.py's union-vs-direct gate).

    Oracle contract: the raw HLL estimate has no engine-independent
    value (DuckDB cannot replay DataSketches), so the HASHED columns are
    the exact counts plus `hll_within_bound` — an assertion that the
    sketch estimate landed within 5% relative error of the exact count
    (lgConfigK=12 ⇒ RSE ≈ 1.04/√4096 ≈ 1.6%, so 5% ≈ 3σ).  The oracle
    states TRUE; a broken sketch produces FALSE and hash-mismatches.
    The estimate itself stays bounded by the same pytest gate.

    Reference analog: the DAQ run statistics (A7) report distinct
    channels/digitisers per frame window; at 100 TB distincts this is
    the form that survives."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("int").alias("n_exact"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("n_hll"),
    )
    return per.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_hll") - F.col("n_exact")) / F.col("n_exact") < 0.05
        ).alias("hll_within_bound"),
    )


# ---------------------------------------------------------------------------
# q89 — ordered funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------


@_register(
    "q89_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    ), counts AS (
        SELECT 1 AS step_no, 'view' AS step, (SELECT count(*) FROM v) AS n_users
        UNION ALL
        SELECT 2, 'click', (SELECT count(*) FROM c)
        UNION ALL
        SELECT 3, 'purchase', (SELECT count(*) FROM p)
    )
    SELECT step_no, step, CAST(n_users AS INT) AS n_users,
           round(n_users::DOUBLE
                 / lag(n_users, 1, n_users) OVER (ORDER BY step_no), 4)
               AS conv_from_prev,
           round(n_users::DOUBLE
                 / first_value(n_users) OVER (ORDER BY step_no), 4)
               AS conv_overall
    FROM counts
    """,
)
def q89_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after their
    first view, then purchased strictly after that first qualifying click
    — with per-step and overall conversion.  The ORDER constraint is what
    separates a funnel from three distinct counts (a purchase before the
    click must not convert), and `min(ts)` per step makes the stage
    anchors deterministic.

    Scale shape: each stage is one keyed aggregation on user_id joined to
    the previous stage's per-user anchor — shuffles stay on the user axis
    with bounded per-user rows, and stages prune: stage N scans only one
    event type and joins against at most the stage-(N-1) survivors.  The
    3-row result is driver-safe by construction."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count("*").alias("n_users"))
        .select(F.lit(1).alias("step_no"), F.lit("view").alias("step"), "n_users")
        .unionByName(
            c.agg(F.count("*").alias("n_users")).select(
                F.lit(2).alias("step_no"), F.lit("click").alias("step"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count("*").alias("n_users")).select(
                F.lit(3).alias("step_no"), F.lit("purchase").alias("step"), "n_users"
            )
        )
    )
    w = Window.orderBy("step_no")
    return counts.select(
        "step_no",
        "step",
        F.col("n_users").cast("int").alias("n_users"),
        F.round(
            F.col("n_users").cast("double")
            / F.lag("n_users", 1, None).over(w).cast("double"),
            4,
        ).alias("conv_from_prev"),
        F.round(
            F.col("n_users").cast("double") / F.first("n_users").over(w), 4
        ).alias("conv_overall"),
    ).withColumn(
        "conv_from_prev", F.coalesce("conv_from_prev", F.lit(1.0))
    )


# ---------------------------------------------------------------------------
# q101 — last-touch click attribution (batch form of the stream-stream join)
# ---------------------------------------------------------------------------


@_register(
    "q101_click_attribution",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
        FROM events WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT p.purchase_id, p.user_id, p.value, c.click_id,
               date_diff('microsecond', c.click_ts, p.purchase_ts) / 1e6
                   AS secs_to_convert,
               row_number() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
        FROM purchases p JOIN clicks c
          ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts < c.click_ts + INTERVAL 1 HOUR
    )
    SELECT purchase_id, user_id, click_id,
           round(value, 2) AS purchase_value,
           round(secs_to_convert, 3) AS secs_to_convert
    FROM pairs WHERE rn = 1
    """,
)
def q101_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the LATEST click by
    the same user within the preceding hour (ties on timestamp -> highest
    click id) — the batch decision layer over the raw pair stream
    (streaming/attribution_stream.py), registered against the oracle so
    the window semantics are value-checked.

    Scale shape: both sides filter to one event type before the join;
    the range join shuffles on user_id (bounded per-user rows) and the
    winner is a per-purchase window over pairs bounded by the horizon."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("click_ts"), F.desc("click_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            F.col("p_user_id").alias("user_id"),
            "click_id",
            F.round("value", 2).alias("purchase_value"),
            F.round(
                (
                    F.col("purchase_ts").cast("double")
                    - F.col("click_ts").cast("double")
                ),
                3,
            ).alias("secs_to_convert"),
        )
    )


# ---------------------------------------------------------------------------
# q103 — semi-structured JSON property extraction
# ---------------------------------------------------------------------------


@_register(
    "q103_json_props",
    oracle="""
    WITH parsed AS (
        SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
        FROM events WHERE props IS NOT NULL AND props <> ''
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(k) AS BIGINT) AS n_parsed,
           CAST(min(k) AS INT) AS k_min,
           CAST(max(k) AS INT) AS k_max,
           round(avg(k), 4) AS k_avg,
           CAST(count(DISTINCT k) AS INT) AS k_distinct
    FROM parsed GROUP BY event_type
    """,
)
def q103_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction over the events payload: the `props`
    column carries JSON, parsed with a declared schema (from_json — typed,
    vectorized, malformed rows become NULL instead of failing the scan)
    and profiled per event type.  The pattern every telemetry/clickstream
    pipeline runs before promoting a JSON field to a real column; at
    100 TB the win is schema-on-read with column pruning — only `$.k` is
    materialized, never a generic JSON blob object.

    Scale shape: parsing is a narrow JVM projection (Jackson inside
    codegen, no Python); one keyed aggregation with map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    parsed = ev.filter(
        F.col("props").isNotNull() & (F.col("props") != "")
    ).select("event_type", k.alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count("k").cast("bigint").alias("n_parsed"),
        F.min("k").cast("int").alias("k_min"),
        F.max("k").cast("int").alias("k_max"),
        F.round(F.avg("k"), 4).alias("k_avg"),
        F.countDistinct("k").cast("int").alias("k_distinct"),
    )


# ---------------------------------------------------------------------------
# q105 — windowed rate-anomaly detection over the dense hourly grid
# ---------------------------------------------------------------------------

_ANOM_LOOKBACK = 24  # trailing hours in the baseline window
_ANOM_Z = 3.0


@_register(
    "q105_rate_anomaly",
    oracle=f"""
    WITH g AS ({ORACLES["q86_gap_fill"]})
    , stats AS (
        SELECT event_type, hour_us, n_events,
               avg(n_events) OVER w AS mu,
               stddev_samp(n_events) OVER w AS sigma,
               count(*) OVER w AS n_window
        FROM g
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
                     ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_us, CAST(n_events AS INT) AS n_events,
           round(mu, 4) AS baseline_mean,
           round((n_events - mu) / sigma, 4) AS z_score
    FROM stats
    WHERE n_window = {_ANOM_LOOKBACK} AND sigma > 0
      AND abs((n_events - mu) / sigma) >= {_ANOM_Z}
    """,
)
def q105_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: each hour's count against the
    trailing 24-hour baseline on the DENSE grid (q86's densification —
    without gap rows a silent outage is invisible, which is the whole
    point), flagging |z| >= 3 with the baseline alongside.  The alerting
    primitive for both DAQ health (A7's statistics feed) and ingest
    monitoring.

    Scale shape: rides q86's plan (one keyed aggregation + the grid);
    the baseline is a bounded ROWS window per type — no second pass over
    raw events."""
    g = QUERIES["q86_gap_fill"](spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(-_ANOM_LOOKBACK, -1)
    )
    stats = g.select(
        "event_type", "hour_us", "n_events",
        F.avg("n_events").over(w).alias("mu"),
        F.stddev_samp("n_events").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_window"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sigma")
    return (
        stats.filter(
            (F.col("n_window") == _ANOM_LOOKBACK) & (F.col("sigma") > 0)
        )
        .filter(F.abs(z) >= _ANOM_Z)
        .select(
            "event_type",
            "hour_us",
            F.col("n_events").cast("int").alias("n_events"),
            F.round("mu", 4).alias("baseline_mean"),
            F.round(z, 4).alias("z_score"),
        )
    )


# ---------------------------------------------------------------------------
# q108 — shipping priority (TPC-H Q3 shape: selective 3-way join + top-k)
# ---------------------------------------------------------------------------


@_register(
    "q108_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           epoch_us(o.o_orderdate) AS orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q108_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3's shape: revenue of not-yet-shipped lineitems for one
    market segment's pre-cutoff orders, top-10 by revenue.  The segment
    filter prunes customers BEFORE the join (broadcast dim), the date
    predicates push to both fact scans, and the global top-10 is
    TakeOrdered — per-partition top-k, no full sort of the aggregate.

    Ranking is on the ROUNDED revenue with the orderkey tie-break so
    both engines order identically."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1998-03-15")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > "1998-03-15")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = li.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
        li.l_orderkey == o.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            # o_orderdate is NTZ in this corpus era; the session is pinned
            # UTC, so the cast is wall-clock == UTC (the loader's convention)
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# q109 — customer-value deciles (ntile) and revenue concentration
# ---------------------------------------------------------------------------


@_register(
    "q109_customer_deciles",
    oracle="""
    WITH cv AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey, total,
               ntile(10) OVER (ORDER BY total DESC, o_custkey) AS decile
        FROM cv
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(total), 2) AS decile_revenue,
           round(sum(total) / (SELECT sum(total) FROM cv), 4) AS revenue_share
    FROM ranked GROUP BY decile
    """,
)
def q109_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: customers ntile'd into deciles by lifetime
    order value, with each decile's share of total revenue — the 80/20
    diagnosis (and the template for token-budget concentration over
    sources).  ntile ranks on the ROUNDED total with the custkey
    tie-break so both engines cut identical deciles.

    Scale shape: one keyed aggregation to per-customer totals (customer
    cardinality, not order cardinality).  A naive `ntile(10) OVER (ORDER
    BY total DESC)` would sort every customer through ONE task — the
    classic global-window scale-killer — so the rank is computed in two
    phases instead (the q60 pattern, plans/text_train.py): customers
    bucket on a fixed log2 grid of `total` (1/128-octave bins — a
    monotone, data-independent function of the leading sort key, so
    bucket-descending order IS total-descending order), rank locally
    inside each bucket, and global rank = broadcast bucket offset +
    local rank.  The offsets window touches one row per OCCUPIED grid
    cell — bounded by the grid alphabet (64 octaves x 128 ≈ 8k cells),
    never by customer cardinality.  ntile(10) is then pure arithmetic on
    (rank, n): the first n%10 tiles take ceil(n/10) rows, the rest take
    floor(n/10) — exactly SQL ntile semantics, no global window.  The
    share denominator is a broadcast scalar."""
    cv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    # two-phase global rank over (total DESC, o_custkey ASC)
    b = cv.withColumn(
        "bucket", F.floor(F.log2(F.col("total") + F.lit(1.0)) * 128).cast("int")
    )
    w_local = Window.partitionBy("bucket").orderBy(F.desc("total"), "o_custkey")
    ranked_local = b.withColumn("local_rank", F.row_number().over(w_local))
    # grid-alphabet-bounded offset table: one row per occupied log2 cell
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bucket", "off")
    tot = cv.agg(
        F.sum("total").alias("t"), F.count(F.lit(1)).alias("n")
    )
    ranked = (
        ranked_local.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.col("off") + F.col("local_rank"))
        # ntile(10): base rows per tile = n div 10; first n%10 tiles hold
        # one extra row.  decile(r) = ceil(r / (base+1)) inside the fat
        # tiles, rem + ceil((r - fat_rows) / base) after them.
        .withColumn("base", (F.col("n") / 10).cast("bigint"))
        .withColumn("rem", F.col("n") % 10)
        .withColumn("fat", F.col("rem") * (F.col("base") + 1))
        .withColumn(
            "decile",
            F.when(
                F.col("rnk") <= F.col("fat"),
                F.floor((F.col("rnk") - 1) / (F.col("base") + 1)) + 1,
            ).otherwise(
                F.col("rem")
                + F.floor((F.col("rnk") - F.col("fat") - 1) / F.col("base"))
                + 1
            ),
        )
    )
    return (
        ranked.groupBy("decile", "t")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.sum("total"), 2).alias("decile_revenue"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            "decile_revenue",
            F.round(F.col("decile_revenue") / F.col("t"), 4).alias("revenue_share"),
        )
    )

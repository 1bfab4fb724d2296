"""Run-interval matching: J1/J2 of SURVEY.md §2.5.

The nexus-writer selects, for each incoming message timestamp, the run with
``collect_from < ts`` and (``ts < collect_until`` or run still open)
(nexus-writer/src/run_engine/run/run_parameters.rs:156-175, engine scan
run_engine/engine.rs:54-80).  Log messages use the one-sided variant: any
run *not ending before* ts (logs may precede the run start).

Spark-first: the runs table is tiny (a control stream), so both variants are
**broadcast range joins** — the events side never shuffles.  At 100 TB of
events and thousands of runs this stays a map-side join; no custom Catalyst
work needed (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def match_events_to_runs(
    events: DataFrame, runs: DataFrame, ts_col: str = "ts", how: str = "inner"
) -> DataFrame:
    """J1: frame/event message → covering run.

    Predicate (run_parameters.rs:156-175): collect_from < ts AND
    (collect_until IS NULL OR ts < collect_until).  Messages matching no run
    are dropped by the writer (engine.rs:220-238) — ``how='inner'`` mirrors
    that; pass ``how='left'`` to keep them with NULL run columns (error-side
    output, P8).
    """
    cond = (F.col(ts_col) > runs["collect_from"]) & (
        runs["collect_until"].isNull() | (F.col(ts_col) < runs["collect_until"])
    )
    return events.join(F.broadcast(runs), on=cond, how=how)


def match_logs_to_runs(
    logs: DataFrame,
    runs: DataFrame,
    ts_col: str = "ts",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """J2: log/alarm → first run not ending before ts
    (run_engine/engine.rs:68-80,246-288).  One-sided: a log may precede the
    run's start (it lands in the earliest run whose end is after it).

    Scale design: "earliest run whose end is after ts" over non-overlapping
    runs (the engine aborts an unstopped predecessor on a new start, so at
    most one run is open and ends are ordered) is equivalent to a DISJOINT
    interval per run: ``[previous run's collect_until, collect_until)``.
    That interval is derived with a window over the tiny runs side only and
    broadcast — each log row then matches exactly one run, so the big side
    needs no shuffle, no per-log dedup window, and no groupBy.  ``runs``
    must have ``collect_from``/``collect_until`` columns; equality keys in
    ``partition_cols`` scope the match (both sides must carry them — the
    runs-side copies are dropped from the result).

    The disjoint-interval rewrite REQUIRES at most one open run (NULL
    collect_until) per partition — with two, the second's derived interval
    start is NULL and every log would silently match both.  The invariant
    is asserted on the tiny runs side (raise_error), so a violating control
    stream fails loudly instead of duplicating output rows.
    """
    pcols = partition_cols or []
    wp = Window.partitionBy(*[runs[c] for c in pcols])
    w = wp.orderBy(F.col("collect_until").asc_nulls_last(), F.col("collect_from"))
    n_open = F.count(F.when(F.col("collect_until").isNull(), 1)).over(wp)
    windowed = runs.withColumn(
        "_accept_from",
        F.when(
            n_open > 1,
            F.raise_error(
                "match_logs_to_runs: more than one open run (NULL collect_until) "
                "in a partition — the disjoint-interval rewrite would duplicate "
                "log matches; stop the prior run first"
            ).cast("timestamp"),
        ).otherwise(F.lag("collect_until").over(w)),
    )
    cond = (
        windowed["_accept_from"].isNull() | (F.col(ts_col) >= windowed["_accept_from"])
    ) & (
        windowed["collect_until"].isNull() | (F.col(ts_col) < windowed["collect_until"])
    )
    for c in pcols:
        cond = cond & (logs[c] == windowed[c])
    joined = logs.join(F.broadcast(windowed), on=cond, how="inner")
    drop = [windowed["_accept_from"]] + [windowed[c] for c in pcols]
    return joined.drop(*drop)

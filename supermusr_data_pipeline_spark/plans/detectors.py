"""Detector-mode queries beyond the fixed-threshold flagship (W5–W7), the
DAQ running-stats aggregate (A7), and the det↔spec broadcast map join (J4).

Same contract as ``plans.relational``: every query is registered in the
shared ``QUERIES``/``ORACLES`` dicts; the DuckDB oracle (where one exists)
mirrors the Rust FSM semantics exactly so the driver's hash compare is a
real correctness gate.  The advanced muon detector (W6/W7) has
state-dependent transition conditions (the threshold being tested depends
on which state the FSM is in), which has no bounded-window SQL
restatement — it is registered rows-only, as the driver contract allows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.testdata import load_table
from .relational import _register

# ---------------------------------------------------------------------------
# q30 — W5 DifferentialThresholdDetector vs SQL segments oracle
# Ref: trace-to-events/src/pulse_detection/detectors/
#      differential_threshold_detector.rs:46-128
# ---------------------------------------------------------------------------

_Q30_THRESHOLD = 40.0
_Q30_DURATION = 2

# FSM restated relationally (cool_off=0, no constant_multiple, contiguous
# integer times): arming only at d > threshold; disarm only at d <= 0; so an
# excursion lives inside one maximal run of d > 0 samples ("segment",
# delimited by the terminating d <= 0 sample), starts at the segment's first
# d > threshold sample s, ends at the segment's last sample e (the
# terminator, whose value still feeds max_v — the superlative update happens
# before the termination test, rs:62-75), and emits iff e - s >= duration
# with height = max(value) over [s, e].
_Q30_ORACLE = f"""
    WITH ordered AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx
        FROM events
    ), diffed AS (
        SELECT user_id, idx, value,
               value - lag(value) OVER (PARTITION BY user_id ORDER BY idx) AS d
        FROM ordered
    ), valid AS (
        SELECT *, CASE WHEN d <= 0 THEN 1 ELSE 0 END AS term
        FROM diffed WHERE idx >= 1
    ), seg AS (
        SELECT *,
               coalesce(sum(term) OVER (PARTITION BY user_id ORDER BY idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_id
        FROM valid
    ), starts AS (
        SELECT user_id, seg_id,
               min(CASE WHEN d > {_Q30_THRESHOLD} THEN idx END) AS s,
               max(idx) AS e
        FROM seg GROUP BY user_id, seg_id
    )
    SELECT st.user_id,
           CAST(st.s AS BIGINT) AS event_time,
           max(g.value) AS pulse_height
    FROM starts st
    JOIN seg g ON g.user_id = st.user_id AND g.seg_id = st.seg_id AND g.idx >= st.s
    WHERE st.s IS NOT NULL AND st.e - st.s >= {_Q30_DURATION}
    GROUP BY st.user_id, st.seg_id, st.s
"""


@_register("q30_differential_detect", oracle=_Q30_ORACLE)
def q30_differential_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 DifferentialThresholdDetector run by the real FSM implementation
    over each user's value series (time = row index, derivative = first
    difference), verified against an independent SQL segments oracle.

    Plan shape matches q14: JVM-side ``array_sort(collect_list(struct))``
    assembles each series (partial aggregation + Tungsten sort), one
    Arrow-batched scalar pandas UDF runs the FSM per series.  Shuffle key
    is the high-cardinality user_id; no driver collects; scales linearly
    with users at constant per-series memory."""
    from ..operators.pulse_detection import differential_threshold_detector

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
            if len(v) < 2:
                out.append([])
                continue
            t = np.arange(1, len(v), dtype=np.float64)
            dv = np.diff(v)
            et, eh = differential_threshold_detector(
                t, v[1:], dv, _Q30_THRESHOLD, _Q30_DURATION, 0
            )
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
# q31 — W6/W7 AdvancedMuonDetector + Assembler (rows-only)
# Ref: pulse_detection/detectors/advanced_muon_detector.rs:127-310
# ---------------------------------------------------------------------------

_Q31_ONSET = 30.0
_Q31_FALL = 0.0
_Q31_TERMINATION = 0.0
_Q31_DURATION = 1.0


@_register("q31_advanced_muon")
def q31_advanced_muon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6/W7 advanced muon detection+assembly over per-user series.  The
    FSM's transition condition depends on its current state (onset / fall /
    termination thresholds each tested only in their own state, each held
    for ``duration``), so no bounded-window SQL restatement exists —
    registered rows-only per the driver contract.

    Output: one row per assembled pulse with the full superlative set
    (baseline-corrected peak, steepest rise, sharpest fall), the columns
    the reference writes into dev2 pulse events."""
    from ..operators.pulse_detection import advanced_muon_pulses

    ev = load_table(spark, sf_dir, "events")

    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("start_time", T.DoubleType()),
                T.StructField("peak_time", T.DoubleType()),
                T.StructField("peak_value", T.DoubleType()),
                T.StructField("end_time", T.DoubleType()),
                T.StructField("steepest_rise_deriv", T.DoubleType()),
                T.StructField("sharpest_fall_deriv", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def detect(series: pd.Series) -> pd.Series:
        out = []
        for vals in series:
            v = np.asarray(vals, dtype=np.float64)
            if len(v) < 2:
                out.append([])
                continue
            t = np.arange(1, len(v), dtype=np.float64)
            pulses = advanced_muon_pulses(
                t,
                v[1:],
                np.diff(v),
                _Q31_ONSET,
                _Q31_FALL,
                _Q31_TERMINATION,
                _Q31_DURATION,
            )
            out.append(
                [
                    (
                        p.start_time,
                        p.peak_time,
                        p.peak_value,
                        p.end_time,
                        p.steepest_rise_deriv,
                        p.sharpest_fall_deriv,
                    )
                    for p in pulses
                ]
            )
        return pd.Series(out)

    return (
        ev.select("user_id", F.struct("ts", "event_id", "value").alias("s"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select("user_id", F.explode(detect(F.col("arr.value"))).alias("p"))
        .select("user_id", "p.*")
    )


# ---------------------------------------------------------------------------
# q32 — A7 DAQ running stats
# Ref: diagnostics/src/daq_trace/mod.rs:151-168,216-277
# ---------------------------------------------------------------------------


@_register(
    "q32_daq_stats",
    oracle="""
    SELECT user_id,
           count(*) AS msg_count,
           epoch_us(min(ts)) AS first_ts_us,
           epoch_us(max(ts)) AS last_ts_us,
           min(value) AS min_value,
           max(value) AS max_value,
           CASE WHEN epoch_us(max(ts)) > epoch_us(min(ts))
                THEN count(*) * 1000000.0 / (epoch_us(max(ts)) - epoch_us(min(ts)))
                ELSE NULL END AS msg_rate_per_s
    FROM events
    GROUP BY user_id
    """,
)
def q32_daq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 DAQ diagnostics: per-source message count, first/last timestamp,
    min/max observed value, and mean message rate — the daq-trace TUI's
    per-digitiser table (diagnostics/src/daq_trace/mod.rs:151-168).

    Single hash aggregate with full partial (map-side) aggregation; no
    window, no shuffle beyond the final groupBy — at 100 TB this is the
    cheapest possible shape (one pass, combiner-reduced)."""
    ev = load_table(spark, sf_dir, "events")
    first_us = F.unix_micros(F.min("ts"))
    last_us = F.unix_micros(F.max("ts"))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("msg_count"),
        first_us.alias("first_ts_us"),
        last_us.alias("last_ts_us"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.when(
            last_us > first_us,
            F.count("*") * F.lit(1000000.0) / (last_us - first_us),
        ).alias("msg_rate_per_s"),
    )


# ---------------------------------------------------------------------------
# q33 — J4 spectrum↔detector map (broadcast lookup join)
# Ref: schemas/ecs_df12_det_spec_map.fbs:179-185
# ---------------------------------------------------------------------------


@_register(
    "q33_det_spec_map",
    oracle="""
    SELECT c.c_custkey AS det_id,
           n.n_nationkey AS spec_id,
           n.n_name AS spec_name,
           r.r_name AS spec_group,
           count(*) AS n_orders,
           sum(o.o_totalprice) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY c.c_custkey, n.n_nationkey, n.n_name, r.r_name
    """,
)
def q33_det_spec_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 det↔spec mapping as a broadcast lookup join: the df12 message's
    parallel spectrum[]/detector_id[] arrays are a tiny dimension that every
    event record resolves through — here the nation/region chain plays the
    mapping and orders the fact stream.

    Both dims are explicitly ``broadcast()`` so the fact table never
    shuffles for the join (only the final aggregation shuffles, on the
    high-cardinality key) — the exact shape a 100 TB event stream needs."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dim = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("c_custkey").alias("det_id"),
            F.col("n_nationkey").alias("spec_id"),
            F.col("n_name").alias("spec_name"),
            F.col("r_name").alias("spec_group"),
        )
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.det_id)
        .groupBy("det_id", "spec_id", "spec_name", "spec_group")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )

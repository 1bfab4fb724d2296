"""Watermarked stream-stream join: purchase-to-click attribution.

The one streaming shape the engine had not yet exercised: joining TWO
live streams.  Spark's stream-stream join buffers both sides in state and
needs two bounds to stay finite — a watermark on each side (how late a
row may arrive) and a time-range predicate tying the two event times
together (how far apart matched rows may be).  With both, the engine can
prove when a buffered click can never match a future purchase and evict
it; without the range bound the state grows forever, which is why
``attribute_purchases_stream`` hard-requires the horizon.

Semantics: every (click, purchase) pair for the same user with
``click_ts <= purchase_ts < click_ts + horizon`` — the raw attribution
pair stream.  Picking ONE winning click per purchase (last-touch) is a
per-purchase argmax a downstream batch/foreachBatch step applies; inside
the append-mode join it would need another stateful stage for no
bounded-state benefit.

Batch parity: ``attribute_purchases_batch`` is the same expression on a
static frame; tests/test_attribution_stream.py pins stream == batch on an
in-watermark tape (the near-dup-stream discipline), and that the join
actually EVICTS: a purchase later than any click's horizon produces no
pair and the state row count stays bounded.

Reference analog: J1's event->run interval matching
(operators/run_matching.py) — the same time-window join, lifted to two
unbounded sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(events: DataFrame, ts_col: str, horizon: str):
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col(ts_col).alias("click_ts"),
        )
        .withWatermark("click_ts", horizon)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", horizon)
    )
    return clicks, purchases


def _joined(clicks: DataFrame, purchases: DataFrame, horizon: str) -> DataFrame:
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        clicks.join(purchases, cond)
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            "click_ts",
            "purchase_ts",
            "purchase_value",
            (
                F.col("purchase_ts").cast("double")
                - F.col("click_ts").cast("double")
            ).alias("secs_to_convert"),
        )
    )


def attribute_purchases_stream(
    events: DataFrame, ts_col: str = "ts", horizon: str = "1 hour"
) -> DataFrame:
    """(click, purchase) attribution pairs over a streaming events source
    — see module docstring for the state-bounding contract."""
    clicks, purchases = _sides(events, ts_col, horizon)
    return _joined(clicks, purchases, horizon)


def attribute_purchases_batch(
    events: DataFrame, ts_col: str = "ts", horizon: str = "1 hour"
) -> DataFrame:
    """The identical transformation on a static frame — the stream's
    parity oracle (withWatermark is a no-op in batch plans)."""
    clicks, purchases = _sides(events, ts_col, horizon)
    return _joined(clicks, purchases, horizon)

"""Streaming NeXus sink: aev2 frame stream → per-run Parquet (S6/S7/T5).

The reference appends each assembled frame to the run's HDF5 file as it
arrives, maintaining two cumulative per-run datasets
(nexus-writer/src/nexus_structure/entry/event_data.rs:190-247):

- ``event_time_zero``: frame ts − run collect_from (ns) — stateless (P5);
- ``event_index``: running total of events in all PRIOR frames of the run —
  cumulative ACROSS micro-batches (A5).

``foreachBatch`` handles each micro-batch as a normal batch DataFrame: frames
explode to long events, interval-match to the (broadcast) runs table, and the
within-batch window result is shifted by the per-run totals committed so far.
The continuation totals are re-derived FROM THE SINK on restart — the same
crash-recovery move the reference makes when it reopens an orphaned .nxs file
and reads its sizes back (run_engine/engine.rs:144-173, T5); between batches
they ride in the writer object.

Scale notes: per-batch work is the batch operator (shuffle on run/frame key);
the continuation state is one (frame_seq, event_index) pair per ACTIVE run —
O(runs), kept on the driver, never the data path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.nexus_sink import build_nexus_events
from ..operators.run_matching import match_events_to_runs


def _explode_frames(frames: DataFrame) -> DataFrame:
    """aev2 grouped frames → dev2-style long events with frame columns."""
    z = F.arrays_zip("channel", "event_time", "event_voltage")
    return (
        frames.withColumn("_e", F.explode_outer(z))
        .select(
            "ts",
            "period_number",
            "protons_per_pulse",
            "running",
            "frame_number",
            F.col("veto_flags").alias("frame_veto_flags"),
            "complete",
            "digitizers_present",
            F.col("_e.channel").alias("channel"),
            F.col("_e.event_time").alias("event_time"),
            F.col("_e.event_voltage").alias("event_voltage"),
        )
    )


class NexusStreamWriter:
    """The foreachBatch callable.  Holds per-run continuation totals
    {run_name: (next_frame_seq, next_event_index)}; rebuilds them from the
    sink directory on first use (T5 resume)."""

    def __init__(self, runs: DataFrame, path: str):
        self.runs = runs
        self.path = path
        self._totals: dict[str, tuple[int, int]] | None = None

    def _load_totals(self, spark: SparkSession) -> dict[str, tuple[int, int]]:
        if self._totals is not None:
            return self._totals
        totals: dict[str, tuple[int, int]] = {}
        if os.path.isdir(self.path) and any(
            n.startswith("run_name=") for n in os.listdir(self.path)
        ):
            # T5 resume: re-derive continuation totals from the sink itself
            prev = spark.read.parquet(self.path)
            for r in (
                prev.groupBy("run_name")
                .agg(
                    (F.max("frame_seq") + 1).alias("next_seq"),
                    F.count("*").alias("n_events"),
                )
                .collect()
            ):
                totals[r["run_name"]] = (int(r["next_seq"]), int(r["n_events"]))
        self._totals = totals
        return totals

    def __call__(self, frames_batch: DataFrame, batch_id: int) -> None:
        spark = frames_batch.sparkSession
        totals = self._load_totals(spark)

        long_events = _explode_frames(frames_batch)
        matched = match_events_to_runs(long_events, self.runs)
        nexus = build_nexus_events(matched)

        # shift within-batch frame_seq / event_index by committed totals
        base = [(k, v[0], v[1]) for k, v in totals.items()]
        if base:
            base_df = spark.createDataFrame(base, "run_name string, base_seq long, base_idx long")
            nexus = (
                nexus.join(F.broadcast(base_df), "run_name", "left")
                .withColumn("frame_seq", F.col("frame_seq") + F.coalesce("base_seq", F.lit(0)))
                .withColumn("event_index", F.col("event_index") + F.coalesce("base_idx", F.lit(0)))
                .drop("base_seq", "base_idx")
            )

        nexus.persist()
        try:
            nexus.write.mode("append").partitionBy("run_name").parquet(self.path)
            for r in (
                nexus.groupBy("run_name")
                .agg(F.max("frame_seq").alias("max_seq"), F.count("*").alias("n_ev"))
                .collect()
            ):
                prev = totals.get(r["run_name"], (0, 0))
                totals[r["run_name"]] = (
                    max(prev[0], r["max_seq"] + 1),
                    prev[1] + r["n_ev"],
                )
        finally:
            nexus.unpersist()


def write_nexus_stream(
    frames: DataFrame,
    runs: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """Start the streaming nexus sink.  ``frames`` is the aev2 stream from
    assemble_frames_stream; ``runs`` the (static or per-batch refreshed)
    interval table.  Returns the StreamingQuery."""
    writer = NexusStreamWriter(runs, path)
    q = frames.writeStream.foreachBatch(writer).option("checkpointLocation", checkpoint)
    q = q.trigger(**(trigger or {"availableNow": True}))
    return q.start()

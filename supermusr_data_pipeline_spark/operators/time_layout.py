"""Time-partitioned, time-sorted parquet layout — the data-skipping twin
of the bucketed join layout (operators/bucketed.py) for the TIME axis.

Every time-ranged query in this engine (q04 rates, q12/q19 searches, q65
as-of, q66 sessions, q86 resampling, the run-interval joins) filters on
the event timestamp.  On an unorganized 100 TB table those predicates
scan everything; the right layout pays one sort at write time:

- hive-partition by UTC event DATE -> a day-ranged query prunes whole
  directories before listing a single file (PartitionFilters, the q64
  file-skipping mechanism applied to time);
- sort by ts WITHIN each partition -> every parquet row group's min/max
  ts statistics cover a narrow band, so an intra-day predicate skips most
  row groups of the day it does read (footer-stats skipping — verified
  directly against the written footers in tests/test_time_layout.py,
  which asserts the row-group ts ranges are near-disjoint).

The writer derives the partition column itself (UTC date of ``ts_col``)
so callers cannot partition by a non-UTC drifting key by accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PART_COL = "event_date"


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts"
) -> None:
    """Write ``df`` hive-partitioned by the UTC date of ``ts_col`` and
    sorted by ``ts_col`` within each partition (one repartition + in-
    partition sort — the write-time shuffle that buys every later scan
    its pruning)."""
    (
        df.withColumn(_PART_COL, F.to_date(F.col(ts_col)))
        .repartition(F.col(_PART_COL))
        .sortWithinPartitions(ts_col)
        .write.partitionBy(_PART_COL)
        .mode("overwrite")
        .parquet(path)
    )


def read_time_range(
    spark: SparkSession,
    path: str,
    start: str,
    end: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Scan a time-partitioned table for ``[start, end)``: the date bounds
    become partition filters (directory pruning) and the precise ts bounds
    push to the parquet scan (row-group stats skipping)."""
    return (
        spark.read.parquet(path)
        .filter(
            (F.col(_PART_COL) >= F.to_date(F.lit(start)))
            & (F.col(_PART_COL) <= F.to_date(F.lit(end)))
        )
        .filter((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))
    )

"""Readers for the driver-provided parquet test tables (TESTDATA.md).

Plain ``spark.read.parquet`` — columnar scan with predicate pushdown and
column pruning supplied by Catalyst.  At cluster scale the same call reads a
partitioned table; nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# columns that some generator versions store as parquet TIMESTAMP(NANOS),
# which the vectorized Spark reader rejects; read as BIGINT ns
# (legacy.parquet.nanosAsLong) and convert.  Newer generator versions store
# plain TIMESTAMP(MICROS), which reads directly — detect by the bound dtype.
_NANOS_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLS.get(name, [])
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtypes = dict(df.dtypes)
        for c in ns_cols:
            if dtypes.get(c) == "bigint":
                # integer division — double arithmetic would lose ns precision
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            elif dtypes.get(c, "").startswith("timestamp"):
                # already a timestamp; normalize NTZ → session-local TIMESTAMP
                # so downstream unix_micros()/epoch arithmetic is uniform
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

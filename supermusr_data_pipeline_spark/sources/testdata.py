"""Readers for the driver-provided parquet test tables (TESTDATA.md).

Plain ``spark.read.parquet`` — columnar scan with predicate pushdown and
column pruning supplied by Catalyst.  At cluster scale the same call reads a
partitioned table; nothing here assumes local mode.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# columns that some generator versions store as parquet TIMESTAMP(NANOS),
# which the vectorized Spark reader rejects; read as BIGINT ns
# (legacy.parquet.nanosAsLong) and convert.  Newer generator versions store
# plain TIMESTAMP(MICROS), which reads directly — detect by the parquet
# footer so the legacy conf is only set when the data actually needs it.
_NANOS_TS_COLS = {"events": ["ts"]}

# footer sample size for the mixed-generation check: a directory is assumed
# era-uniform (one generator version per dataset); we verify that assumption
# on a bounded prefix of part files rather than reading every footer on the
# driver (at 100 TB a full footer sweep is its own job)
_FOOTER_SAMPLE = 16


def _footer_dtypes(path: str, col: str) -> set[str]:
    """Parquet-footer dtype(s) of `col` across (a sample of) part files."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))[:_FOOTER_SAMPLE]
    else:
        files = [path]
    kinds = set()
    for f in files:
        schema = pq.read_schema(f)
        if col in schema.names:
            kinds.add(str(schema.field(col).type))
    return kinds


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLS.get(name, [])
    if not ns_cols:
        return spark.read.parquet(path)

    for c in ns_cols:
        try:
            kinds = _footer_dtypes(path, c)
        except Exception:
            # footer not inspectable (exotic fs) — preserve the permissive
            # legacy behavior: allow nanos, branch on the bound dtype below
            kinds = {"timestamp[ns]"}
        if len(kinds) > 1:
            raise ValueError(
                f"{path}: column `{c}` has mixed parquet types across part "
                f"files ({sorted(kinds)}) — the directory mixes generator "
                "eras (NANOS vs MICROS); re-generate the dataset with one "
                "generator version"
            )
        if any(k.startswith("timestamp[ns") or k == "int64" for k in kinds):
            # only the NANOS era needs the legacy flag; setting it is sticky
            # for the session (tasks re-read footers at execution time, so a
            # set-and-restore around the lazy read() would corrupt the scan)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # the NTZ->timestamp cast below reads wall-clock values in the session
    # timezone; pin UTC so the result is the same TZ-independent instant the
    # bigint-nanos path produces (query wrappers also pin this, but ad-hoc
    # sessions reach load_table directly)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
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


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

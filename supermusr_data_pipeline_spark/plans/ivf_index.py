"""Physical IVF index: the embeddings table written PARTITIONED BY cell id,
probed with partition pruning — the code form of the scale claim q29's
docstring makes ("at 100 TB the cell id becomes the table's physical
partitioning so probes prune files").

Layout: one parquet directory per cell (``cell=<k>/``), one file per cell
at this scale (``repartition("cell")`` before the write; at 100 TB each
cell is many files and the same layout holds).  Probing computes the
query-side probe cells from the broadcast codebook, collects the tiny
probe-cell union (≤ |Q|·n_probe ints — the ONLY driver-side value, and it
exists precisely to become a literal partition filter), and scans the
index with ``cell IN (...)`` — Catalyst turns that into PartitionFilters,
so non-probed cells are never listed, opened, or read.  This is the
file-skipping analog of predicate pushdown, pinned by
tests/test_ivf_index.py.

The probe result is value-identical to q29 (same codebook, same probe
order, same rounding, same tie-break) — q64 registers it with q29's
oracle, so the driver cross-checks the physical-layout path end-to-end.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.testdata import load_table, spread_scan
from .relational import _register
from .text_dedup import (
    _codebook,
    _ivf_dots_spark,
    _probe_order_spark,
)
from .text_dedup import ORACLES as _ORACLES

# index builds done by this process, keyed by (appId, sf_dir) — a write is
# a side effect, so it runs once per session per corpus (the registered
# query must be idempotent under the driver's repeated invocation)
_BUILT: dict = {}


def ivf_index_path(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        tempfile.gettempdir(), f"supermusr_ivf_index_{base}.parquet"
    )


def write_ivf_index(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Assign every vector to its coarse cell and write the table
    partitioned by cell — one shuffle on cell id (the same exchange the
    in-memory q29 pays), then a layout that makes every future probe a
    file-pruned scan.  At 100 TB this is the index-build job; re-fit
    monitoring (q48) decides when to rewrite it."""
    cents, _ = _codebook(sf_dir)
    po = _probe_order_spark(len(cents))
    e = spread_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("emb")
    )
    cells = e.withColumn("dots", F.expr(_ivf_dots_spark("emb", cents))).select(
        "vec_id", "emb", F.expr(f"element_at({po}, 1)").alias("cell")
    )
    (
        cells.repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(out_path)
    )


def probe_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    query_filter: str = "vec_id % 50 = 0",
    k: int = 3,
) -> DataFrame:
    """q29's multi-probe search against the written index.  The query side
    never touches the index: probe cells come from the broadcast codebook
    over the source table, and the index scan carries a literal
    ``cell IN (probe union)`` predicate — PartitionFilters in the plan,
    unprobed directories skipped entirely."""
    cents, n_probe = _codebook(sf_dir)
    po = _probe_order_spark(len(cents))
    e = spread_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("emb")
    )
    q = (
        e.filter(F.expr(query_filter))
        .withColumn("dots", F.expr(_ivf_dots_spark("emb", cents)))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.expr(f"slice({po}, 1, {n_probe})").alias("probe"),
        )
    )
    qp = q.select("query_id", "qe", F.explode("probe").alias("pcell"))
    # the probe-cell union: ≤ n_cells ints, collected to become a literal
    # partition filter (file skipping needs a literal, not a join)
    probe_cells = sorted(r.pcell for r in qp.select("pcell").distinct().collect())
    index = (
        spark.read.parquet(index_path)
        .filter(F.col("cell").isin(probe_cells))
        .select("vec_id", "emb", F.col("cell").cast("int").alias("cell"))
    )
    dot = F.expr("aggregate(zip_with(qe, emb, (x, y) -> x * y), 0D, (a, x) -> a + x)")
    norm = "sqrt(aggregate(transform({c}, x -> x * x), 0D, (a, x) -> a + x))"
    sim = F.round(dot / (F.expr(norm.format(c="qe")) * F.expr(norm.format(c="emb"))), 6)
    sims = (
        F.broadcast(qp)
        .join(index, (index.cell == qp.pcell) & (index.vec_id != qp.query_id))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "cell", sim.alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cell", "sim", "rank")
    )


@_register("q64_ivf_indexed_probe", oracle=_ORACLES["q29_ivf_ann"])
def q64_ivf_indexed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q29 through the physical index: build the cell-partitioned layout
    once per session (a $TMPDIR artifact, the trace_file_ingest fixture
    pattern), then answer with a partition-pruned probe.  Registered with
    q29's oracle — the layout change must not move a single value."""
    path = ivf_index_path(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if not _BUILT.get(key):
        write_ivf_index(spark, sf_dir, path)
        _BUILT[key] = True
    return probe_ivf_index(spark, sf_dir, path)


# ---------------------------------------------------------------------------
# SQ8 physical index: quantized codes in the scan path, vectors fetched
# ---------------------------------------------------------------------------


def ivf_sq8_index_path(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        tempfile.gettempdir(), f"supermusr_ivf_sq8_index_{base}.parquet"
    )


def _lit_array(vals) -> str:
    return "array(" + ", ".join(f"{v!r}D" for v in vals) + ")"


def write_ivf_sq8_index(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """The q51 configuration as a layout: cell-partitioned parquet holding
    (vec_id, codes tinyint[64], emb) — parquet column pruning means the
    approx scan reads vec_id+codes (~72 B/row) and never touches emb,
    which only the shortlist fetch reads.  Per-dimension bounds land in a
    ``<out>_meta`` sidecar so the index is self-contained.  Codes are the
    EXACT q41/q51 quantizer (round((x-mn)/step)), stored shifted by -128
    to fit signed tinyint."""
    from .text_dedup import _SQ_DIM

    e = spread_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("emb")
    )
    b = e.agg(
        F.array(
            *[F.min(F.element_at("emb", i)).cast("double") for i in range(1, _SQ_DIM + 1)]
        ).alias("mns"),
        F.array(
            *[F.max(F.element_at("emb", i)).cast("double") for i in range(1, _SQ_DIM + 1)]
        ).alias("mxs"),
    )
    b.write.mode("overwrite").parquet(out_path + "_meta")
    row = spark.read.parquet(out_path + "_meta").collect()[0]
    mns, mxs = _lit_array(row.mns), _lit_array(row.mxs)
    cents, _ = _codebook(sf_dir)
    po = _probe_order_spark(len(cents))
    codes = F.expr(
        f"""transform(sequence(1, {_SQ_DIM}), i ->
            CASE WHEN {mxs}[i-1] > {mns}[i-1]
                 THEN cast(cast(round((emb[i-1] - {mns}[i-1])
                                / (({mxs}[i-1] - {mns}[i-1]) / 255.0D)) as int)
                           - 128 as tinyint)
                 ELSE cast(-128 as tinyint) END)"""
    )
    (
        e.withColumn("dots", F.expr(_ivf_dots_spark("emb", cents)))
        .select(
            "vec_id",
            codes.alias("codes"),
            "emb",
            F.expr(f"element_at({po}, 1)").alias("cell"),
        )
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(out_path)
    )


_COS = (
    "round(aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, x) -> s + x)"
    " / (sqrt(aggregate(transform({a}, x -> x * x), 0D, (s, x) -> s + x))"
    " * sqrt(aggregate(transform({b}, x -> x * x), 0D, (s, x) -> s + x))), 6)"
)


def probe_ivf_sq8_index(
    spark: SparkSession, sf_dir: str, index_path: str, k: int = 3
) -> DataFrame:
    """q51's asymmetric search against the written SQ8 index: the
    partition-pruned scan dequantizes codes against the sidecar bounds
    (value-identical doubles: same code, same step, same ops as q51's
    inline quantizer), exact cosine re-ranks a shortlist fetched from the
    index's emb column by vec_id.  The approx scan's ReadSchema carries
    codes but NOT emb — pinned by test."""
    from .text_dedup import _SQ8_SHORTLIST, _SQ_DIM

    row = spark.read.parquet(index_path + "_meta").collect()[0]
    mns, mxs = _lit_array(row.mns), _lit_array(row.mxs)
    cents, n_probe = _codebook(sf_dir)
    po = _probe_order_spark(len(cents))
    e = spread_scan(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("emb")
    )
    q = (
        e.filter(F.col("vec_id") % 50 == 0)
        .withColumn("dots", F.expr(_ivf_dots_spark("emb", cents)))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.expr(f"slice({po}, 1, {n_probe})").alias("probe"),
        )
    )
    qp = q.select("query_id", "qe", F.explode("probe").alias("pcell"))
    probe_cells = sorted(r.pcell for r in qp.select("pcell").distinct().collect())
    scan = (
        spark.read.parquet(index_path)
        .filter(F.col("cell").isin(probe_cells))
        .select("vec_id", "codes", F.col("cell").cast("int").alias("cell"))
    )
    dq = F.expr(
        f"""transform(sequence(1, {_SQ_DIM}), i ->
            CASE WHEN {mxs}[i-1] > {mns}[i-1]
                 THEN {mns}[i-1]
                      + (cast(codes[i-1] as double) + 128.0D)
                        * (({mxs}[i-1] - {mns}[i-1]) / 255.0D)
                 ELSE {mns}[i-1] END)"""
    )
    approx = (
        F.broadcast(qp)
        .join(scan, (scan.cell == qp.pcell) & (scan.vec_id != qp.query_id))
        .withColumn("dq", dq)
        .select(
            "query_id",
            "qe",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(_COS.format(a="qe", b="dq")).alias("approx_sim"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), "neighbor_id")
    shortlist = (
        approx.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= _SQ8_SHORTLIST)
        .drop("arank")
    )
    fetch = spark.read.parquet(index_path).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    exact = F.broadcast(shortlist).join(fetch, "neighbor_id").withColumn(
        "sim", F.expr(_COS.format(a="qe", b="cemb"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_sim", "sim", "rank")
    )


@_register("q76_ivf_sq8_indexed", oracle=_ORACLES["q51_ivf_sq8_ann"])
def q76_ivf_sq8_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51 through the physical SQ8 index (built once per session, the q64
    pattern); registered with q51's oracle — quantized storage must not
    move a value."""
    path = ivf_sq8_index_path(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "sq8")
    if not _BUILT.get(key):
        write_ivf_sq8_index(spark, sf_dir, path)
        _BUILT[key] = True
    return probe_ivf_sq8_index(spark, sf_dir, path)

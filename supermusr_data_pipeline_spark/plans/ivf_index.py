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

from ..sources.testdata import load_table
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
    e = load_table(spark, sf_dir, "embeddings").select(
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
    e = load_table(spark, sf_dir, "embeddings").select(
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

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the W4 threshold detector (the reference's
trace-to-events hot path) as an Arrow-batched applyInPandas over sf0.001.
``queries()`` — operator inventory from SURVEY.md §2; each callable
(spark, sf_dir) → DataFrame.  ``oracle_sql()`` — DuckDB equivalents with
identical column aliases; DAQ-native queries without a SQL-expressible
oracle (detector/frame state machines on synthetic dat2 traces) are
rows-only per the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from supermusr_data_pipeline_spark.plans import relational  # noqa: E402
from supermusr_data_pipeline_spark.plans import text_dedup  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import text_train  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import ivf_index  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import vector_pq  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import incremental  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import bpe  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import retrieval  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import detectors  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans import envelope  # noqa: E402,F401  (registers queries)
from supermusr_data_pipeline_spark.plans.daq_chain import (  # noqa: E402
    synthetic_daq_chain,
    trace_file_events,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return relational.QUERIES["q14_threshold_detect"](spark, "/root/testdata/sf0.001")


def _daq_full_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full DAQ pipeline (traces → events → frames → nexus table) on
    deterministic synthetic dat2 traces — the reference's end-to-end
    topology (docs/data_pipeline.md:9-71).  Not SQL-expressible (detector
    FSM + stateful assembly) → rows-only check."""
    return synthetic_daq_chain(spark, n_frames=8, n_digitizers=2, n_samples=500)


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline: opaque payloads + typed metadata →
    Arrow-batched decode/feature-extract via mapInPandas (decode stubbed
    with a deterministic fake; plumbing real).  Rows-only check.

    The library API returns ``feature ArrayType(Double)``; the driver's
    canonicalizer sorts rows, so the contract query serializes the array to
    JSON (scalar, sortable) without changing the computed values.
    """
    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )
    from supermusr_data_pipeline_spark.sources.testdata import load_table

    feats = extract_features(media_from_documents(load_table(spark, sf_dir, "documents")))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "digest",
        "mean_intensity",
        "std_intensity",
        F.to_json("feature").alias("feature_json"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(relational.QUERIES)
    q["daq_full_chain"] = _daq_full_chain
    q["multimodal_features"] = _multimodal_features
    q["trace_file_ingest"] = trace_file_events
    return q


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB oracle SQL per query.  Most oracles are static; the IVF/PQ
    family bakes per-corpus constants (codebook, probe count, ADC
    shortlist), so their SQL is generated for the correctness scale —
    ``sf_dir`` if given, else $ORACLE_SF_DIR, else the driver's sf0.01.
    At sf0.001/sf0.01 the resolved strings equal the historical static
    ones (both fall back to the sf0.01 snapshot)."""
    sf = sf_dir or os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return relational.resolve_oracles(sf)

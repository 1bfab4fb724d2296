"""P10: se00 sample-environment waveform expansion, both timestamp modes.

The se00 schema (schemas/ecs_se00_data.fbs:114-154) carries N samples with
EITHER an explicit per-sample ``timestamps[]`` vector OR a
``packet_timestamp + i * time_delta`` compression (``timestamps`` absent).
The reference log writer handles both (nexus-writer/src/nexus/logs/se00.rs);
this operator expands a se00-shaped table (SELOG_SCHEMA) to one row per
sample, choosing the explicit timestamp when present.

All expressions are JVM-side (posexplode + element_at + bigint arithmetic);
the explosion is narrow — no shuffle, linear at any scale.  Nanosecond
arithmetic stays on BIGINT: epoch ns (~1.7e18) exceeds double's 2^53 integer
range, so ``time_delta`` (a double, ns) is rounded per-sample and added as
BIGINT rather than ever mixing the epoch into a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_se00(selog: DataFrame) -> DataFrame:
    """SELOG_SCHEMA rows → one row per sample with ``sample_ts_ns``.

    Output: all non-array input columns plus ``sample_index`` (0-based),
    ``sample_value``, ``sample_ts_ns`` and ``from_explicit`` (which branch
    produced the timestamp).  ``from_explicit`` is PER SAMPLE: if the
    ``timestamps`` vector is shorter than ``values``, the overflow samples
    fall back to the derived timestamp and report false."""
    keep = [c for c in selog.columns if c not in ("values", "timestamps")]
    exploded = selog.select(
        *keep,
        "timestamps",
        F.posexplode("values").alias("sample_index", "sample_value"),
    )
    explicit = F.try_element_at("timestamps", F.col("sample_index") + 1)
    derived = F.unix_micros("packet_ts") * 1000 + F.round(
        F.col("sample_index") * F.col("time_delta")
    ).cast("bigint")
    return exploded.select(
        *keep,
        F.col("sample_index").cast("bigint").alias("sample_index"),
        "sample_value",
        F.coalesce(explicit, derived).alias("sample_ts_ns"),
        explicit.isNotNull().alias("from_explicit"),
    )

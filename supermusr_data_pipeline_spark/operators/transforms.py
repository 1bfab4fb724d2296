"""P2: scalar/array affine voltage transforms, JVM-side.

The reference applies ``scale*x + translate`` to generated traces
(simulator/src/integrated/simulation_elements/utils.rs ``Transformation``,
applied at event_list.rs:61); the trace-to-events normalization is the
affine special case ``sign*(v - baseline)`` (channels.rs:59-68).

Both stay inside whole-stage codegen: scalars as column arithmetic, voltage
arrays via the higher-order ``transform`` — no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def affine(col: Column | str, scale: float, translate: float) -> Column:
    """``scale * col + translate`` as a codegen'd column expression."""
    c = F.col(col) if isinstance(col, str) else col
    return c * F.lit(float(scale)) + F.lit(float(translate))


def apply_affine(
    df: DataFrame, column: str, scale: float, translate: float, out: str | None = None
) -> DataFrame:
    """Affine-transform a scalar column."""
    return df.withColumn(out or column, affine(column, scale, translate))


def apply_affine_array(
    df: DataFrame, column: str, scale: float, translate: float, out: str | None = None
) -> DataFrame:
    """Affine-transform every element of an array column (voltage vectors)
    via the JVM higher-order ``transform`` — narrow, vectorized."""
    return df.withColumn(
        out or column,
        F.transform(column, lambda x: x * F.lit(float(scale)) + F.lit(float(translate))),
    )


def normalize_polarity(
    df: DataFrame, column: str, polarity: int, baseline: float, out: str | None = None
) -> DataFrame:
    """P1 restated through P2: ``sign * (v - baseline)`` per array element
    (trace-to-events/src/channels.rs:59-68)."""
    return apply_affine_array(
        df, column, float(polarity), -float(polarity) * baseline, out=out
    )

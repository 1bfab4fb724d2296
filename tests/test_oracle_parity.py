"""Driver-mimicking correctness harness: run every queries() entry on Spark
AND its DuckDB oracle on the same parquet, compare row count, column names,
and an order-insensitive value hash — the same gate the driver applies at
sf=0.01 (we use sf0.001 for speed; set ORACLE_SF_DIR to override)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _normalize(rows, colnames):
    """Sort columns by name, canonicalize values, return sorted row tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if v is None or v != v:  # None or NaN (pandas NaT/NaN)
            return "\x00NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # collapse -0.0/0.0 and format stably
            return repr(round(v, 9) + 0.0)
        if isinstance(v, bool):
            return repr(v)
        return repr(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


ORACLE_NAMES = sorted(entry_mod.oracle_sql(SF_DIR))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    # resolve the oracle FOR the scale under test — the IVF/PQ family's
    # SQL is parameterized by corpus (codebook / probe / shortlist)
    pdf = _duck(entry_mod.oracle_sql(SF_DIR)[name])
    duck_cols = [c.lower() for c in pdf.columns]
    duck_rows = [tuple(r) for r in pdf.itertuples(index=False)]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"

    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: "
        f"spark={ns[mismatches[0]]} duck={nd[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name, fn in qs.items():
        if name in oracles:
            continue
        assert fn(spark, SF_DIR).count() >= 0, name

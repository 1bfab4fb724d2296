"""Streaming lexical-index ingestion: segment appends, redelivery guard,
crash-retry idempotency via batch-partition overwrite, and BM25-probe
equivalence against a DuckDB oracle over the union corpus."""

import os
import time

import duckdb

from supermusr_data_pipeline_spark.plans.text_dedup import _TOKENS_SQL_DUCK
from supermusr_data_pipeline_spark.streaming.postings_ingest import (
    bm25_topk_over_index,
    ingest_doc_batch,
    ingest_postings_stream,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

DOCS_B1 = [
    (1, "spark shuffles partitions across executors with parquet footers", "en", "s", 60),
    (2, "parquet footers carry column statistics for row group pruning", "en", "s", 60),
    (3, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
]
DOCS_B2 = [
    (4, "executors cache shuffle blocks and spill to disk under pressure", "en", "s", 60),
    (5, "row group pruning skips parquet pages the predicate cannot match", "en", "s", 60),
]


def _oracle_bm25(docs, terms, k1=1.2, b=0.75, topk=10):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(d[0], d[1]) for d in docs]
    )
    qlist = ", ".join(f"('{t}')" for t in terms)
    sql = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
        SELECT (SELECT count(*) FROM documents) AS n,
               (SELECT avg(dl) FROM dl) AS avgdl
    ), dfr AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), q(query_term) AS (VALUES {qlist}),
    scored AS (
        SELECT q.query_term, t.doc_id,
               round(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
                     * (t.tf * ({k1} + 1))
                     / (t.tf + {k1} * (1 - {b} + {b} * d.dl / s.avgdl)), 6) AS score
        FROM q JOIN tf t ON t.term = q.query_term
        JOIN dfr f ON f.term = t.term
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN stats s
    )
    SELECT query_term, doc_id, score, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_term
                                     ORDER BY score DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= {topk}
    ORDER BY query_term, rank
    """
    return [tuple(r) for r in con.execute(sql).fetchall()]


def _probe(spark, idx, terms):
    return sorted(
        (r.query_term, r.doc_id, r.score, r.rank)
        for r in bm25_topk_over_index(spark, idx, terms).collect()
    )


def test_segment_ingest_matches_oracle_and_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "lexidx")
    b1 = spark.createDataFrame(DOCS_B1, SCHEMA)
    b2 = spark.createDataFrame(DOCS_B2, SCHEMA)

    assert ingest_doc_batch(b1, idx, 0) == 3
    terms = ["parquet", "executors", "pruning"]
    assert _probe(spark, idx, terms) == sorted(_oracle_bm25(DOCS_B1, terms))

    # second segment: probe reflects the union corpus (df, avgdl, n all move)
    assert ingest_doc_batch(b2, idx, 1) == 2
    union = DOCS_B1 + DOCS_B2
    assert _probe(spark, idx, terms) == sorted(_oracle_bm25(union, terms))

    # crash-retry: re-running batch 1 overwrites its own segment — index
    # unchanged, probe identical
    before = _probe(spark, idx, terms)
    assert ingest_doc_batch(b2, idx, 1) == 2
    assert _probe(spark, idx, terms) == before

    # redelivery in a LATER batch: doc 4 arrives again under batch 2 with
    # a fresh doc alongside — only the fresh doc is indexed
    b3 = spark.createDataFrame(
        [DOCS_B2[0], (6, "a genuinely new document about fox dens", "en", "s", 40)],
        SCHEMA,
    )
    assert ingest_doc_batch(b3, idx, 2) == 1
    union3 = union + [(6, "a genuinely new document about fox dens", "en", "s", 40)]
    assert _probe(spark, idx, terms) == sorted(_oracle_bm25(union3, terms))


def test_segment_compaction_preserves_probe(spark, tmp_path):
    from supermusr_data_pipeline_spark.plans.index_maintenance import (
        compact_postings_index,
    )

    idx = str(tmp_path / "lexidx")
    ingest_doc_batch(spark.createDataFrame(DOCS_B1, SCHEMA), idx, 0)
    ingest_doc_batch(spark.createDataFrame(DOCS_B2, SCHEMA), idx, 1)
    terms = ["parquet", "executors", "pruning"]
    before = _probe(spark, idx, terms)

    stats = compact_postings_index(spark, idx)
    assert stats["postings"]["files_after"] < stats["postings"]["files_before"]
    assert stats["stats"]["files_after"] == 1
    assert _probe(spark, idx, terms) == before, "compaction moved a value"

    # ingest continues after compaction with fresh batch ids
    ingest_doc_batch(
        spark.createDataFrame(
            [(7, "another parquet pruning article", "en", "s", 30)], SCHEMA
        ),
        idx,
        2,
    )
    union = DOCS_B1 + DOCS_B2 + [(7, "another parquet pruning article", "en", "s", 30)]
    assert _probe(spark, idx, terms) == sorted(_oracle_bm25(union, terms))


def test_streaming_front_door(spark, tmp_path):
    """Streaming segments land on top of a BULK base segment: the base
    uses a negative batch id, so the stream's own batch 0 cannot
    dynamic-overwrite its partitions (the id-space contract in
    ingest_doc_batch's docstring — this is its regression test)."""
    idx = str(tmp_path / "lexidx")
    base_doc = [(99, "a parquet primer document for the base segment", "en", "s", 46)]
    assert ingest_doc_batch(spark.createDataFrame(base_doc, SCHEMA), idx, -2) == 1

    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(DOCS_B1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(DOCS_B2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = ingest_postings_stream(stream, idx, str(tmp_path / "ckpt"))
    deadline = time.time() + 120
    want = sorted(_oracle_bm25(base_doc + DOCS_B1 + DOCS_B2, ["parquet"]))
    got = None
    while time.time() < deadline:
        try:
            got = _probe(spark, idx, ["parquet"])
            if got == want:
                break
        except Exception:
            pass
        time.sleep(0.3)
    q.stop()
    assert got == want

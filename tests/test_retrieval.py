"""Retrieval tier gates: the postings-index probe must actually prune
term buckets (PartitionFilters with the probed tb literals), q114 must
equal q112 value-for-value (same oracle, but pin it directly too), and
the phrase search must agree with a brute-force Python scan of the
corpus."""

import contextlib
import io
import re

import duckdb

import __spark_entry__ as entry_mod
from supermusr_data_pipeline_spark.plans import retrieval

SF_DIR = "/root/testdata/sf0.001"


def test_q114_equals_q112_value_for_value(spark):
    a = sorted(tuple(r) for r in entry_mod.queries()["q112_bm25_topk"](spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in entry_mod.queries()["q114_bm25_indexed"](spark, SF_DIR).collect())
    assert a == b


def test_postings_probe_carries_partition_filters(spark):
    df = entry_mod.queries()["q114_bm25_indexed"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[[^\]]*tb[^\]]*IN \(([^)]*)\)", plan)
    assert m, f"postings scan lost its tb partition filter:\n{plan[:2000]}"
    probed = {int(x) for x in m.group(1).split(",")}
    assert 0 < len(probed) <= retrieval._BM25_N_QUERIES, probed
    assert len(probed) < retrieval._N_TERM_BUCKETS, (
        "probe reads every bucket — no pruning"
    )


def test_phrase_search_agrees_with_python_scan(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos, r.phrase)
        for r in entry_mod.queries()["q113_phrase_search"](spark, SF_DIR).collect()
    }
    assert got, "phrase search found nothing"
    phrase = next(iter(got.values()))[2].split(" ")
    want = {}
    for doc_id, text in rows:
        toks = text.split()
        hits = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == phrase[0] and toks[i + 1] == phrase[1]
        ]
        if hits:
            want[doc_id] = (len(hits), hits[0])
    assert {k: (v[0], v[1]) for k, v in got.items()} == want

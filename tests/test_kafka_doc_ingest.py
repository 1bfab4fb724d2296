"""The LLM-document dedup front door fed from a REAL Kafka topic: JSON
documents produced to the broker, consumed by format("kafka-wire"),
adapted via docs_from_envelope, and run through ingest_shard_stream —
LSH admission against the standing index, in-stream compaction
(maybe_compact with a forced-low threshold), and a malformed-payload
dead letter — the whole training-data ingest contract over the wire."""

import json
import time

from supermusr_data_pipeline_spark.kafka import MiniBroker, MiniProducer
from supermusr_data_pipeline_spark.kafka.spark_source import KafkaWireDataSource
from supermusr_data_pipeline_spark.plans.incremental import write_lsh_index
from supermusr_data_pipeline_spark.streaming.envelope_stream import kafka_source_options
from supermusr_data_pipeline_spark.streaming.shard_ingest import (

    docs_from_envelope,
    ingest_shard_stream,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

BASE_TEXT = "the quick brown fox jumps over the lazy dog near the river bank today"


def _doc(i, text):
    return {"doc_id": i, "text": text, "lang": "en", "source": "kafka",
            "n_chars": len(text)}


def _fresh(i):
    # fully disjoint vocabulary per doc — near-dup admission must only
    # trip on the planted duplicates, not on a shared sentence template
    return _doc(i, " ".join(f"tok{i}n{j}q{(i * 31 + j * 7) % 97}" for j in range(14)))


def test_kafka_doc_dedup_front_door(spark, tmp_path):
    spark.dataSource.register(KafkaWireDataSource)

    # standing index: BASE_TEXT is already in the corpus
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, BASE_TEXT, "en", "s1", len(BASE_TEXT)),
         (2, "some other base document entirely", "en", "s1", 34)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(src / "documents.parquet"))
    idx = str(tmp_path / "idx")
    write_lsh_index(spark, str(src), idx)

    docs = [_fresh(100 + k) for k in range(8)]
    docs.append(_doc(900, BASE_TEXT))          # near-dup of the index → reject
    docs.append(_fresh(100))                   # exact redelivery of doc 100
    n_valid = len(docs)

    decisions = str(tmp_path / "decisions")
    with MiniBroker() as broker:
        with MiniProducer(broker.bootstrap) as prod:
            for d in docs:
                prod.send("documents", json.dumps(d).encode(),
                          key=str(d["doc_id"]).encode())
            prod.send("documents", b"{not json", key=b"poison")  # dead letter

        stream = docs_from_envelope(
            spark.readStream.format("kafka-wire")
            .options(**kafka_source_options(broker.bootstrap, ["documents"],
                                            starting_offsets="earliest",
                                            max_offsets_per_trigger=4))
            .load()
        )
        q = ingest_shard_stream(
            stream, idx, decisions, str(tmp_path / "ckpt"),
            compact_files_threshold=2,
        )
        try:
            deadline = time.monotonic() + 90
            n = 0
            while time.monotonic() < deadline:
                try:
                    n = spark.read.parquet(decisions).count()
                except Exception:
                    n = 0
                if n >= n_valid:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(60)

    all_rows = spark.read.parquet(decisions).collect()
    assert len(all_rows) == n_valid  # one decision per valid message; the
    # poison payload never became a decision
    by_doc: dict[int, list] = {}
    for r in all_rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    rows = {i: rs[0] for i, rs in by_doc.items()}
    assert rows[900].admit is False  # near-dup of the standing index
    for i in range(101, 108):
        assert rows[i].admit is True, rows[i]
    # doc 100 arrived twice (second send is a redelivery): one admit row
    # and one rejection whose reason names the redelivery guard
    d100 = sorted(by_doc[100], key=lambda r: not r.admit)
    assert len(d100) == 2
    assert d100[0].admit is True
    assert d100[1].admit is False and d100[1].reason == "already_ingested"

    # the admitted docs are IN the standing index now (tokens artifact),
    # and in-stream compaction kept per-bucket file counts bounded
    from supermusr_data_pipeline_spark.plans.index_maintenance import (
        _max_files_per_dir,
        resolve_dir,
    )
    import os

    toks = spark.read.parquet(resolve_dir(os.path.join(idx, "tokens")))
    admitted = {i for i, r in rows.items() if r.admit}
    got_ids = {r.doc_id for r in toks.select("doc_id").distinct().collect()}
    assert admitted <= got_ids
    assert 900 not in got_ids
    worst = _max_files_per_dir(resolve_dir(os.path.join(idx, "bands")))
    assert worst <= 3, f"in-stream compaction did not bound files: {worst}"

"""The streaming lexical (postings) front door fed from a REAL Kafka
topic: JSON documents through format("kafka-wire") and
docs_from_envelope into ingest_postings_stream — per-batch segments
appended live, then a BM25 probe over the standing index finds the
planted document.  Completes the trio: all three ingest doors (LSH
docs, vectors, lexical postings) run end-to-end over the wire."""

import json
import time

from supermusr_data_pipeline_spark.kafka import MiniBroker, MiniProducer
from supermusr_data_pipeline_spark.kafka.spark_source import KafkaWireDataSource
from supermusr_data_pipeline_spark.streaming.envelope_stream import kafka_source_options
from supermusr_data_pipeline_spark.streaming.postings_ingest import (
    bm25_topk_over_index,
    ingest_postings_stream,
)
from supermusr_data_pipeline_spark.streaming.shard_ingest import docs_from_envelope

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow



def _doc(i, text):
    return {"doc_id": i, "text": text, "lang": "en", "source": "kafka",
            "n_chars": len(text)}


def test_kafka_postings_front_door(spark, tmp_path):
    spark.dataSource.register(KafkaWireDataSource)
    docs = [
        _doc(1, "zebra quagga okapi wander the northern savanna"),
        _doc(2, "okapi forage alone beneath the canopy"),
        _doc(3, "completely unrelated text about spark shuffles and parquet"),
        _doc(4, "the savanna zebra herd crosses the river"),
    ]
    idx = str(tmp_path / "pidx")
    with MiniBroker() as broker:
        with MiniProducer(broker.bootstrap) as prod:
            for d in docs:
                prod.send("documents", json.dumps(d).encode(),
                          key=str(d["doc_id"]).encode())

        stream = docs_from_envelope(
            spark.readStream.format("kafka-wire")
            .options(**kafka_source_options(broker.bootstrap, ["documents"],
                                            starting_offsets="earliest",
                                            max_offsets_per_trigger=2))
            .load()
        )
        q = ingest_postings_stream(stream, idx, str(tmp_path / "ckpt"))
        try:
            deadline = time.monotonic() + 90
            while time.monotonic() < deadline:
                try:
                    got = bm25_topk_over_index(spark, idx, ["zebra"], topk=5)
                    if got.count() >= 2:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(60)

    top = bm25_topk_over_index(spark, idx, ["zebra", "savanna"], topk=5).collect()
    got_ids = [r.doc_id for r in top]
    assert set(got_ids) == {1, 4}, got_ids  # both zebra/savanna docs, no noise
    okapi = bm25_topk_over_index(spark, idx, ["okapi"], topk=5).collect()
    assert {r.doc_id for r in okapi} == {1, 2}
    # doc 2 is shorter with the same single okapi mention → BM25 length
    # normalization must rank it first
    assert okapi[0].doc_id == 2

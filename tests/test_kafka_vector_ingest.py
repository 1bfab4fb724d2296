"""The vector SemDeDup front door fed from a REAL Kafka topic: JSON
embedding records produced to the broker, consumed via
format("kafka-wire"), adapted by vectors_from_envelope, and run through
ingest_vector_stream — cosine admission against the standing IVF index
with a malformed-payload dead letter.  With docs_from_envelope (LSH +
postings doors), every ingest front door now has a Kafka face."""

import json
import time

import numpy as np

from supermusr_data_pipeline_spark.kafka import MiniBroker, MiniProducer
from supermusr_data_pipeline_spark.kafka.spark_source import KafkaWireDataSource
from supermusr_data_pipeline_spark.plans.text_dedup import _codebook
from supermusr_data_pipeline_spark.streaming.envelope_stream import kafka_source_options
from supermusr_data_pipeline_spark.streaming.vector_ingest import (

    ingest_vector_stream,
    vectors_from_envelope,
    write_vector_index,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

SCHEMA = "vec_id bigint, embedding array<double>"
CENTS = _codebook("")[0]

_rng = np.random.default_rng(11)
BASE = _rng.normal(size=64)
FRESH_A = _rng.normal(size=64)
FRESH_B = _rng.normal(size=64)


def _near(v, eps=1e-3):
    return (v + eps * np.roll(v, 1)).tolist()


def test_kafka_vector_dedup_front_door(spark, tmp_path):
    spark.dataSource.register(KafkaWireDataSource)
    idx = str(tmp_path / "vidx")
    write_vector_index(
        spark.createDataFrame([(1, [float(x) for x in BASE])], SCHEMA), idx, CENTS
    )

    records = [
        (10, _near(BASE)),                  # semantic dup of the base index
        (11, [float(x) for x in FRESH_A]),  # fresh
        (12, _near(FRESH_A)),               # dup of peer 11
        (13, [float(x) for x in FRESH_B]),  # fresh
    ]
    decisions = str(tmp_path / "decisions")
    with MiniBroker() as broker:
        with MiniProducer(broker.bootstrap) as prod:
            for vid, emb in records:
                prod.send("embeddings", json.dumps(
                    {"vec_id": vid, "embedding": emb}).encode(),
                    key=str(vid).encode())
            prod.send("embeddings", b"not json at all", key=b"poison")

        stream = vectors_from_envelope(
            spark.readStream.format("kafka-wire")
            .options(**kafka_source_options(broker.bootstrap, ["embeddings"],
                                            starting_offsets="earliest",
                                            max_offsets_per_trigger=2))
            .load()
        )
        q = ingest_vector_stream(stream, idx, decisions, str(tmp_path / "ckpt"), CENTS)
        try:
            deadline = time.monotonic() + 90
            n = 0
            while time.monotonic() < deadline:
                try:
                    n = spark.read.parquet(decisions).count()
                except Exception:
                    n = 0
                if n >= len(records):
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(60)

    d = {r.vec_id: r for r in spark.read.parquet(decisions).collect()}
    assert len(d) == len(records)  # the poison payload never became a decision
    assert not d[10].admit and d[10].reason == "sem_dup_of_base"
    assert d[11].admit and d[13].admit
    # vec 12 dups vec 11: same-batch peer or, split by the 2-record
    # trigger cap, a later batch blocked by the grown index
    assert not d[12].admit
    assert d[12].reason in ("sem_dup_of_earlier_peer", "sem_dup_of_base")
    got = {r.vec_id for r in spark.read.parquet(idx).collect()}
    assert got == {1, 11, 13}

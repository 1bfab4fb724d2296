"""S8 CLI: decode and pretty-print pipeline messages (the kafka-tail analog).

The reference ships a diagnostics binary that tails a topic and
pretty-prints any pipeline message (diagnostics/src/kafka_tail.rs:10-52).
This module is the Spark equivalent over the envelope shape:

    python -m supermusr_data_pipeline_spark.dump <envelope.parquet> [n]
    python -m supermusr_data_pipeline_spark.dump kafka://host:port/topicA,topicB [n]

The first form reads an envelope table (``topic string, value binary`` —
e.g. the output of the schedule DSL, or rows captured from a Kafka
topic).  The second form tails a LIVE broker over the wire protocol
(kafka/client.py): each subscribed partition is positioned ``n`` records
before its log end and drained — the reference tail's read window.
Prints one summary line per message either way.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    path = args[0]
    limit = int(args[1]) if len(args) > 1 else 50

    from pyspark.sql import SparkSession

    from .operators.diagnostics import dump_messages
    from .session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark("supermusr-dump")
    spark.sparkContext.setLogLevel("ERROR")
    if path.startswith("kafka://"):
        addr, _, topic_list = path[len("kafka://") :].partition("/")
        if not topic_list:
            print("kafka:// URL needs /topic[,topic...]")
            return 2
        from .kafka.client import MiniConsumer

        with MiniConsumer(addr, topic_list.split(","),
                          starting_offsets="earliest") as cons:
            cons.seek_tail(limit)
            recs = []
            while True:
                batch = cons.poll(max_wait_ms=100)
                if not batch:
                    break
                recs.extend(batch)
        env = spark.createDataFrame(
            [(r.topic, r.value) for r in recs], "topic string, value binary"
        )
    else:
        env = spark.read.parquet(path)
    rows = dump_messages(env).limit(limit).collect()
    for r in rows:
        print(f"[{r.topic}] {r.identifier or '????'} {r.n_bytes:>7}B  {r.summary}")
    print(f"({len(rows)} messages)")
    if existing is None:  # only stop a session this CLI itself created
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

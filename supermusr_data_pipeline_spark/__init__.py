"""supermusr_data_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the SuperMuSR DAQ pipeline
(STFC-ICD-Research-and-Design/supermusr-data-pipeline).

The reference is a set of Rust streaming services (Kafka + FlatBuffers +
HDF5).  This package re-expresses its capabilities Spark-first:

- ``schemas``    — static StructTypes for the message/table shapes (§1 of SURVEY.md)
- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``sources``    — batch/streaming readers (driver parquet, .traces binary files)
- ``functions``  — scalar/column transforms (time conversion, normalization, text,
                   similarity) — all JVM-side ``pyspark.sql.functions`` compositions
- ``operators``  — the operator inventory (detectors, windows, frame assembly,
                   run matching, nexus sink, dedup, ANN, search)
- ``generator``  — deterministic seeded trace/event/run synthesis (simulator parity)
- ``streaming``  — Structured Streaming lifts (stateful frame assembly, run FSM,
                   DAQ observability)
- ``plans``      — end-to-end dataflows mirroring the reference services
"""

__version__ = "0.1.0"

"""data_ingestion_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``babakhanov/data-ingestion-pipeline`` (reference surveyed in SURVEY.md),
re-expressed Spark-first:

- ``session``    SparkSession factory (UTC, AQE, Arrow on).
- ``sources``    readers (parquet catalog, CSV with explicit schemas) and sinks.
- ``operators``  relational query operators: the six report queries, joins,
                 window functions, top-k-per-group, TPC-H-style coverage.
- ``functions``  scalar/vector/text column function library.
- ``plans``      multi-step logical operations: MERGE upsert, schema evolution.
- ``streaming``  Structured Streaming ingestion and windowed aggregation.
- ``dedup``      exact + near-duplicate detection (MinHash LSH, SimHash, n-gram).
- ``similarity`` embedding similarity search (brute-force + LSH-bucketed ANN).
- ``multimodal`` binary-column (image/audio/video) plumbing with stubbed codecs.

The engine is declarative: every operator builds a DataFrame plan and lets
Catalyst/Tungsten choose the physical strategy. Python UDFs appear only where
built-in expressions genuinely cannot express the semantics, and then always
as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

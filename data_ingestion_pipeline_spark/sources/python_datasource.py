"""Custom Python data source (pyspark.sql.datasource, Spark 4) — the
extension point for reading systems Spark has no built-in connector for.

The reference reads exactly two CSVs with pandas; a complete engine needs a
way to ingest from arbitrary systems. Spark 4's Python DataSource API slots
a pure-Python reader into the scan: the driver asks ``partitions()`` for
the split list (this is what makes the source PARALLEL — each
InputPartition becomes one Spark task), then each executor calls ``read()``
for its split. Yielding pyarrow RecordBatches keeps the transfer
Arrow-vectorized instead of row-at-a-time tuples.

The demo source generates a deterministic event stream from arithmetic on
the row id — no RNG, no state — so an external engine can recompute it
from ``range()`` and the driver's DuckDB oracle can hash-check a query
over a *custom source* end to end. A real connector (REST cursor, message
queue, proprietary store) swaps the arithmetic for IO and keeps the exact
same partition/read shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = [
    "SyntheticEventsDataSource",
    "JsonlSinkDataSource",
    "read_synthetic_events",
    "synthetic_events_stream",
]

_MULT = 2654435761  # Knuth multiplicative hash constant
_MOD = 100_000


class _Reader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", _MOD))
        self.parts = int(options.get("parts", 8))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        import numpy as np
        import pyarrow as pa

        p = partition.value
        lo = self.n * p // self.parts
        hi = self.n * (p + 1) // self.parts
        ids = np.arange(lo, hi, dtype="int64")
        # pure integer arithmetic + one IEEE division — bit-identical in
        # any engine, so the DuckDB oracle recomputes it from range()
        score = ((ids * _MULT) % _MOD).astype("float64") / float(_MOD)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids),
                pa.array((ids % 7).astype("int32")),
                pa.array(score),
            ],
            names=["id", "bucket", "score"],
        )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, score DOUBLE"

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> "_StreamReader":
        return _StreamReader(self.options)


def read_synthetic_events(
    spark: SparkSession, n: int = _MOD, parts: int = 8
) -> DataFrame:
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.read.format("synthetic_events")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )


class _StreamReader(SimpleDataSourceStreamReader):
    """Deterministic streaming variant: offsets are plain row counters, so
    any micro-batch boundary yields the same union of rows, and
    ``readBetweenOffsets`` replays a committed range bit-identically
    (arithmetic source — replay IS recompute). A real connector keeps this
    offset/replay contract and swaps arithmetic for IO."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", _MOD))
        self.batch = int(options.get("batch", 10_000))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST iterator, not a generator: Spark's prefetch cache
        # copy.copy()s and pickles the iterator for micro-batch replay,
        # which list_iterator supports and generators do not
        return iter(
            [
                (i, int(i % 7), float((i * _MULT) % _MOD) / float(_MOD))
                for i in range(lo, hi)
            ]
        )

    def read(self, start: dict):
        lo = int(start["id"])
        hi = min(lo + self.batch, self.n)
        return self._rows(lo, hi), {"id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["id"]), int(end["id"]))


def synthetic_events_stream(
    spark: SparkSession, n: int = _MOD, batch: int = 10_000
) -> DataFrame:
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.readStream.format("synthetic_events")
        .option("n", str(n))
        .option("batch", str(batch))
        .load()
    )


class JsonlSinkDataSource(DataSource):
    """Python DataSource WRITER (the write side of the pyspark.sql.datasource
    API): each executor partition serializes its rows to one JSON-lines file
    under ``path`` and returns the file name as its commit message; commit()
    publishes a manifest listing exactly the committed files, so readers see
    an atomic, task-retry-safe file set (a retried task's orphan file is
    never manifested — the same two-phase contract as the V2 sinks).
    abort() removes any files the failed attempt reported."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # write-only source; schema comes from the df
        return "id BIGINT"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, overwrite)


class _JsonlWriter(DataSourceWriter):
    """JSONL sink for the Python DataSource API.

    LOCAL-MODE-ONLY sink: ``write()`` opens per-partition files with plain
    ``open()`` on the executor's local filesystem and ``commit()`` writes
    the manifest driver-side into the same directory — correct only when
    driver and executors share a filesystem (local[...] / a shared mount).
    On a multi-node cluster the manifest would reference files the driver
    cannot see; a distributed deployment must route paths through a shared
    FS/object-store client (and make commit() rename from a task-attempt
    staging prefix for exactly-once semantics). Kept plain here because
    the operator exists to exercise the DataSource writer protocol, and
    the production write path in this engine is the parquet/ORC sinks.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import os
        import shutil

        self.path = options["path"]
        if overwrite:
            shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        fname = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, fname)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        msg = WriterCommitMessage()
        msg.file = fname  # type: ignore[attr-defined]
        msg.rows = n  # type: ignore[attr-defined]
        return msg

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(m.file for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        # a failed task's commit message arrives as None (DataSourceWriter
        # contract) — skipping it keeps abort itself from raising and
        # masking the original task failure
        for m in messages or []:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.file))
            except OSError:
                pass

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
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = [
    "SyntheticEventsDataSource",
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

"""JDBC relational sink/source — the reference's actual sink, rebuilt.

The reference lands every batch in Postgres via SQLAlchemy row inserts
(reference ``flows/data_ingestion.py:164-216``, ``compose.yaml:4-16``);
Spark's counterpart is ``df.write.jdbc`` — executors open JDBC connections
and stream batched INSERTs in parallel, the driver never materializes rows.

The sandbox has no Postgres, but Spark ships Apache Derby (the Hive
metastore's embedded store), whose JDBC driver is on every executor
classpath — so the parity path is exercised end to end against an embedded
Derby database rather than mocked. Cluster notes per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["derby_url", "write_jdbc", "read_jdbc"]

_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby JDBC URL rooted at a directory (created on demand)."""
    return f"jdbc:derby:{db_dir};create=true"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    num_partitions: int | None = 1,
    batchsize: int = 10_000,
) -> None:
    """S4/S5 parity sink: executors write batched INSERTs over JDBC.

    ``num_partitions`` defaults to 1 here because embedded Derby serializes
    writers; against a server-grade store (the reference's Postgres) set it
    to the store's ingest parallelism — each partition opens one connection
    and streams ``batchsize`` rows per round trip, which is the set-based
    replacement for the reference's row-at-a-time SQLAlchemy inserts.
    """
    out = df.coalesce(num_partitions) if num_partitions else df
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", _DERBY_DRIVER)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """JDBC scan. With a numeric ``partition_column`` + bounds the read
    splits into ``num_partitions`` range-predicate queries executed by
    different executors — the only way a JDBC scan parallelizes; without it
    the whole table streams through one task (fine for dimension-sized
    relations, wrong for facts)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", _DERBY_DRIVER)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()

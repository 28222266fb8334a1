"""SparkSession factory.

One place to configure the engine so every entry point (tests, bench,
``__spark_entry__``, streaming jobs) runs with identical semantics:

- UTC session timezone (oracle parity: DuckDB timestamps are UTC-naive).
- AQE on (runtime shuffle coalescing, skew-join splitting) — at 100 TB the
  static plan is always wrong somewhere; AQE re-plans from observed stats.
- Arrow on (fast pandas interchange for the pandas-UDF slow path).
- Shuffle partitions default to the local core count; on a real cluster this
  is overridden via ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (rule of thumb:
  ~2-3x total executor cores, or let AQE coalesce from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "data_ingestion_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster
    pass ``None`` with a pre-set master URL in the environment, or an explicit
    ``yarn``/``k8s://...`` value.
    """
    cores = _default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cores, 8)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[N] runs driver + executors in ONE JVM; the 1g default heap
        # is sized for a thin cluster driver, not for N executor threads.
        # Ignored (harmlessly) once a JVM is already up.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Managed-table warehouse (bucketed tables, saveAsTable) — under
        # /tmp so the repo/CWD never collects spark-warehouse/ droppings.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_scratch/warehouse"
            ),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Scan-task sizing. Two regimes:
        # - cluster, 100 TB: 128-512 MB per task (set via env) so task count
        #   stays bounded and each task's input fits executor memory;
        # - local bench: the fixtures are SINGLE small parquet files, so the
        #   128 MB default yields 1-2 scan partitions and every CPU-heavy
        #   expression pipeline (shingling, minhash, vector math) serializes
        #   onto 2 of 32 cores. A small split size restores scan parallelism.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4194304"),
        )
        # Same trade for AQE: its 64 MB advisory target would coalesce the
        # small-but-CPU-dense shuffles of the local bench to 1-2 partitions.
        # Sized in bytes of shuffle data, not compute — keep it small locally,
        # raise via env on a real cluster where shuffle volume dominates.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "4194304"),
        )
        .config("spark.ui.enabled", "false")
        # Parquet TIMESTAMP(NANOS) (the events fixture) is otherwise a hard
        # error; read as long and convert in the catalog loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

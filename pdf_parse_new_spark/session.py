"""SparkSession factory tuned for the extraction workload.

Local testing runs ``local[N]``; the same settings are what we'd submit with
``spark-submit --py-files`` on a real cluster (AQE on, Arrow on, shuffle
partitions sized ~2-3x parallelism — the oversaturation heuristic the
reference applies to its worker pools, lib/SmartPDFParser.js:447-457).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "pdf-parse-new-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(32, cores * 2)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

"""SparkSession construction with the engine's scale-oriented defaults.

These are the settings we would ship to a 1000-executor cluster via
``spark-submit --py-files``; locally they apply to ``local[N]`` unchanged:

* AQE on (runtime coalescing + skew splitting around the UDF stage);
* Arrow enabled with a bounded ``maxRecordsPerBatch`` — the extraction UDF
  re-chunks by bytes, but bounding record count keeps the JVM→Python transfer
  of span-heavy rows small;
* shuffle partition count sized to the parallelism level rather than the
  200-partition default (at cluster scale this would instead be ~2-3× total
  cores, or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    master: str | None = None,
    app_name: str = "paperoni-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

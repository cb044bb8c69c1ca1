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


# SQL confs that are settable AFTER session creation — spark-submit jobs
# receive an externally-built session (the submitter owns JVM-start confs
# like driver memory) and must still get the engine's Arrow bounds
RUNTIME_ENGINE_CONFS = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # bound the JVM→Python Arrow transfer: with heavy-tailed span rows the
    # 10,000-record default produces multi-GB direct buffers and kills the
    # job with an Arrow OutOfMemoryException at high task concurrency
    # (reproduced at 500k synthetic docs on local[32] with a 1g driver)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def apply_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable confs to an existing session
    (the spark-submit path, where the session is built by the submitter)."""
    for k, v in RUNTIME_ENGINE_CONFS.items():
        spark.conf.set(k, v)
    return spark


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
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

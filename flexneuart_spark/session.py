"""SparkSession factory tuned for the engine.

Local-mode defaults follow the public PySpark guidance: shuffle partitions
sized to cores, AQE on (runtime coalesce + skew mitigation), Arrow enabled
for pandas-UDF exchange. On a real cluster the same builder is used by
``spark-submit --py-files``; only master/memory flags differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flexneuart_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS")
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = int(master[6:-1])
        elif cores and cores.isdigit():
            shuffle_partitions = int(cores)
        else:
            shuffle_partitions = 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # Local-mode shuffle/spill goes through spark.local.dir; the sandbox's
    # root disk serializes it badly. Use tmpfs when available (a real
    # cluster points this at executor-local NVMe instead).
    if os.path.isdir("/dev/shm") and "spark.local.dir" not in (extra_conf or {}):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

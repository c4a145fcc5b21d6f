"""SparkSession factory with the engine's tuned defaults.

Every knob here is scale-motivated (SURVEY.md §4.3): AQE for runtime
re-planning + skew-join splitting, Arrow for vectorized pandas-UDF transport
(the only Python in the hot path is the MIME->Markdown stage, and it moves in
Arrow batches, never rows), and a bounded shuffle-partition default that AQE
coalesces downward on small inputs and the caller raises for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "confluence2md-kg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # MIME documents are ~1-10 KB; 10k rows/batch keeps Arrow batches in
        # the tens of MB — large enough to amortize the JVM<->Python hop,
        # small enough to never blow a Python worker at 100 TB row sizes.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        # local mode = driver-only JVM: its heap IS the whole cluster memory.
        # 32 concurrent tasks × execution memory (hash maps, sorts) + cached
        # broadcasts OOM'd at 8g on a 1.28M-doc run; the sandbox has 128 GiB,
        # so size the single JVM like the N executors it stands in for.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark

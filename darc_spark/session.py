"""SparkSession factory tuned for the frontier workload.

Scale notes (100 TB / 1000-executor design intent, tested on local[32]):

* AQE on — runtime coalescing + skew-join splitting; hot hostnames are a
  first-class skew source in a crawl frontier (the reference has no skew
  handling at all: one hot host can starve a worker round,
  ``darc/process.py:97-98``).
* ``spark.sql.shuffle.partitions`` defaults to 2× cores locally; on a real
  cluster this should be ~2-3× total cores and AQE coalesces down.
* Arrow enabled for every pandas UDF boundary; batch size capped so binary
  image columns don't blow executor memory.
* Session timezone pinned to UTC so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "darc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with frontier-tuned defaults."""
    # Make the package importable in executor Python workers regardless of
    # the driver's cwd (deployment contract: spark-submit --py-files; in
    # local mode the worker daemons read PYTHONPATH at JVM start).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            cores = os.cpu_count() or 8 if inner == "*" else int(inner)
        else:
            cores = os.cpu_count() or 8
        shuffle_partitions = max(8, 2 * cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

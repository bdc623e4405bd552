"""SparkSession construction with scale-appropriate defaults.

The reference has no session concept (eager pandas); this is the Spark-side
replacement for its implicit "runtime". All knobs here are chosen for the
100 TB design point but degrade gracefully on ``local[*]``:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting means a
  plan tuned at sf0.1 still behaves at 1000 executors.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces.
- Arrow enabled so Pandas-UDF operators (dedup, multimodal) batch efficiently.
- Session timezone pinned to UTC so timestamp semantics are reproducible and
  match the DuckDB oracle (naive wall-clock parquet timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "trading-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``)
    when not attached to a cluster. On a real cluster, pass ``master=None``
    and let spark-submit own it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{cpus}]"
    builder = builder.master(master)
    n_shuffle = shuffle_partitions or (int(cpus) if cpus.isdigit() else 32)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # engine policy: every Python boundary is Arrow-batched, UDTFs
        # included (tests/test_no_python_udfs.py enforces the plans)
        "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tables_dir(sf_dir: str | None = None) -> str:
    """Resolve the parquet table directory (driver contract)."""
    return sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

"""PySpark-native analytics engine with the capabilities of the reference
``dariakriukova/trading-data-pipeline`` (a pandas+boto3 Xetra ETL), rebuilt
Spark-first and extended with LLM-data-pipeline operators.

Layout
------
- ``session``    — tuned SparkSession builder (AQE, shuffle partitions, UTC)
- ``config``     — YAML → dataclass config binding (ref: xetra_transformer.py:13-66)
- ``sources``    — filesystem/object-store connector: list, csv/parquet read,
                   format-checked write (ref: xetra/common/s3.py)
- ``meta``       — incremental meta-file protocol (ref: xetra/common/meta_process.py)
- ``operators``  — report1 OHLC pipeline, relational coverage, dedup family,
                   similarity search, text analysis, as-of join, event windows,
                   multimodal plumbing
- ``functions``  — reusable column expressions (vector math, hashing, text)
- ``streaming``  — Structured Streaming variants of the batch operators
- ``plans``      — plan-inspection helpers (pushdown/codegen assertions)

Every operator is designed for a multi-executor cluster at ~100 TB: explicit
schemas, broadcast-able dimensions, partition-pruned scans, and no driver-side
row iteration. Tests run on ``local[*]``.
"""

__version__ = "0.1.0"

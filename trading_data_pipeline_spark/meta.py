"""Incremental meta-file protocol — port of ``MetaProcess``
(xetra/common/meta_process.py:15-125).

The meta table is a tiny state file ``(source_date, datetime_of_processing)``
that records which source dates were already processed. Two operations:

- ``update_meta_file``: append newly-processed dates (with one shared
  processing timestamp) to the file, guarding against schema drift
  (meta_process.py:20-59).
- ``return_date_list``: compute which dates still need extraction — build a
  date spine from ``first_date - 1 day`` through today, subtract the dates
  already in the meta file, return ``(min_missing, all spine dates >=
  min_missing - 1 day)``: the returned *min date* is the output cutoff
  (ref meta_process.py:100-102 returns ``min_date + 1 day``), while the
  returned *date list* still starts one day earlier so the LAG warm-up row
  is scanned but never re-emitted or re-appended to the meta file; sentinel
  ``2200-01-01`` + empty list when nothing is missing (meta_process.py:61-125).

Design: the date arithmetic is pure driver-side Python (the spine is at most
a few thousand elements — SURVEY.md §2 row 21); the table I/O goes through
Spark so the same code works on s3a:// at scale. The set-difference is the
same anti-join the engine exposes as ``q_anti_join_dates``.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .exceptions import WrongMetaFileException
from .sources.connector import FileSystemConnector

META_DATE_COL = "source_date"  # ref constants.py:24-26
META_PROCESS_COL = "datetime_of_processing"
META_DATE_FORMAT = "%Y-%m-%d"  # ref constants.py:22
META_PROCESS_FORMAT = "%Y-%m-%d %H:%M:%S"  # ref constants.py:23
META_FILE_FORMAT = "csv"

META_SCHEMA = StructType(
    [
        StructField(META_DATE_COL, StringType(), True),
        StructField(META_PROCESS_COL, StringType(), True),
    ]
)


def _read_meta(connector: FileSystemConnector, meta_key: str) -> DataFrame | None:
    """Read the meta table; None when it doesn't exist yet (first run).

    Ref meta_process.py:52-54,116-118 — boto3 NoSuchKey → empty meta.
    """
    if not connector.exists(meta_key):
        return None
    # Read the header AS WRITTEN (no imposed schema, no inference → all
    # strings): the schema-drift guard must see the file's real columns
    # (ref meta_process.py:47-50 compares actual vs expected column sets).
    # Goes through the connector duck-type so the same protocol runs over
    # a directory tree (FileSystemConnector) or a bucket (BucketConnector).
    return connector.read_csv_raw(meta_key)


def update_meta_file(
    connector: FileSystemConnector,
    meta_key: str,
    extract_date_list: list[str],
    now: datetime | None = None,
) -> bool:
    """Append processed dates to the meta file (ref meta_process.py:20-59).

    Schema drift in the existing file raises WrongMetaFileException
    (column-multiset comparison, :47-50). The whole file is rewritten —
    correct for a tiny state table; at scale this would be a Delta-style
    transactional append.
    """
    if not extract_date_list:
        return True
    spark = connector.spark
    stamp = (now or datetime.today()).strftime(META_PROCESS_FORMAT)
    new_df = spark.createDataFrame(
        [(d, stamp) for d in extract_date_list], META_SCHEMA
    )
    old_df = _read_meta(connector, meta_key)
    if old_df is not None:
        if sorted(old_df.columns) != sorted(new_df.columns):
            raise WrongMetaFileException(
                f"meta file columns {old_df.columns} != expected {new_df.columns}"
            )
        new_df = old_df.unionByName(new_df)
    # single CSV object, matching the reference's one-key meta layout
    connector.write_single_object(new_df, meta_key, META_FILE_FORMAT)
    return True


def date_spine(first_date: str, today: date | None = None) -> list[date]:
    """Dates from ``first_date - 1 day`` through today (ref :77-87)."""
    start = datetime.strptime(first_date, META_DATE_FORMAT).date() - timedelta(days=1)
    end = today or date.today()
    return [start + timedelta(days=i) for i in range((end - start).days + 1)]


def return_date_list(
    connector: FileSystemConnector,
    first_date: str,
    meta_key: str,
    today: date | None = None,
) -> tuple[str, list[str]]:
    """(extract start date, list of dates to process) — ref :61-125.

    The min date is the OUTPUT cutoff: ``first_date`` on first run (:118)
    or ``min(missing)`` on a gap restart (:98-102, ``min_date + 1 day``).
    The date LIST starts one day earlier (the LAG warm-up day, :103-107 /
    :119-124) — it is scanned so pct-change has its previous close, but
    rows before the cutoff are filtered out of the report and never
    re-appended to the meta file (``meta_update_list`` keeps only dates
    ``>= extract_date``). Everything processed → sentinel ``2200-01-01``,
    empty list (:108-115).
    """
    spine = date_spine(first_date, today)
    meta_df = _read_meta(connector, meta_key)
    if meta_df is None:
        # ref :118 returns first_date itself; the list still starts a day
        # early. Re-format through strptime so a parseable-but-unpadded
        # config date ('2021-4-16') yields the same normalized form as the
        # spine strings — the downstream Date >= cutoff filters compare
        # lexicographically and would silently drop every row otherwise.
        normalized = datetime.strptime(first_date, META_DATE_FORMAT).strftime(
            META_DATE_FORMAT
        )
        return normalized, [d.strftime(META_DATE_FORMAT) for d in spine]
    else:
        processed = {
            datetime.strptime(r[0], META_DATE_FORMAT).date()
            for r in meta_df.select(F.col(META_DATE_COL)).collect()
        }
        missing = sorted(set(spine[1:]) - processed)
        if not missing:
            return "2200-01-01", []
        return_min = min(missing)
        warmup = return_min - timedelta(days=1)
        dates = [d for d in spine if d >= warmup]
    return (
        return_min.strftime(META_DATE_FORMAT),
        [d.strftime(META_DATE_FORMAT) for d in dates],
    )

"""Meta/incremental protocol tests — the 8 reference cases
(tests/common/test_meta_process.py:58-314) on local paths.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from trading_data_pipeline_spark.exceptions import WrongMetaFileException
from trading_data_pipeline_spark.meta import (
    META_DATE_COL,
    META_PROCESS_COL,
    META_SCHEMA,
    return_date_list,
    update_meta_file,
)
from trading_data_pipeline_spark.sources.connector import FileSystemConnector

TODAY = date(2021, 4, 20)
NOW = datetime(2021, 4, 20, 12, 0, 0)
META_KEY = "meta/meta_file.csv"


@pytest.fixture()
def conn(spark, tmp_path):
    return FileSystemConnector(spark, str(tmp_path))


def read_meta(conn):
    df = conn.read_csv(META_KEY, schema=META_SCHEMA)
    return sorted(map(tuple, df.collect()))


def test_update_creates_meta(conn):
    # ref test_meta_process.py:58-101 — first write creates the file
    assert update_meta_file(conn, META_KEY, ["2021-04-16", "2021-04-17"], NOW)
    assert read_meta(conn) == [
        ("2021-04-16", "2021-04-20 12:00:00"),
        ("2021-04-17", "2021-04-20 12:00:00"),
    ]


def test_update_appends(conn):
    update_meta_file(conn, META_KEY, ["2021-04-16"], NOW)
    update_meta_file(conn, META_KEY, ["2021-04-17"], datetime(2021, 4, 21, 8, 0, 0))
    assert read_meta(conn) == [
        ("2021-04-16", "2021-04-20 12:00:00"),
        ("2021-04-17", "2021-04-21 08:00:00"),
    ]


def test_update_empty_list_noop(conn, tmp_path):
    assert update_meta_file(conn, META_KEY, [], NOW) is True
    assert not (tmp_path / META_KEY).exists()


def test_wrong_schema_raises(conn, spark):
    # ref test_meta_process.py:160-182 — wrong_column header → exception
    bad = spark.createDataFrame(
        [("2021-04-16", "x")], f"wrong_column string, {META_PROCESS_COL} string"
    )
    conn.write_single_object(bad, META_KEY, "csv")
    with pytest.raises(WrongMetaFileException):
        update_meta_file(conn, META_KEY, ["2021-04-17"], NOW)


def test_date_list_no_meta_full_backfill(conn):
    # ref meta_process.py:116-124 — no meta → min date is first_date itself,
    # the scan list still starts at first_date - 1 (LAG warm-up day)
    start, dates = return_date_list(conn, "2021-04-16", META_KEY, today=TODAY)
    assert start == "2021-04-16"
    assert dates == [
        "2021-04-15", "2021-04-16", "2021-04-17",
        "2021-04-18", "2021-04-19", "2021-04-20",
    ]


def test_date_list_partial_meta(conn):
    # ref meta_process.py:88-107 — gap → min date is min(missing) (:100-102);
    # the scan list starts one day earlier so LAG sees the previous close
    update_meta_file(conn, META_KEY, ["2021-04-16", "2021-04-17"], NOW)
    start, dates = return_date_list(conn, "2021-04-16", META_KEY, today=TODAY)
    assert start == "2021-04-18"
    assert dates == ["2021-04-17", "2021-04-18", "2021-04-19", "2021-04-20"]


def test_date_list_up_to_date_sentinel(conn):
    # ref meta_process.py:108-115 — nothing missing → sentinel 2200-01-01
    update_meta_file(
        conn, META_KEY,
        ["2021-04-16", "2021-04-17", "2021-04-18", "2021-04-19", "2021-04-20"],
        NOW,
    )
    start, dates = return_date_list(conn, "2021-04-16", META_KEY, today=TODAY)
    assert start == "2200-01-01"
    assert dates == []


def test_meta_columns_names():
    assert META_DATE_COL == "source_date"
    assert META_PROCESS_COL == "datetime_of_processing"

def test_date_list_no_meta_normalizes_unpadded_date(conn):
    # a parseable-but-unpadded config date must come back zero-padded, or
    # the lexicographic Date >= cutoff filters downstream drop every row
    start, dates = return_date_list(conn, "2021-4-16", META_KEY, today=TODAY)
    assert start == "2021-04-16"
    assert dates[0] == "2021-04-15"

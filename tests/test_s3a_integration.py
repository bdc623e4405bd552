"""Object-store contract test: the connector + meta protocol over a REAL
``s3a://`` scheme against a local S3 stand-in (moto server), mirroring the
reference's live-S3 integration test
(tests/integration_tests/test_int_xetra_transformer.py:280-304, buckets
:43-44).

Requires the ``hadoop-aws`` module (S3AFileSystem) on the Spark classpath.
The stock ``pip install pyspark`` distribution does not bundle it, and this
container has no network to fetch it, so the suite SKIPS there — it runs
green on any deployment image that ships hadoop-aws + aws-sdk-bundle
(spark-submit --packages org.apache.hadoop:hadoop-aws:<hadoop version>).
"""

from __future__ import annotations

import socket
import subprocess
import sys
import time
from datetime import date, datetime

import pytest

from trading_data_pipeline_spark.meta import (
    META_SCHEMA,
    return_date_list,
    update_meta_file,
)
from trading_data_pipeline_spark.sources.connector import FileSystemConnector

BUCKET = "test-bucket"


def _s3a_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def moto_endpoint():
    moto = pytest.importorskip("moto", reason="moto not installed")  # noqa: F841
    import boto3

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "moto.server", "-p", str(port)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    endpoint = f"http://127.0.0.1:{port}"
    try:
        for _ in range(50):
            try:
                boto3.client(
                    "s3",
                    endpoint_url=endpoint,
                    aws_access_key_id="testing",
                    aws_secret_access_key="testing",
                    region_name="us-east-1",
                ).list_buckets()
                break
            except Exception:
                time.sleep(0.2)
        else:
            pytest.skip("moto server did not come up")
        boto3.client(
            "s3",
            endpoint_url=endpoint,
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1",
        ).create_bucket(Bucket=BUCKET)
        yield endpoint
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.fixture(scope="module")
def s3a_conn(spark, moto_endpoint):
    if not _s3a_available(spark):
        pytest.skip(
            "hadoop-aws (S3AFileSystem) not on the Spark classpath — stock "
            "pyspark wheel; run with --packages org.apache.hadoop:hadoop-aws"
        )
    hconf = spark._jsc.hadoopConfiguration()
    for k, v in {
        "fs.s3a.endpoint": moto_endpoint,
        "fs.s3a.access.key": "testing",
        "fs.s3a.secret.key": "testing",
        "fs.s3a.path.style.access": "true",
        "fs.s3a.connection.ssl.enabled": "false",
        "fs.s3a.change.detection.mode": "none",
        "fs.s3a.committer.magic.enabled": "false",
    }.items():
        hconf.set(k, v)
    return FileSystemConnector(spark, f"s3a://{BUCKET}")


def test_s3a_csv_round_trip_and_listing(s3a_conn, spark):
    df = spark.createDataFrame([("A", "B"), ("C", "D")], "col1 string, col2 string")
    assert s3a_conn.write(df, "2021-04-16/part", "csv") is True
    files = s3a_conn.list_files_in_prefix("2021-04-16")
    assert files and all(f.startswith("s3a://") for f in files)
    back = s3a_conn.read_csv("2021-04-16/part", schema="col1 string, col2 string")
    assert sorted(map(tuple, back.collect())) == [("A", "B"), ("C", "D")]
    assert s3a_conn.list_files_in_prefix("2021-04-99") == []


def test_s3a_parquet_round_trip(s3a_conn, spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    assert s3a_conn.write(df, "pq/out", "parquet") is True
    assert sorted(map(tuple, s3a_conn.read_parquet("pq/out").collect())) == [
        (1, "x"),
        (2, "y"),
    ]


def test_s3a_meta_protocol_round_trip(s3a_conn):
    """The incremental meta protocol (single-object csv key, read-modify-
    write append, date-list derivation) over the object store — the part
    of the reference's integration test that exercises live S3 state."""
    meta_key = "meta/meta_file.csv"
    now = datetime(2021, 4, 20, 12, 0, 0)
    assert update_meta_file(s3a_conn, meta_key, ["2021-04-16", "2021-04-17"], now)
    meta = s3a_conn.read_csv(meta_key, schema=META_SCHEMA)
    assert meta.count() == 2
    start, dates = return_date_list(
        s3a_conn, "2021-04-16", meta_key, today=date(2021, 4, 20)
    )
    assert start == "2021-04-18"
    assert dates[0] == "2021-04-17"

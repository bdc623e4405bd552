"""SCD2 history merge and inverted-index construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.scale_ops import scd2_apply
from trading_data_pipeline_spark.registry import load

SF_DIR = "/root/testdata/sf0.001"


def _history(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, attr string, valid_from date, valid_to date, is_current boolean",
    )


def test_scd2_semantics_hand_built(spark):
    import datetime as dt

    d = dt.date
    hist = _history(
        spark,
        [
            # id 1: closed old version + open current
            (1, "a1", d(2023, 1, 1), d(2024, 1, 1), False),
            (1, "a2", d(2024, 1, 1), None, True),
            # id 2: open, will NOT be updated
            (2, "b1", d(2024, 1, 1), None, True),
            # id 3: open, no-op update (same attr)
            (3, "c1", d(2024, 1, 1), None, True),
        ],
    )
    updates = spark.createDataFrame(
        [(1, "a3"), (3, "c1"), (9, "new")], "id long, attr string"
    )
    out = scd2_apply(hist, updates, "id", "2024-06-01", tracked=["attr"])
    rows = {(r["id"], r["attr"]): r for r in out.collect()}
    assert len(rows) == 6
    # id 1: old closed row untouched; current closed at T2; new version open
    assert rows[(1, "a1")]["is_current"] is False
    closed = rows[(1, "a2")]
    assert closed["is_current"] is False and str(closed["valid_to"]) == "2024-06-01"
    opened = rows[(1, "a3")]
    assert opened["is_current"] is True and opened["valid_to"] is None
    assert str(opened["valid_from"]) == "2024-06-01"
    # id 2 (no update) and id 3 (no-op update): untouched, no churn
    assert rows[(2, "b1")]["is_current"] is True and rows[(2, "b1")]["valid_to"] is None
    assert rows[(3, "c1")]["is_current"] is True
    assert str(rows[(3, "c1")]["valid_from"]) == "2024-01-01"
    # id 9: brand-new key opens at T2
    assert rows[(9, "new")]["is_current"] is True
    assert str(rows[(9, "new")]["valid_from"]) == "2024-06-01"


def test_scd2_exactly_one_current_version_per_key(spark):
    from trading_data_pipeline_spark.operators.scale_ops import q_scd2_merge

    res = q_scd2_merge(spark, SF_DIR)
    per_key = res.filter(F.col("is_current")).groupBy("doc_id").count()
    assert per_key.filter(F.col("count") != 1).count() == 0
    # every closed row's interval is well-formed
    bad = res.filter(
        (~F.col("is_current")) & (F.col("valid_to") == "open")
    ).count()
    assert bad == 0


def test_inverted_index_cap_and_df(spark):
    from trading_data_pipeline_spark.operators.corpus_queries import (
        POSTINGS_CAP,
        q_inverted_index,
    )

    out = {r["token"]: r for r in q_inverted_index(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents")
    # cross-check one token's df and postings against a direct computation
    token, row = max(out.items(), key=lambda kv: kv[1]["df"])
    direct = (
        docs.filter(F.array_contains(F.split("text", " "), token))
        .select("doc_id")
        .distinct()
    )
    ids = sorted(r["doc_id"] for r in direct.collect())
    assert row["df"] == len(ids)
    assert row["postings"] == ",".join(str(i) for i in ids[:POSTINGS_CAP])
    # postings never exceed the cap even for corpus-wide tokens
    assert all(len(r["postings"].split(",")) <= POSTINGS_CAP for r in out.values())


def test_inverted_index_single_exchange(spark):
    from trading_data_pipeline_spark.operators.corpus_queries import q_inverted_index

    plan = (
        q_inverted_index(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rank window and groupBy share the token key
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_rebalance_sample_rate_and_determinism(spark):
    from trading_data_pipeline_spark.operators.corpus_queries import (
        REBAL_TARGET_PCT,
        q_rebalance_sample,
    )

    out = q_rebalance_sample(spark, SF_DIR)
    per_source = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    totals = {
        r["source"]: r["n"]
        for r in load(spark, SF_DIR, "documents")
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, n_total in totals.items():
        kept = per_source.get(src, 0)
        # LCG buckets approximate the target rate; each source is small
        # (~25 docs at sf0.001) so allow generous binomial slack
        assert 0.3 * n_total <= kept <= 0.9 * n_total, (src, kept, n_total)
    want = REBAL_TARGET_PCT / 100 * sum(totals.values())
    assert abs(out.count() - want) <= 0.15 * sum(totals.values())
    # deterministic: a second evaluation returns the identical id set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in q_rebalance_sample(spark, SF_DIR).collect()}
    assert a == b


def test_scd2_carries_untracked_attributes(spark):
    """History may carry attribute columns outside the change-detection
    set; new versions take them from the update batch."""
    import datetime as dt

    d = dt.date
    hist = spark.createDataFrame(
        [(1, "a1", "en", d(2024, 1, 1), None, True)],
        "id long, attr string, lang string, valid_from date, valid_to date, "
        "is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "a2", "de")], "id long, attr string, lang string"
    )
    out = {
        (r["id"], r["attr"]): r
        for r in scd2_apply(hist, updates, "id", "2024-06-01", tracked=["attr"]).collect()
    }
    assert len(out) == 2
    assert out[(1, "a1")]["lang"] == "en" and out[(1, "a1")]["is_current"] is False
    assert out[(1, "a2")]["lang"] == "de" and out[(1, "a2")]["is_current"] is True


def test_compaction_collapses_files_and_conserves_rows(spark, sf_dir, tmp_path):
    import glob

    from trading_data_pipeline_spark.operators.lake_queries import compact_table

    ev = load(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    ev.repartition(16).write.partitionBy("date").parquet(frag)
    n_frag = len(glob.glob(f"{frag}/date=*/*.parquet"))
    out = compact_table(spark, frag, dst, "date", target_bytes=1 << 30,
                        salt_key="event_id")
    n_compact = len(glob.glob(f"{dst}/date=*/*.parquet"))
    n_dates = ev.select("date").distinct().count()
    # far above target size -> exactly one file per date partition
    assert n_compact == n_dates < n_frag, (n_compact, n_dates, n_frag)
    assert out.count() == ev.count()
    # value-level conservation, not just cardinality
    a = sorted(r["event_id"] for r in out.select("event_id").collect())
    b = sorted(r["event_id"] for r in ev.select("event_id").collect())
    assert a == b


def test_compaction_splits_oversized_partitions(spark, sf_dir, tmp_path):
    import glob

    from trading_data_pipeline_spark.operators.lake_queries import compact_table

    ev = load(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    ev.repartition(16).write.partitionBy("date").parquet(frag)
    # tiny target -> dates must split into multiple files (ceil(bytes/target))
    out = compact_table(spark, frag, dst, "date", target_bytes=4 * 1024,
                        salt_key="event_id")
    per_date = {}
    for f in glob.glob(f"{dst}/date=*/*.parquet"):
        per_date.setdefault(f.split("date=")[1].split("/")[0], 0)
        per_date[f.split("date=")[1].split("/")[0]] += 1
    assert out.count() == ev.count()
    # salt groups of one date can collide into the same task (which then
    # writes one file), so assert the split happened overall, not per-date
    assert sum(per_date.values()) > len(per_date), per_date


def test_cdc_apply_semantics_hand_built(spark):
    from trading_data_pipeline_spark.operators.lake_queries import apply_changelog

    rows = [
        # key 1: upsert then delete -> absent
        (1, "U", 10.0, 1, 1),
        (1, "D", 0.0, 2, 2),
        # key 2: delete then later upsert -> present with latest value
        (2, "D", 0.0, 1, 3),
        (2, "U", 7.0, 5, 4),
        # key 3: two upserts same ts -> higher event_id wins
        (3, "U", 1.0, 9, 5),
        (3, "U", 2.0, 9, 6),
    ]
    log = spark.createDataFrame(
        rows, "user_id int, op string, value double, ts int, event_id int"
    )
    snap = {
        r["user_id"]: r["value"]
        for r in apply_changelog(log, "user_id", ["ts", "event_id"]).collect()
    }
    assert snap == {2: 7.0, 3: 2.0}


def test_binary_scan_round_trips_content(spark, sf_dir, tmp_path):
    from trading_data_pipeline_spark.operators.lake_queries import (
        export_binary_payloads,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    out = str(tmp_path / "bin")
    n = export_binary_payloads(docs.select("doc_id", "text"), out)
    assert n == 5
    back = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(out)
        .select(
            F.regexp_extract("path", r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
            F.col("content").cast("string").alias("text"),
        )
    )
    want = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == want


def test_wap_rejected_audit_publishes_nothing(spark, sf_dir, tmp_path):
    import os

    import pytest as _pytest

    from trading_data_pipeline_spark.operators.lake_queries import (
        AuditFailed,
        write_audit_publish,
    )

    ev = load(spark, sf_dir, "events").limit(100)
    final = str(tmp_path / "published")
    with _pytest.raises(AuditFailed):
        write_audit_publish(ev, final, lambda staged: False)
    assert not os.path.exists(final)
    assert not os.path.exists(final + "._staging")  # rolled back

    out = write_audit_publish(ev, final, lambda staged: staged.count() == 100)
    assert out.count() == 100
    assert os.path.exists(final)
    assert not os.path.exists(final + "._staging")


def test_wap_publish_replaces_previous_version(spark, sf_dir, tmp_path):
    from trading_data_pipeline_spark.operators.lake_queries import (
        write_audit_publish,
    )

    ev = load(spark, sf_dir, "events")
    final = str(tmp_path / "published")
    write_audit_publish(ev.limit(10), final, lambda s: True)
    out = write_audit_publish(ev.limit(25), final, lambda s: True)
    assert out.count() == 25
    assert spark.read.parquet(final).count() == 25


def test_file_stats_multi_file_layout(spark, sf_dir, tmp_path):
    """Zone-map stats over a multi-file table: per-file rows sum to the
    table count, the global min/max equal the fold of per-file bounds,
    and every data file gets a stats row."""
    import os

    from trading_data_pipeline_spark.operators.lake_queries import file_stats
    from trading_data_pipeline_spark.registry import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    out = os.path.join(str(tmp_path), "li4")
    li.repartition(4).write.parquet(out)
    stats = file_stats(
        spark.read.parquet(out), ["l_orderkey", "l_extendedprice"]
    ).collect()
    n_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert len(stats) == n_files
    assert sum(r.n_rows for r in stats) == li.count()
    lo = min(r.min_l_orderkey for r in stats)
    hi = max(r.max_l_orderkey for r in stats)
    row = li.selectExpr("min(l_orderkey) lo", "max(l_orderkey) hi").collect()[0]
    assert (lo, hi) == (row.lo, row.hi)


def test_pruned_scan_actually_skips_files(spark, sf_dir, tmp_path):
    """Zone-map pruning must read a strict subset of the data files while
    returning exactly the rows a full scan + filter returns."""
    import os

    from trading_data_pipeline_spark.operators.lake_queries import (
        file_stats,
        prune_files_by_stats,
    )
    from trading_data_pipeline_spark.registry import load

    out = os.path.join(str(tmp_path), "li_range")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    li.repartitionByRange(8, "l_orderkey").write.parquet(out)
    stats = file_stats(spark.read.parquet(out), ["l_orderkey"]).collect()
    pruned = prune_files_by_stats(spark, out, stats, "l_orderkey", 100, 900)
    n_all = len(spark.read.parquet(out).inputFiles())
    assert len(pruned.inputFiles()) < n_all
    got = pruned.filter("l_orderkey BETWEEN 100 AND 900")
    want = spark.read.parquet(out).filter("l_orderkey BETWEEN 100 AND 900")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_prune_everything_returns_empty_with_schema(spark, sf_dir, tmp_path):
    import os

    from trading_data_pipeline_spark.operators.lake_queries import (
        file_stats,
        prune_files_by_stats,
    )
    from trading_data_pipeline_spark.registry import load

    out = os.path.join(str(tmp_path), "li_none")
    load(spark, sf_dir, "lineitem").select("l_orderkey").repartitionByRange(
        2, "l_orderkey"
    ).write.parquet(out)
    stats = file_stats(spark.read.parquet(out), ["l_orderkey"]).collect()
    pruned = prune_files_by_stats(spark, out, stats, "l_orderkey", -10, -5)
    assert pruned.count() == 0
    assert pruned.columns == ["l_orderkey"]


def test_snapshot_diff_semantics(spark):
    """added/removed/changed classification incl. the all-NULL-payload
    edge (presence must come from join-side markers, not data columns)
    and null-safe changed detection (NULL -> value is a change)."""
    from trading_data_pipeline_spark.operators.lake_queries import (
        snapshot_diff,
    )

    schema = "k long, a string, b double"
    old = spark.createDataFrame(
        [
            (1, "x", 1.0),     # unchanged
            (2, "y", 2.0),     # changed (b)
            (3, None, None),   # all-NULL payload, present in both, unchanged
            (4, "z", 4.0),     # removed
            (6, None, 6.0),    # NULL -> value = changed
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "x", 1.0),
            (2, "y", 2.5),
            (3, None, None),
            (5, "w", 5.0),     # added
            (6, "q", 6.0),
        ],
        schema,
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    assert out == {2: "changed", 4: "removed", 5: "added", 6: "changed"}


def test_snapshot_diff_identity_and_symmetry(spark, sf_dir):
    """diff(x, x) is empty, and swapping the sides swaps added<->removed
    while 'changed' keys are identical — the algebra a reconciliation
    report must satisfy."""
    from collections import Counter

    from trading_data_pipeline_spark.operators.lake_queries import (
        snapshot_diff,
    )
    from trading_data_pipeline_spark.registry import load

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    assert snapshot_diff(orders, orders, "o_orderkey").count() == 0

    from pyspark.sql import functions as F

    old = orders.filter(F.col("o_orderkey") % 3 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    fwd = Counter(
        r.change_type for r in snapshot_diff(old, new, "o_orderkey").collect()
    )
    rev = Counter(
        r.change_type for r in snapshot_diff(new, old, "o_orderkey").collect()
    )
    assert fwd["added"] == rev["removed"]
    assert fwd["removed"] == rev["added"]
    assert fwd["changed"] == rev["changed"] > 0

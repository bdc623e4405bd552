"""Global physical-plan invariants over the committed PLANAUDIT.json.

`tools/plan_audit.py` sweeps every registered query's physical plan and
records the scale-relevant counters. These tests make the artifact part of
the contract:

- the registry and the artifact may not drift (a query added without
  re-running the audit fails here — run `python tools/plan_audit.py`),
- zero row-at-a-time Python UDFs anywhere in the engine,
- every cartesian / broadcast-nested-loop join appears in the audited
  allowlist with a bounded-side justification,
- a sample of size-independent plans re-derived live must match the
  recorded shuffle budgets (a rewrite that silently adds an exchange to a
  flagship query fails here before it ships).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from plan_audit import PRODUCT_JOIN_ALLOWLIST, audit_plan  # noqa: E402

from trading_data_pipeline_spark.registry import all_queries  # noqa: E402


@pytest.fixture(scope="module")
def audit() -> dict:
    path = os.path.join(REPO, "PLANAUDIT.json")
    with open(path) as f:
        return json.load(f)


def test_artifact_covers_registry(audit):
    registered = set(all_queries())
    audited = set(audit["queries"])
    missing = registered - audited
    stale = audited - registered
    assert not missing, (
        f"queries missing from PLANAUDIT.json (run tools/plan_audit.py): {sorted(missing)}"
    )
    assert not stale, f"stale audit entries for removed queries: {sorted(stale)}"


def test_no_audit_errors(audit):
    errs = {k: v["err"] for k, v in audit["queries"].items() if v.get("err")}
    assert not errs, errs


def test_no_row_python_udfs_anywhere(audit):
    offenders = {
        k: v["row_python_udf"]
        for k, v in audit["queries"].items()
        if v.get("err") is None and v["row_python_udf"]
    }
    assert not offenders, (
        f"row-at-a-time Python UDFs found (use Arrow pandas UDFs): {offenders}"
    )


def test_product_joins_are_allowlisted(audit):
    offenders = sorted(
        k
        for k, v in audit["queries"].items()
        if v.get("err") is None
        and (v["cartesian"] or v["bnlj"])
        and k not in PRODUCT_JOIN_ALLOWLIST
    )
    assert not offenders, (
        "unapproved CartesianProduct/BroadcastNestedLoopJoin (add to "
        f"PRODUCT_JOIN_ALLOWLIST with a bounded-side justification): {offenders}"
    )


def test_allowlist_has_no_dead_entries(audit):
    """Every allowlisted name still exists and still has a product join —
    keeps the allowlist honest as queries get rewritten."""
    qs = audit["queries"]
    dead = sorted(
        name
        for name in PRODUCT_JOIN_ALLOWLIST
        if name not in qs
        or (qs[name].get("err") is None and not (qs[name]["cartesian"] or qs[name]["bnlj"]))
    )
    assert not dead, f"allowlist entries with no product join in the plan: {dead}"


# Size-independent plans: no join whose strategy could flip between the
# audit's sf0.01 and the test fixture's sf0.001 (single-table pipelines or
# hinted-broadcast joins only).
_SAMPLE = ("q_report1", "q_dedup_exact", "q_groupby_agg", "q_topn", "q_text_stats")


def test_sample_shuffle_budgets_match_live(audit, spark, sf_dir):
    specs = all_queries()
    for name in _SAMPLE:
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        live = audit_plan(plan, "")["shuffles"]
        recorded = audit["queries"][name]["shuffles"]
        assert live == recorded, (
            f"{name}: live plan has {live} shuffle exchanges, PLANAUDIT.json "
            f"records {recorded} — re-run tools/plan_audit.py if the change "
            "is intentional"
        )

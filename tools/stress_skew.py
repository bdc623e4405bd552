"""Skew stress for the salted-join path: a synthetic fact table where ONE
key owns `hot_frac` of all rows, joined to a keyed dimension — the case
where an unsalted hash join pins the hot key's entire row set on a single
reducer.

Three measured variants over identical data:
  plain        — unsalted join, AQE skew-join handling DISABLED (the naive
                 single-hot-reducer plan a 1000-executor cluster would
                 stall on);
  aqe          — unsalted join with AQE skew splitting enabled (Spark's
                 built-in runtime answer);
  salted       — plans/skew.salted_join (the explicit fallback for plans
                 AQE can't split).

All three must agree on the aggregate result (asserted); the interesting
output is the wall-clock + the max-task input skew. On local[32] the
absolute times are small — the signal is the RATIO between plain and the
mitigated variants, which widens with cluster size.

Usage: python tools/stress_skew.py [n_fact] [n_keys] [hot_frac]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.plans.skew import salted_join  # noqa: E402
from trading_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3

    spark = build_session("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")

    # fact: first hot_frac of rows all carry key 0; the rest spread evenly
    fact = (
        spark.range(n_fact)
        .select(
            F.when(F.col("id") < int(n_fact * hot_frac), F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .persist()
    )
    dim = (
        spark.range(n_keys)
        .select(F.col("id").alias("k"), (F.col("id") % 13).alias("grp"))
        .persist()
    )
    fact.count(), dim.count()  # materialize inputs outside the timings

    def agg(joined):
        return (
            joined.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("s"))
            .orderBy("grp")
        )

    def run(tag: str, df, skew_join: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        # defeat broadcast so the exchange actually happens on the join key
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        t0 = time.monotonic()
        rows = agg(df).collect()
        return time.monotonic() - t0, [tuple(r) for r in rows]

    t_plain, r_plain = run("plain", fact.join(dim, "k"), skew_join=False)
    t_aqe, r_aqe = run("aqe", fact.join(dim, "k"), skew_join=True)
    t_salt, r_salt = run(
        "salted", salted_join(fact, dim, ["k"], salt=32), skew_join=False
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert r_plain == r_aqe == r_salt, "skew mitigation changed the result"

    print(
        json.dumps(
            {
                "n_fact": n_fact,
                "n_keys": n_keys,
                "hot_frac": hot_frac,
                "plain_sec": round(t_plain, 3),
                "aqe_skewjoin_sec": round(t_aqe, 3),
                "salted_sec": round(t_salt, 3),
                "plain_over_salted": round(t_plain / t_salt, 2),
                "groups": len(r_plain),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Stress the market-basket pair generator's degenerate-basket cap
(operators/bi_queries.basket_pairs).

Builds a synthetic order book of NORMAL baskets (~6 items) plus a few
WHOLESALE monsters (thousands of items each). Without the cap, one
monster basket expands to |basket|²/2 pairs inside a single task
(5k items → 12.5M structs) and its row dominates the stage; with the
cap the monsters are dropped whole before any pair math, so runtime
tracks the normal-basket volume only. The run times both settings and
prints the pair counts so the cap's effect is visible, not asserted
from theory.

Usage: python tools/stress_basket.py [n_orders] [monster_items]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.operators.bi_queries import (  # noqa: E402
    basket_pairs,
)
from trading_data_pipeline_spark.session import build_session  # noqa: E402

N_MONSTERS = 4


def main() -> None:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    monster_items = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    spark = build_session("stress-basket")
    # normal: 6 lines per order, drawn from 1000 basket templates so
    # pairs genuinely co-occur (each template repeats n_orders/1000 times)
    normal = spark.range(n_orders * 6).select(
        (F.col("id") % n_orders).alias("l_orderkey"),
        ((F.col("id") % n_orders % 1000) * 6 + (F.col("id") / n_orders).cast("long")).alias(
            "l_partkey"
        ),
    )
    monsters = spark.range(N_MONSTERS * monster_items).select(
        (F.lit(n_orders) + F.col("id") % N_MONSTERS).alias("l_orderkey"),
        (F.col("id") / N_MONSTERS).cast("long").alias("l_partkey"),
    )
    li = normal.unionByName(monsters).localCheckpoint(eager=True)

    def run(max_basket: int, label: str) -> None:
        t0 = time.time()
        n_pairs = basket_pairs(li, min_count=2, max_basket=max_basket).count()
        print(
            f"{label:>9}: {time.time() - t0:6.2f}s, {n_pairs} surviving pairs",
            flush=True,
        )

    run(200, "capped")  # monsters dropped whole
    run(2 * monster_items, "uncapped")  # monsters expand to |b|^2/2 pairs


if __name__ == "__main__":
    main()

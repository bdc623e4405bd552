"""Risk measures + event study over daily P&L (round-6 batch 4).

The consumers of the reference's OHLC report (xetra_transformer.py:
126-208) feed it into risk: these are the standard tail/ratio measures,
each exact until one final IEEE step:

- **q_var_es**: historical 95% Value-at-Risk and Expected Shortfall per
  type over daily close moves (cents). VaR is the EXACT k-th smallest
  move with k = ⌈0.05·n⌉ — an order statistic via row_number, no
  interpolation ambiguity; ES is the integer mean of the k tail moves.
- **q_sharpe**: daily Sharpe ratio per type — mean/sd of daily cent
  moves with the sample (n−1) variance, every sum a BIGINT, the final
  ratio one deterministic float chain (identical formula both engines).
- **q_event_study**: average forward price move 1, 2, 3 events after a
  LARGE trade (props.$.k ≥ threshold) vs the unconditional baseline —
  does size move the price. Forward moves are integer cent leads;
  conditional and baseline means are integer sums divided once.

Scale: VaR/Sharpe run on the (type, day) bar table (one exchange, the
report1 shape). The event study's leads run per-type ordered windows on
raw events — the same shape as q_window_lag; horizons are a 3-element
stack over one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..registry import load, register
from .microstructure_queries import _BARS_SQL, daily_bars

VAR_PCT = 5  # tail percent — integer so k = ceil(pct·n/100) stays exact
SHARPE_SCALE = 10**8
HORIZONS = (1, 2, 3)
BIG_TRADE_K = 90

_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def var_es(events: DataFrame, pct: int = VAR_PCT) -> DataFrame:
    """Historical VaR/ES per type: k-th smallest daily move (k=⌈pct·n/100⌉)
    and the exact integer mean of the k-move tail."""
    moves = daily_bars(events).filter(F.col("dc").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("dc", "day")
    wn = Window.partitionBy("event_type")
    ranked = moves.select(
        "event_type",
        "dc",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = F.floor((F.lit(pct) * F.col("n") + 99) / F.lit(100.0)).cast("long")
    tail = ranked.filter(F.col("r") <= k)
    return tail.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.count(F.lit(1)).alias("k_tail"),
        (F.max("dc") / 100.0).alias("var_95"),
        (F.sum("dc") / (F.count(F.lit(1)) * F.lit(100.0))).alias("es_95"),
    )


@register(
    "q_var_es",
    f"""
    WITH {_BARS_SQL}, ranked AS (
      SELECT event_type, dc,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY dc, day) AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM moves WHERE dc IS NOT NULL
    ), tail AS (
      SELECT * FROM ranked
      WHERE r <= CAST(floor(({VAR_PCT} * n + 99) / 100.0) AS BIGINT)
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS k_tail,
           max(dc) / 100.0 AS var_95,
           CAST(sum(dc) AS BIGINT) / (count(*) * 100.0) AS es_95
    FROM tail GROUP BY event_type
    """,
    doc="Historical 95% VaR (exact ⌈0.05·n⌉-th order statistic of daily "
    "close moves — no interpolation) and Expected Shortfall (integer "
    "tail mean) per type. One bar exchange + one per-type window",
)
def q_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    return var_es(load(spark, sf_dir, "events"))


def sharpe(events: DataFrame) -> DataFrame:
    """Daily Sharpe per type: mean/sd of daily cent moves (sample
    variance). Integer sums; the ratio is one fixed float chain."""
    moves = daily_bars(events).filter(F.col("dc").isNotNull())
    agg = moves.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dc").alias("sx"),
        F.sum(F.col("dc") * F.col("dc")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var_num = (n * sxx - sx * sx).cast("double")
    sd = F.sqrt(var_num / (n * (n - 1)).cast("double"))
    ratio = F.when(
        (n > 1) & (var_num > 0), (sx / n.cast("double")) / sd
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        _q(ratio, SHARPE_SCALE).alias("sharpe"),
    )


@register(
    "q_sharpe",
    f"""
    WITH {_BARS_SQL}, agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dc) AS BIGINT) AS sx,
             CAST(sum(dc * dc) AS BIGINT) AS sxx
      FROM moves WHERE dc IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           floor(CASE WHEN n > 1 AND n * sxx - sx * sx > 0
                 THEN (sx / CAST(n AS DOUBLE))
                      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             / CAST(n * (n - 1) AS DOUBLE))
                 END * {SHARPE_SCALE} + 0.5) / {SHARPE_SCALE} AS sharpe
    FROM agg
    """,
    doc="Daily Sharpe ratio per type (mean/sample-sd of daily close "
    "moves) — BIGINT power sums, one deterministic float chain, "
    "quantized 1e-8",
)
def q_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sharpe(load(spark, sf_dir, "events"))


def event_study(
    events: DataFrame,
    horizons: tuple[int, ...] = HORIZONS,
    big_k: int = BIG_TRADE_K,
) -> DataFrame:
    """Mean forward cent move h events after a big trade vs the
    unconditional baseline, per (type, horizon). All means are
    integer-sum / single-division; the horizon stack shares ONE
    per-type ordered exchange."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    qty = F.coalesce(
        F.get_json_object("props", "$.k").cast("long"), F.lit(0)
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    base = events.select(
        "event_type",
        "ts",
        "event_id",
        cents.alias("c"),
        (qty >= big_k).cast("int").alias("big"),
    )
    cols = [
        (F.lead("c", h).over(w) - F.col("c")).alias(f"m{h}")
        for h in horizons
    ]
    m = base.select("event_type", "big", *cols)
    # melt the horizon columns with stack(): ONE window pass + ONE
    # aggregation exchange (a union of per-horizon aggs would re-run
    # the lead window once per branch)
    stack_args = ", ".join(f"{h}, m{h}" for h in horizons)
    melted = m.select(
        "event_type",
        "big",
        F.expr(
            f"stack({len(horizons)}, {stack_args}) AS (horizon, mv)"
        ),
    ).filter(F.col("mv").isNotNull())
    return (
        melted.groupBy("event_type", "horizon")
        .agg(
            F.sum("big").alias("n_big"),
            F.sum(F.when(F.col("big") == 1, F.col("mv"))).alias("s_big"),
            F.count(F.lit(1)).alias("n_all"),
            F.sum("mv").alias("s_all"),
        )
        .select(
            "event_type",
            F.col("horizon").cast("int").alias("horizon"),
            "n_big",
            (F.col("s_big") / (F.col("n_big") * 100.0)).alias(
                "mean_move_big"
            ),
            (F.col("s_all") / (F.col("n_all") * 100.0)).alias(
                "mean_move_all"
            ),
        )
    )


@register(
    "q_event_study",
    f"""
    WITH base AS (
      SELECT event_type, ts, event_id, {_CENTS} AS c,
             CASE WHEN coalesce(
                    json_extract_string(props, '$.k')::BIGINT, 0)
                  >= {BIG_TRADE_K} THEN 1 ELSE 0 END AS big
      FROM events
    ), m AS (
      SELECT event_type, big,
             lead(c, 1) OVER pw - c AS m1,
             lead(c, 2) OVER pw - c AS m2,
             lead(c, 3) OVER pw - c AS m3
      FROM base
      WINDOW pw AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), stacked AS (
      SELECT event_type, 1 AS horizon, big, m1 AS mv FROM m
      UNION ALL
      SELECT event_type, 2, big, m2 FROM m
      UNION ALL
      SELECT event_type, 3, big, m3 FROM m
    )
    SELECT event_type, CAST(horizon AS INT) AS horizon,
           CAST(sum(big) AS BIGINT) AS n_big,
           CAST(sum(CASE WHEN big = 1 THEN mv END) AS BIGINT)
             / (sum(big) * 100.0) AS mean_move_big,
           CAST(sum(mv) AS BIGINT) / (count(*) * 100.0) AS mean_move_all
    FROM stacked WHERE mv IS NOT NULL
    GROUP BY event_type, horizon
    """,
    doc="Event study: mean forward move 1/2/3 events after a large "
    "trade (props.$.k ≥ 90) vs the unconditional baseline, per type — "
    "integer lead diffs, integer-sum means, horizons stacked over ONE "
    "per-type ordered exchange",
)
def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_study(load(spark, sf_dir, "events"))


# ------------------------------------------------------------- sortino

def sortino(events: DataFrame) -> DataFrame:
    """Sortino ratio per type: mean daily cent move over DOWNSIDE
    deviation sqrt(Σ min(dc,0)² / n) — the Sharpe variant that only
    penalizes losses, so an asymmetric (up-skewed) book isn't punished
    for its upside. BIGINT power sums over the bar table; undefined when
    no losing day exists (NULL, never an ANSI 0-division)."""
    moves = daily_bars(events).filter(F.col("dc").isNotNull())
    dn = F.when(F.col("dc") < 0, F.col("dc")).otherwise(F.lit(0))
    agg = moves.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dc").alias("sx"),
        F.sum(dn * dn).alias("sdd"),
        F.sum((F.col("dc") < 0).cast("long")).alias("n_down"),
    )
    n, sx, sdd = F.col("n"), F.col("sx"), F.col("sdd")
    dd = F.sqrt(sdd.cast("double") / n.cast("double"))
    ratio = F.when(sdd > 0, (sx / n.cast("double")) / dd)
    return agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("n_down").alias("n_down_days"),
        _q(ratio, SHARPE_SCALE).alias("sortino"),
    )


@register(
    "q_sortino",
    f"""
    WITH {{bars}}, agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dc) AS BIGINT) AS sx,
             CAST(sum(CASE WHEN dc < 0 THEN dc * dc ELSE 0 END)
                  AS BIGINT) AS sdd,
             CAST(sum(CASE WHEN dc < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down
      FROM moves WHERE dc IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_days, n_down AS n_down_days,
           floor(CASE WHEN sdd > 0
                 THEN (sx / CAST(n AS DOUBLE))
                      / sqrt(CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE))
                 END * {{scale}} + 0.5) / {{scale}} AS sortino
    FROM agg
    """.format(bars=_BARS_SQL, scale=SHARPE_SCALE),
    doc="Sortino ratio per type: mean daily move over downside "
    "deviation (losses only) — BIGINT power sums of clipped moves, one "
    "deterministic float chain, NULL when no losing day. Same bar "
    "exchange as q_sharpe",
)
def q_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sortino(load(spark, sf_dir, "events"))

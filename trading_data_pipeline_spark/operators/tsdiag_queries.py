"""Time-series diagnostics, round-8 batch 12: long-memory, causality,
and distribution shape.

- **q_hurst**: Hurst exponent via rescaled-range (R/S) analysis on
  daily close moves per type. For block sizes b ∈ {8, 16} the
  rescaled range is computed EXACTLY: the cumulative-deviation
  numerator b·cumsum(x)_j − j·S is an integer (the n-scaled-deviation
  trick), so R/S = (max − min of that) / √(b·Σx² − S²) — integers
  under the square root, one double chain per block. H is the
  two-point log-log slope between the block sizes (Mandelbrot–Wallis
  R/S in its minimal exact form).
- **q_granger**: bivariate lag-1 Granger causality F-test — does the
  'view' move help predict the 'purchase' move beyond its own lag?
  Both OLS fits are closed forms of centered cross-moment sums
  (2-regressor normal equations by determinant), computed once per
  output row from exact integer day-aligned moves.
- **q_quantile_binning**: equal-frequency B-bin discretization of the
  raw value column — the feature-binning pass a training pipeline
  runs before count/target encoding. Bin edges are exact order
  statistics: the value grid's global cumulative (via
  plans/global_rank.global_cumsum — quantile-bucketed two-pass, NO
  SinglePartition window) assigns each distinct value the bin of its
  first rank, ties stay together, and the output is per-bin count +
  lo/hi edges. Runs on the raw stream with token-free integer-cent
  keys.

Scale notes: hurst/granger run on the daily-bar table (one
(event_type, day) exchange, then calendar-bounded rows); binning's
only fact-sized operations are the grid groupBy and the broadcast
bin-edge join-back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..plans.global_rank import global_cumsum
from ..registry import load, register
from .microstructure_queries import _BARS_SQL, daily_bars

HURST_B1, HURST_B2 = 8, 16
GR_Y, GR_X = "purchase", "view"
BIN_B = 10
TS_SCALE = 10**4

_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

_MOVES_SQL = f"""{_BARS_SQL}, mv AS (
      SELECT event_type, day, dc AS x FROM moves WHERE dc IS NOT NULL
    )"""


def _moves(events: DataFrame) -> DataFrame:
    return (
        daily_bars(events)
        .filter(F.col("dc").isNotNull())
        .select("event_type", "day", F.col("dc").alias("x"))
    )


# ------------------------------------------------------------------ Hurst


def _rs_mean(moves: DataFrame, b: int) -> DataFrame:
    """Mean R/S over full b-sized blocks per type: exact integer
    numerators, one sqrt per block."""
    w = Window.partitionBy("event_type").orderBy("day")
    d = moves.withColumn("rn", F.row_number().over(w)).withColumn(
        "blk", F.expr(f"(rn - 1) div {b}")
    )
    wb = Window.partitionBy("event_type", "blk").orderBy("day")
    wbf = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d = (
        d.withColumn("j", F.row_number().over(wb))
        .withColumn("cumx", F.sum("x").over(wb.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("s", F.sum("x").over(wbf))
        .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(wbf))
        .withColumn("cnt", F.count(F.lit(1)).over(wbf))
        .filter(F.col("cnt") == b)
    )
    num = b * F.col("cumx") - F.col("j") * F.col("s")
    blocks = d.groupBy("event_type", "blk").agg(
        F.max(num).alias("mx"),
        F.min(num).alias("mn"),
        F.first(
            (b * F.col("sxx") - F.col("s") * F.col("s")).cast("double")
        ).alias("den2"),
    )
    rs = (F.col("mx") - F.col("mn")) / F.sqrt(
        F.nullif(F.col("den2"), F.lit(0.0))
    )
    return blocks.groupBy("event_type").agg(
        F.count(F.lit(1)).alias(f"blocks_{b}"),
        F.avg(rs).alias(f"rs_{b}"),
    )


def hurst(events: DataFrame, b1: int = HURST_B1, b2: int = HURST_B2):
    """Two-point R/S Hurst exponent per type."""
    mv = _moves(events)
    a = _rs_mean(mv, b1).join(_rs_mean(mv, b2), "event_type")
    h = (F.log(F.col(f"rs_{b2}")) - F.log(F.col(f"rs_{b1}"))) / F.lit(
        math.log(b2) - math.log(b1)
    )
    return a.select(
        "event_type",
        F.col(f"blocks_{b1}").alias("blocks_small"),
        F.col(f"blocks_{b2}").alias("blocks_large"),
        _q(F.col(f"rs_{b1}"), TS_SCALE).alias("rs_small"),
        _q(F.col(f"rs_{b2}"), TS_SCALE).alias("rs_large"),
        _q(h, TS_SCALE).alias("hurst"),
    ).orderBy("event_type")


def _rs_sql(b: int, alias: str) -> str:
    return f"""
      SELECT event_type, CAST(count(*) AS BIGINT) AS blocks_{alias},
             avg((mx - mn) / sqrt(nullif(den2, 0))) AS rs_{alias}
      FROM (
        SELECT event_type, blk,
               max({b} * cumx - j * s) AS mx,
               min({b} * cumx - j * s) AS mn,
               min(CAST({b} * sxx - s * s AS DOUBLE)) AS den2
        FROM (
          SELECT event_type, blk,
                 row_number() OVER wb AS j,
                 sum(x) OVER (PARTITION BY event_type, blk ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS cumx,
                 sum(x) OVER wf AS s,
                 sum(x * x) OVER wf AS sxx,
                 count(*) OVER wf AS cnt
          FROM (
            SELECT event_type, day, x,
                   (row_number() OVER
                      (PARTITION BY event_type ORDER BY day) - 1)
                     // {b} AS blk
            FROM mv
          )
          WINDOW wb AS (PARTITION BY event_type, blk ORDER BY day),
                 wf AS (PARTITION BY event_type, blk
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)
        ) WHERE cnt = {b}
        GROUP BY event_type, blk
      ) GROUP BY event_type
    """


@register(
    "q_hurst",
    f"""
    WITH {_MOVES_SQL},
    r1 AS ({_rs_sql(HURST_B1, 'small')}),
    r2 AS ({_rs_sql(HURST_B2, 'large')})
    SELECT r1.event_type, blocks_small, blocks_large,
           floor(rs_small * {TS_SCALE} + 0.5) / {TS_SCALE} AS rs_small,
           floor(rs_large * {TS_SCALE} + 0.5) / {TS_SCALE} AS rs_large,
           floor((ln(rs_large) - ln(rs_small))
                 / {math.log(HURST_B2) - math.log(HURST_B1)!r}
                 * {TS_SCALE} + 0.5) / {TS_SCALE} AS hurst
    FROM r1 JOIN r2 ON r1.event_type = r2.event_type
    ORDER BY r1.event_type
    """,
    doc=f"Hurst exponent via two-point R/S ({HURST_B1}/{HURST_B2}-day "
    "blocks) per type: exact integer cumulative-deviation range over "
    "sqrt of integer variance sum, ln only in the final slope",
)
def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hurst(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------- Granger


def granger(events: DataFrame, y: str = GR_Y, x: str = GR_X) -> DataFrame:
    """Lag-1 Granger F: y_t ~ y_{t-1} vs y_t ~ y_{t-1} + x_{t-1},
    closed-form OLS from centered cross-moments."""
    mv = _moves(events)
    ym = mv.filter(F.col("event_type") == y).select(
        "day", F.col("x").alias("yv")
    )
    xm = mv.filter(F.col("event_type") == x).select(
        "day", F.col("x").alias("xv")
    )
    j = ym.join(xm, "day")
    w = Window.orderBy("day")
    # the aligned series is calendar-sized (≤ |days|): a single ordered
    # window over it is bounded, not a fact-stream sort
    d = (
        j.withColumn("y1", F.lag("yv").over(w))
        .withColumn("x1", F.lag("xv").over(w))
        .filter(F.col("y1").isNotNull())
    )
    a = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yv").alias("sy"),
        F.sum("y1").alias("s1"),
        F.sum("x1").alias("s2"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x1")).alias("s22"),
        F.sum(F.col("y1") * F.col("x1")).alias("s12"),
        F.sum(F.col("yv") * F.col("y1")).alias("s1y"),
        F.sum(F.col("yv") * F.col("x1")).alias("s2y"),
    )
    n = F.col("n").cast("double")
    # centered moments
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    rss_r = cyy - c1y * c1y / c11
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    rss_u = cyy - b1 * c1y - b2 * c2y
    fstat = (rss_r - rss_u) * (n - 3.0) / rss_u
    return a.select(
        "n",
        _q(b1, TS_SCALE).alias("beta_own_lag"),
        _q(b2, TS_SCALE).alias("beta_cross_lag"),
        _q(rss_r, TS_SCALE).alias("rss_restricted"),
        _q(rss_u, TS_SCALE).alias("rss_unrestricted"),
        _q(fstat, TS_SCALE).alias("f_stat"),
    )


@register(
    "q_granger",
    f"""
    WITH {_MOVES_SQL}, j AS (
      SELECT a.day, a.x AS yv, b.x AS xv
      FROM (SELECT day, x FROM mv WHERE event_type = '{GR_Y}') a
      JOIN (SELECT day, x FROM mv WHERE event_type = '{GR_X}') b
        ON a.day = b.day
    ), lagged AS (
      SELECT yv, lag(yv) OVER (ORDER BY day) AS y1,
             lag(xv) OVER (ORDER BY day) AS x1
      FROM j
    ), a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yv) AS DOUBLE) AS sy,
             CAST(sum(y1) AS DOUBLE) AS s1,
             CAST(sum(x1) AS DOUBLE) AS s2,
             CAST(sum(yv * yv) AS DOUBLE) AS syy,
             CAST(sum(y1 * y1) AS DOUBLE) AS s11,
             CAST(sum(x1 * x1) AS DOUBLE) AS s22,
             CAST(sum(y1 * x1) AS DOUBLE) AS s12,
             CAST(sum(yv * y1) AS DOUBLE) AS s1y,
             CAST(sum(yv * x1) AS DOUBLE) AS s2y
      FROM lagged WHERE y1 IS NOT NULL
    ), c AS (
      SELECT n,
             syy - sy * sy / n AS cyy, s11 - s1 * s1 / n AS c11,
             s22 - s2 * s2 / n AS c22, s12 - s1 * s2 / n AS c12,
             s1y - s1 * sy / n AS c1y, s2y - s2 * sy / n AS c2y
      FROM a
    ), o AS (
      SELECT n, cyy - c1y * c1y / c11 AS rss_r,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2,
             c1y, c2y, cyy
      FROM c
    )
    SELECT n,
           floor(b1 * {TS_SCALE} + 0.5) / {TS_SCALE} AS beta_own_lag,
           floor(b2 * {TS_SCALE} + 0.5) / {TS_SCALE} AS beta_cross_lag,
           floor(rss_r * {TS_SCALE} + 0.5) / {TS_SCALE} AS rss_restricted,
           floor((cyy - b1 * c1y - b2 * c2y) * {TS_SCALE} + 0.5)
             / {TS_SCALE} AS rss_unrestricted,
           floor((rss_r - (cyy - b1 * c1y - b2 * c2y)) * (n - 3)
                 / (cyy - b1 * c1y - b2 * c2y) * {TS_SCALE} + 0.5)
             / {TS_SCALE} AS f_stat
    FROM o
    """,
    doc=f"Lag-1 Granger causality F ('{GR_X}' moves -> '{GR_Y}' "
    "moves): restricted vs unrestricted OLS as closed forms of "
    "centered cross-moment sums (2-regressor determinant solve); "
    "day-aligned calendar-sized input",
)
def q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    return granger(load(spark, sf_dir, "events"))


# ------------------------------------------------------ quantile binning


def quantile_binning(events: DataFrame, b: int = BIN_B) -> DataFrame:
    """Equal-frequency B-bin discretization of value (integer cents):
    distinct-value grid + exact global cumulative; a value's bin is
    the bin of its first rank (ties stay together)."""
    grid = events.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    ).groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    cum, n = global_cumsum(grid, ["c"], "cnt")
    binned = cum.select(
        "c",
        "cnt",
        F.least(
            F.lit(b - 1),
            F.expr(f"((_gcum - cnt) * {b}) div {n}"),
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("cnt").alias("n"),
            (F.min("c") / 100.0).alias("lo"),
            (F.max("c") / 100.0).alias("hi"),
        )
        .orderBy("bin")
    )


@register(
    "q_quantile_binning",
    f"""
    WITH grid AS (
      SELECT {_CENTS} AS c, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ), cum AS (
      SELECT c, cnt,
             CAST(sum(cnt) OVER (ORDER BY c
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM grid
    )
    SELECT least({BIN_B - 1}, ((gcum - cnt) * {BIN_B}) // n) AS bin,
           CAST(sum(cnt) AS BIGINT) AS n,
           min(c) / 100.0 AS lo, max(c) / 100.0 AS hi
    FROM cum GROUP BY 1 ORDER BY bin
    """,
    doc=f"Equal-frequency {BIN_B}-bin discretization of value: "
    "distinct-cent grid + exact global cumulative (plans/global_rank "
    "two-pass, no SinglePartition window); ties stay in one bin; "
    "per-bin count + lo/hi edges",
)
def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantile_binning(load(spark, sf_dir, "events"))

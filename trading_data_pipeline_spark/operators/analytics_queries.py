"""Event analytics + embedding/corpus maintenance ops (round-5 batch 2).

Five operators a production lake serves daily, each expressed as a pure
DataFrame plan with a DuckDB oracle:

- rolling z-score anomaly detection over the event stream (the distributed
  form of the reference's per-symbol monitoring intent — one window
  exchange on ``user_id``, decimal-exact moments so the oracle matches
  bit-for-bit);
- conversion funnel (signup -> click -> purchase): per-stage first-event
  times derived by co-keyed aggregate->join->aggregate hops, all shuffles
  on ``user_id`` so AQE coalesces them onto one exchange footprint;
- weekly cohort retention: two ``user_id``-keyed aggregates joined on the
  same key, then a tiny (cohort, offset) rollup — the classic retention
  matrix without any cross join over the calendar;
- symmetric int8 embedding quantization (vector-store prep): zero-shuffle
  per-row array arithmetic, 4x storage reduction ahead of ANN indexing;
- chunk-level exact dedup (the paragraph-dedup analogue for the flat
  synthetic corpus): chunking reused from ``corpus_queries``, first-
  occurrence survivorship decided by a window over the 8-byte xxhash64 of
  the chunk — the 100 TB path never shuffles chunk text as a key.

Determinism notes: all moments accumulate in DECIMAL (exact, order-free);
every double expression is written with identical association on both
engines; ratios/z-scores are quantized floor(x*s+0.5)/s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.parallelism import ensure_parallelism
from ..registry import load, register
from .corpus_queries import CHUNK_STRIDE, CHUNK_TOKENS

ZSCORE_LOOKBACK = 20  # trailing events per user feeding the moments
ZSCORE_FLAG = 3.0  # |z| above this is an outlier


from ..functions.quantize import q as _q  # repo-wide quantization convention


def zscore_outliers(events: DataFrame, lookback: int = ZSCORE_LOOKBACK) -> DataFrame:
    """Rolling z-score of ``value`` against the previous ``lookback``
    events of the same user (current row excluded — a self-inclusive
    baseline dampens the very anomaly being scored).

    Scale design: ONE exchange on ``user_id``; both moments come from the
    same window over DECIMAL casts, so the sum is exact regardless of
    intra-frame order and the oracle agrees bit-for-bit. Rows with a full
    lookback only (count = lookback) — a warm-up row scored against 3
    events is noise, and the filter is an exact integer compare.
    """
    dec = F.col("value").cast("decimal(18,2)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-lookback, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s_d = F.sum(dec).over(w).cast("double")
    ss_d = F.sum(dec * dec).over(w).cast("double")
    k = F.lit(float(lookback))
    mean = s_d / k
    var = (ss_d - (k * mean) * mean) / F.lit(float(lookback - 1))
    # guard BEFORE sqrt: a constant-valued frame can yield a tiny NEGATIVE
    # variance in floating point (e.g. 20×0.11 → -2.9e-18); sqrt of that
    # is NaN, and NaN > 0 is TRUE under Spark's NaN ordering — the filter
    # must be on var itself (the streaming twin and the oracle agree)
    z = (F.col("value") - mean) / F.sqrt(var)
    zq = _q(z, 1000)
    return (
        events.select(
            "event_id", "user_id", "value",
            n.alias("_n"), var.alias("_var"), zq.alias("zscore"),
        )
        .filter((F.col("_n") == lookback) & (F.col("_var") > 0))
        .select(
            "event_id",
            "user_id",
            "zscore",
            (F.abs(F.col("zscore")) > ZSCORE_FLAG).alias("is_outlier"),
        )
    )


@register(
    "q_zscore_outliers",
    f"""
    WITH w AS (
      SELECT event_id, user_id, value,
             count(*) OVER fr AS _n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE) AS _s,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  OVER fr AS DOUBLE) AS _ss
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
    ), sc AS (
      SELECT event_id, user_id, value,
             _s / {ZSCORE_LOOKBACK}.0 AS _mean,
             (_ss - ({ZSCORE_LOOKBACK}.0 * (_s / {ZSCORE_LOOKBACK}.0))
                    * (_s / {ZSCORE_LOOKBACK}.0)) / {ZSCORE_LOOKBACK - 1}.0 AS _var
      FROM w WHERE _n = {ZSCORE_LOOKBACK}
    )
    SELECT event_id, user_id,
           floor((value - _mean) / sqrt(_var) * 1000 + 0.5) / 1000 AS zscore,
           abs(floor((value - _mean) / sqrt(_var) * 1000 + 0.5) / 1000) > {ZSCORE_FLAG} AS is_outlier
    FROM sc WHERE _var > 0
    """,
    doc="Rolling z-score anomaly detection: per-user trailing-20 mean/std "
    "(current row excluded), |z|>3 flags. Decimal-exact moments, one "
    "window exchange — the streaming-monitoring shape run as a batch scan",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_outliers(load(spark, sf_dir, "events"))


def funnel_counts(events: DataFrame) -> DataFrame:
    """signup -> click -> purchase conversion funnel.

    Stage k's first-event time is the min ts strictly after stage k-1's,
    per user. Each hop is aggregate -> equi-join on ``user_id`` -> filter
    -> aggregate: every exchange keys on ``user_id``, so the plan is three
    co-partitioned hash joins over an already-clustered stream — no
    sort-based sessionization, no per-user collect. Final counts reduce to
    one row; rates are quantized exact-count divisions.
    """
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    ns = s.agg(F.count(F.lit(1)).alias("n_signup"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    # three one-row aggregates; the cross joins are literal-sized
    out = ns.crossJoin(nc).crossJoin(np_)
    # n_signup can be 0 (a stream with no signups) — NULL rates, not a
    # divide-by-zero under ANSI mode
    def rate(num):
        return F.when(
            F.col("n_signup") > 0,
            _q(F.col(num).cast("double") / F.col("n_signup"), 10000),
        )

    return out.select(
        "n_signup",
        "n_click",
        "n_purchase",
        rate("n_click").alias("click_rate"),
        rate("n_purchase").alias("purchase_rate"),
    )


@register(
    "q_funnel",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1 GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           CASE WHEN (SELECT count(*) FROM s) > 0 THEN
             floor(CAST((SELECT count(*) FROM c) AS DOUBLE)
                   / (SELECT count(*) FROM s) * 10000 + 0.5) / 10000 END AS click_rate,
           CASE WHEN (SELECT count(*) FROM s) > 0 THEN
             floor(CAST((SELECT count(*) FROM p) AS DOUBLE)
                   / (SELECT count(*) FROM s) * 10000 + 0.5) / 10000 END AS purchase_rate
    """,
    doc="Conversion funnel signup->click->purchase with strict event-time "
    "ordering between stages; per-stage first-event times via co-keyed "
    "aggregate/join hops on user_id — no sessionization sort, no collect",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_counts(load(spark, sf_dir, "events"))


def retention_cohort(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of their
    first event; for each cohort x week-offset, how many are active.

    Two aggregates keyed on ``user_id`` (first week; distinct active
    weeks) joined on the same key, then a rollup to the tiny
    (cohort, offset) grid. date_trunc('week') is Monday-anchored on both
    engines; the offset is an exact day-difference floor-div 7.
    """
    fw = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = events.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        act.join(fw, "user_id")
        .groupBy(
            F.col("cohort").cast("date").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_retention_cohort",
    """
    WITH fw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT CAST(fw.cohort AS DATE) AS cohort_week,
           CAST(datediff('day', fw.cohort, act.wk) // 7 AS INT) AS week_offset,
           count(*) AS n_users
    FROM act JOIN fw ON act.user_id = fw.user_id
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention: cohort = Monday-truncated week of each "
    "user's first event; n_users active per (cohort, week offset). Both "
    "heavy aggregates key on user_id and join co-partitioned; the final "
    "grid groupBy is over ~weeks^2 rows",
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohort(load(spark, sf_dir, "events"))


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization (vector-store prep).

    scale = 127 / max|x|; q_i = floor(x*scale + 0.5) — round-half-up on
    both engines, |q_i| <= 127 by construction so no clamp branch. Pure
    per-row array arithmetic: zero shuffle, scan-parallel, 4x smaller
    payload ahead of ANN indexing (`similarity.py` consumes the same
    layout). Zero vectors keep scale = 0 and an all-zero code.
    """
    xd = lambda x: x.cast("double")  # noqa: E731 — float->double widen once
    m = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    scale = F.when(m > 0, F.lit(127.0) / m).otherwise(F.lit(0.0))
    return emb.select(
        "vec_id",
        scale.alias("scale"),
        F.transform(
            "embedding",
            lambda x: F.floor(xd(x) * scale + F.lit(0.5)).cast("int"),
        ).alias("qvec"),
    )


@register(
    "q_quantize_embeddings",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    )
    SELECT vec_id,
           CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale,
           array_to_string(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE)
                             * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END)
                             + 0.5) AS INT)), ',') AS qvec
    FROM m
    """,
    doc="Symmetric int8 embedding quantization: per-vector scale "
    "127/max|x|, round-half-up codes in [-127,127]. Zero-shuffle array "
    "arithmetic; identical float->double widening and association on both "
    "engines makes scale and codes bit-exact",
)
def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = quantize_embeddings(ensure_parallelism(load(spark, sf_dir, "embeddings")))
    # int codes joined to one string: array columns are real in the library
    # API; the declared query projects a hash-stable scalar form
    return out.select("vec_id", "scale", F.concat_ws(",", F.col("qvec")).alias("qvec"))


def chunk_dedup_stats(docs: DataFrame, hashed: bool = True) -> DataFrame:
    """Corpus-wide chunk-level exact dedup (paragraph dedup for a corpus
    with no paragraph marks): chunk every document (stride/size from
    ``corpus_queries``), keep each chunk text's first occurrence in
    (doc_id, chunk_id) order, report per-document survivorship.

    ``hashed=True`` is the 100 TB path: the survivor is the min
    (doc_id, chunk_id) PER ``xxhash64(chunk_text)`` — an 8-byte shuffle
    key instead of a ~32-token string — computed with a partial-
    aggregatable ``groupBy().agg(min(struct))`` + co-keyed join-back
    rather than a ``row_number`` window. The distinction is the skew
    story: a boilerplate chunk repeated 10⁹ times puts 10⁹ rows into one
    window partition (one task), while map-side combine collapses the
    same hot key to one row per input partition before the exchange.
    Identical output modulo ~|chunks|²/2⁶⁴ collisions (string≡hash
    equivalence asserted in tests). ``False`` is the oracle-shaped
    windowed string form.
    """
    tk = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(tk), F.lit(CHUNK_STRIDE))
    chunks = (
        ensure_parallelism(docs)
        .select("doc_id", tk.alias("tk"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.array_join(F.slice("tk", F.col("s"), CHUNK_TOKENS), " ").alias(
                "chunk_text"
            ),
        )
    )
    if hashed:
        keyed = chunks.select(
            "doc_id", "chunk_id", F.xxhash64("chunk_text").alias("_k")
        )
        firsts = keyed.groupBy("_k").agg(
            F.min(F.struct("doc_id", "chunk_id")).alias("_first")
        )
        ranked = keyed.join(firsts, "_k").select(
            "doc_id",
            (F.struct("doc_id", "chunk_id") == F.col("_first"))
            .cast("int")
            .alias("_kept"),
        )
    else:
        w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
        ranked = chunks.select(
            "doc_id",
            (F.row_number().over(w) == 1).cast("int").alias("_kept"),
        )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("_kept").alias("n_kept"),
        _q(F.sum("_kept").cast("double") / F.count(F.lit(1)), 10000).alias(
            "keep_ratio"
        ),
    )


@register(
    "q_chunk_dedup",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), ch AS (
      SELECT doc_id,
             CAST((s - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
             array_to_string(tk[s : s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text
      FROM tok, unnest(range(1, len(tk) + 1, {CHUNK_STRIDE})) AS u(s)
    ), ranked AS (
      SELECT doc_id,
             CASE WHEN row_number() OVER (PARTITION BY chunk_text
                        ORDER BY doc_id, chunk_id) = 1 THEN 1 ELSE 0 END AS _kept
      FROM ch
    )
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(_kept) AS BIGINT) AS n_kept,
           floor(CAST(sum(_kept) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
             AS keep_ratio
    FROM ranked GROUP BY doc_id
    """,
    doc="Chunk-level exact dedup survivorship: first occurrence of each "
    "chunk text (by doc_id, chunk_id) survives; per-doc kept ratio. Spark "
    "keys the survivor min-aggregate on xxhash64(chunk_text) — 8-byte "
    "shuffle key, map-side combine absorbs hot boilerplate chunks, "
    "string≡hash equivalence tested — DuckDB oracle uses the windowed "
    "string form",
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_dedup_stats(load(spark, sf_dir, "documents"))


def forward_fill_daily(events: DataFrame) -> DataFrame:
    """Per-user daily resample with forward fill (gap filling): build each
    user's calendar-day spine from their first to last event day, attach
    the day's LAST observed value, and carry the previous value across
    silent days.

    The trading-pipeline shape (daily close carried over non-trading
    days), distributed: the spine is a per-row ``sequence()`` explode —
    no calendar cross join — and the fill is one ``last_value(ignorenulls)``
    window over the same ``user_id`` key the daily aggregate already
    shuffled on, so the whole op is two co-keyed exchanges.
    """
    day = F.col("ts").cast("date")
    daily = (
        events.groupBy("user_id", day.alias("day"))
        .agg(
            F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))["value"]
            .alias("day_value")
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    return joined.select(
        "user_id",
        "day",
        F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("day_value").isNotNull().alias("observed"),
    )


@register(
    "q_forward_fill",
    """
    WITH daily AS (
      SELECT user_id, day, day_value FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value AS day_value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), spine AS (
      SELECT user_id, CAST(u.d AS DATE) AS day
      FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
            FROM daily GROUP BY user_id) b,
           unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(d)
    )
    SELECT s.user_id, s.day,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_ffill,
           d.day_value IS NOT NULL AS observed
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
    doc="Per-user daily resample + forward fill: per-row sequence() spine "
    "(no calendar cross join), day's last value by (ts, event_id) "
    "tie-break, last_value(ignorenulls) carry-over — two co-keyed "
    "exchanges on user_id",
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return forward_fill_daily(load(spark, sf_dir, "events"))


def interpolate_daily(events: DataFrame) -> DataFrame:
    """Per-user daily resample with LINEAR interpolation across gaps: the
    companion to :func:`forward_fill_daily` when the series is a level
    (price, balance, temperature) rather than a state — silent days get
    the time-weighted value between the surrounding observations instead
    of a stale carry-over.

    Same distributed shape as the forward fill (per-row ``sequence()``
    spine, no calendar cross join) plus ONE more window pass in the other
    direction: prev/next observed (day, value) come from
    ``last(ignorenulls)`` over the preceding frame and
    ``first(ignorenulls)`` over the following frame, both on the
    ``user_id`` key the spine join already shuffled on — the whole op
    stays two co-keyed exchanges. The spine spans each user's observed
    [min_day, max_day], so every silent day has both neighbours and the
    output carries no NULLs.
    """
    day = F.col("ts").cast("date")
    daily = (
        events.groupBy("user_id", day.alias("day"))
        .agg(
            F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))["value"]
            .alias("day_value")
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    pv = F.last("day_value", ignorenulls=True).over(wp)
    pd_ = F.last(obs_day, ignorenulls=True).over(wp)
    nv = F.first("day_value", ignorenulls=True).over(wn)
    nd = F.first(obs_day, ignorenulls=True).over(wn)
    frac = F.datediff(F.col("day"), pd_).cast("double") / F.datediff(nd, pd_).cast(
        "double"
    )
    interp = F.when(F.col("day_value").isNotNull(), F.col("day_value")).otherwise(
        pv + (nv - pv) * frac
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        _q(interp, 10000).alias("value_interp"),
        F.col("day_value").isNotNull().alias("observed"),
    )


@register(
    "q_interpolate",
    """
    WITH daily AS (
      SELECT user_id, day, day_value FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value AS day_value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), spine AS (
      SELECT user_id, CAST(u.d AS DATE) AS day
      FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
            FROM daily GROUP BY user_id) b,
           unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(d)
    ), f AS (
      SELECT s.user_id, s.day, d.day_value,
        last_value(d.day_value IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN d.day_value IS NOT NULL THEN s.day END
                   IGNORE NULLS) OVER wp AS pd,
        first_value(d.day_value IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN d.day_value IS NOT NULL THEN s.day END
                    IGNORE NULLS) OVER wn AS nd
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day
      WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           floor((CASE WHEN day_value IS NOT NULL THEN day_value
                  ELSE pv + (nv - pv)
                       * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                  END) * 10000 + 0.5) / 10000 AS value_interp,
           day_value IS NOT NULL AS observed
    FROM f
    """,
    doc="Per-user daily resample + LINEAR gap interpolation: sequence() "
    "spine, prev/next observed (day, value) via last/first(ignorenulls) "
    "windows in both directions over the SAME user_id key the spine join "
    "shuffled on — two co-keyed exchanges total; time-weighted "
    "prev+(next-prev)*frac written with identical association on both "
    "engines, quantized 4dp",
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interpolate_daily(load(spark, sf_dir, "events"))


@register(
    "q_winsorize",
    """
    WITH b AS (
      SELECT event_type,
             floor(quantile_cont(value, 0.05) * 100 + 0.5) / 100 AS lo,
             floor(quantile_cont(value, 0.95) * 100 + 0.5) / 100 AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           floor(least(greatest(e.value, b.lo), b.hi) * 100 + 0.5) / 100
             AS value_w,
           e.value < b.lo OR e.value > b.hi AS clipped
    FROM events e JOIN b ON e.event_type = b.event_type
    """,
    doc="Per-group winsorization: clip value to the [p05, p95] band of "
    "its event_type — the outlier-robust normalization before training "
    "on heavy-tailed metrics. Bounds are exact interpolated percentiles "
    "(Spark percentile ≡ DuckDB quantile_cont) QUANTIZED to 2dp before "
    "any comparison, so a final-ulp interpolation difference can't flip "
    "a boundary clip between engines. Tiny per-type bound table joins "
    "back broadcast; one aggregate exchange",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        _q(F.expr("percentile(value, 0.05)"), 100).alias("lo"),
        _q(F.expr("percentile(value, 0.95)"), 100).alias("hi"),
    )
    return ev.join(bounds, "event_type").select(
        "event_id",
        "event_type",
        _q(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 100).alias(
            "value_w"
        ),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "clipped"
        ),
    )


AUTOCORR_MIN_PAIRS = 10


@register(
    "q_autocorr",
    f"""
    WITH pairs AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,2)) AS y,
             lag(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
      FROM events
    ), s AS (
      SELECT user_id, count(*) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM pairs WHERE x IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n,
           floor((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy))
                 * 1000000 + 0.5) / 1000000 AS r1
    FROM s
    WHERE n >= {AUTOCORR_MIN_PAIRS}
      AND (CAST(n AS DOUBLE) * sxx - sx * sx)
          * (CAST(n AS DOUBLE) * syy - sy * sy) > 0
    """,
    doc="Per-user lag-1 autocorrelation of the value series (mean-"
    "reversion / momentum signal). Built from six decimal-exact sums per "
    "user — NOT corr(), whose double accumulation is partition-fold-order "
    "nondeterministic at cluster scale — then one double expression with "
    "identical association on both engines, quantized to 1e-6. One "
    "window exchange reused by the aggregate (same user_id key)",
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id", dec.alias("y"), F.lag(dec).over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    s = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    dxx = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = n_d * F.col("syy") - F.col("sy") * F.col("sy")
    num = n_d * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.filter((F.col("n") >= AUTOCORR_MIN_PAIRS) & (dxx * dyy > 0))
        .select("user_id", "n", _q(num / F.sqrt(dxx * dyy), 1_000_000).alias("r1"))
    )


@register(
    "q_type_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           floor(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY prev_type) * 1000000 + 0.5)
             / 1000000 AS p
    FROM t
    """,
    doc="Event-type transition matrix (first-order Markov estimate): "
    "per-user consecutive type pairs -> counts + row-normalized "
    "probabilities. Sequencing window keys on user_id; the transition "
    "aggregate is a tiny |types|^2 table, and p is one integer-exact "
    "division quantized to 1e-6. The sequence-mining shape behind "
    "next-action prediction and funnel discovery",
)
def q_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    row_total = F.sum("n").over(Window.partitionBy("prev_type"))
    return t.select(
        "prev_type",
        "next_type",
        "n",
        _q(F.col("n").cast("double") / row_total, 1_000_000).alias("p"),
    )


@register(
    "q_active_users",
    """
    WITH pairs AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), dau AS (
      SELECT day, count(*) AS dau FROM pairs GROUP BY day
    ), wau AS (
      SELECT CAST(u.wd AS DATE) AS day, count(DISTINCT p.user_id) AS wau
      FROM pairs p,
           unnest(generate_series(p.day, p.day + INTERVAL 6 DAY,
                                  INTERVAL 1 DAY)) AS u(wd)
      GROUP BY 1
    )
    SELECT d.day, d.dau, w.wau,
           floor(CAST(d.dau AS DOUBLE) / w.wau * 10000 + 0.5) / 10000
             AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
    doc="DAU / trailing-7-day WAU / stickiness per day. Sliding-window "
    "DISTINCT can't partial-aggregate directly, so the scale shape is: "
    "distinct (user, day) pairs first (the only corpus-sized shuffle — "
    "|users|x|days| rows after), then each pair votes into the 7 window "
    "days it serves via a sequence() explode (7x a SMALL table, not the "
    "event stream) before the per-day distinct count. Rows restricted to "
    "days with activity via the DAU join",
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        pairs.select(
            "user_id",
            F.explode(
                F.sequence("day", F.date_add("day", 6), F.expr("interval 1 day"))
            ).alias("day"),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        _q(F.col("dau").cast("double") / F.col("wau"), 10000).alias("stickiness"),
    )


_EWMA_LAGS = 8  # bounded lookback; alpha = 1/2 so every weight 2^-j is IEEE-exact


def _ewma_sql_terms() -> tuple[str, str]:
    num = " + ".join(
        f"coalesce(lag(value, {j}) OVER w * {2.0 ** -j!r}, 0)" if j else "value"
        for j in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {2.0 ** -j!r} ELSE 0 END)"
        if j
        else "1.0"
        for j in range(_EWMA_LAGS)
    )
    return num, den


@register(
    "q_ewma",
    f"""
    SELECT user_id, ts, event_id,
           floor(({_ewma_sql_terms()[0]}) / ({_ewma_sql_terms()[1]})
                 * 1000000 + 0.5) / 1000000 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Bounded-lookback EWMA (alpha=1/2, 8 lags) per user: one window "
    "exchange on user_id, then pure lag arithmetic. alpha=1/2 makes every "
    "weight an exact power of two, and the explicit left-to-right "
    "addition order is identical in Spark and DuckDB, so the smoothed "
    "value is IEEE-bit-exact across engines before quantization. The "
    "unbounded-recursion EWMA needs a sequential scan per key; the "
    "bounded form is the shape that parallelizes (weights below 2^-8 are "
    "under float noise anyway)",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("value")
    den = F.lit(1.0)
    for j in range(1, _EWMA_LAGS):
        lj = F.lag("value", j).over(w)
        num = num + F.coalesce(lj * F.lit(2.0 ** -j), F.lit(0.0))
        den = den + F.when(lj.isNotNull(), F.lit(2.0 ** -j)).otherwise(F.lit(0.0))
    return ev.select(
        "user_id", "ts", "event_id", _q(num / den, 1_000_000).alias("ewma")
    )


_EVENT_CODES = {"signup": "S", "view": "V", "click": "C", "purchase": "P", "error": "E"}


@register(
    "q_sequence_pattern",
    """
    WITH j AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'signup' THEN 'S'
                                        WHEN 'view' THEN 'V'
                                        WHEN 'click' THEN 'C'
                                        WHEN 'purchase' THEN 'P'
                                        ELSE 'E' END,
                        '' ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(journey) AS journey_len,
           len(regexp_extract_all(journey, 'CP')) AS n_quick_conversions,
           strpos(journey, 'CP') AS first_conversion_pos
    FROM j
    """,
    doc="MATCH_RECOGNIZE-style sequence pattern detection: each user's "
    "event journey becomes a code string (deterministic (ts, event_id) "
    "order via array_sort over structs), then click->purchase "
    "adjacencies are counted with plain JVM regex. ONE exchange on "
    "user_id; journeys stay bounded per key (the per-user event list), "
    "so the pattern scan parallelizes per user where a true sequential "
    "NFA over the global stream would not",
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    code = F.lit("E")
    for k, v in reversed(list(_EVENT_CODES.items())):
        code = F.when(F.col("event_type") == k, v).otherwise(code)
    j = (
        ev.select("user_id", F.struct("ts", "event_id", code.alias("code")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["code"]),
                "",
            ).alias("journey")
        )
    )
    return j.select(
        "user_id",
        F.length("journey").alias("journey_len"),
        F.regexp_count("journey", F.lit("CP")).cast("long").alias("n_quick_conversions"),
        F.instr("journey", "CP").cast("long").alias("first_conversion_pos"),
    )


@register(
    "q_skyline",
    """
    WITH p AS (
      SELECT p_partkey,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
             p_size
      FROM part
    ), m AS (
      SELECT *,
             max(p_size) OVER (ORDER BY price_c
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS dom
      FROM p
    )
    SELECT p_partkey, price_c, p_size
    FROM m WHERE dom IS NULL OR p_size >= dom
    """,
    doc="2-D skyline / Pareto frontier (min price, max size): parts not "
    "strictly dominated on both dimensions. The oracle's global RANGE "
    "window is the SinglePartition cluster-killer; the plan "
    "(plans/skyline.py) is the two-pass quantile-bucket form — "
    "per-bucket integer-RANGE running max + literal prefix maxima — "
    "with every stage partition-parallel (no-SinglePartition asserted "
    "in tests/test_plans.py)",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.skyline import skyline_2d

    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("price_c"),
        "p_size",
    )
    return skyline_2d(part, "price_c", "p_size")


# --------------------------------------------------------- drift monitoring

DRIFT_BUCKETS = 10
DRIFT_VMAX = 20.0  # fixed bucket bounds: [0, 2, 4, ..., 18, inf)


def drift_bucket(
    col: str = "value", buckets: int = DRIFT_BUCKETS, vmax: float = DRIFT_VMAX
):
    """THE fixed-bound drift bucketing, shared by the batch q_drift_tvd
    and the streaming drift monitor (streaming/sinks.make_drift_monitor)
    so the two can never silently diverge: floor(value/width) clamped to
    [0, buckets-1]."""
    return F.greatest(
        F.least(
            F.floor(F.col(col) / (vmax / buckets)), F.lit(buckets - 1)
        ),
        F.lit(0),
    )


def drift_tvd(events: DataFrame) -> DataFrame:
    """Distribution drift of ``value`` between the first and second half
    of the stream (by event time), per event type, as the TOTAL
    VARIATION DISTANCE ``0.5 · Σ|p_i − q_i|`` over fixed value buckets.

    TVD instead of PSI/KL: pure rational arithmetic (counts and one
    division per bucket), so the metric is bit-identical across engines
    — no libm logs. Fixed bucket bounds (not quantiles) keep the two
    windows comparable and the bucketing a zero-shuffle expression. The
    whole op is two partial-aggregated exchanges: (type, half, bucket)
    counts, then the per-type fold. The midpoint here is the exact
    stream median (demo form, one extra pass); a production monitor
    splits on a KNOWN boundary — yesterday vs today, train vs serve —
    making the whole op two aggregates with no split pass.
    """
    half = events.agg(
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.5)").alias("c")
    ).first()["c"]
    bucket = drift_bucket("value")
    counts = (
        events.select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) > half).cast("int").alias("h"),
            bucket.alias("b"),
        )
        .groupBy("event_type", "h", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("event_type", "h").agg(F.sum("n").alias("t"))
    shares = counts.join(totals, ["event_type", "h"]).select(
        "event_type",
        "b",
        F.when(F.col("h") == 0, F.col("n") / F.col("t")).alias("p"),
        F.when(F.col("h") == 1, F.col("n") / F.col("t")).alias("q"),
    )
    return (
        shares.groupBy("event_type", "b")
        .agg(
            F.coalesce(F.sum("p"), F.lit(0.0)).alias("p"),
            F.coalesce(F.sum("q"), F.lit(0.0)).alias("q"),
        )
        .groupBy("event_type")
        .agg(
            _q(F.sum(F.abs(F.col("p") - F.col("q"))) / 2.0, 1000000).alias(
                "tvd"
            ),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


@register(
    "q_drift_tvd",
    f"""
    WITH half AS (
      SELECT quantile_cont(epoch_us(ts), 0.5) AS c FROM events
    ), e AS (
      SELECT event_type,
             CAST(epoch_us(ts) > (SELECT c FROM half) AS INT) AS h,
             greatest(least(floor(value / {DRIFT_VMAX / DRIFT_BUCKETS}),
                            {DRIFT_BUCKETS - 1}), 0) AS b
      FROM events
    ), counts AS (
      SELECT event_type, h, b, count(*) AS n FROM e GROUP BY 1, 2, 3
    ), totals AS (
      SELECT event_type, h, sum(n) AS t FROM counts GROUP BY 1, 2
    ), shares AS (
      SELECT c.event_type, c.b,
             CASE WHEN c.h = 0 THEN c.n * 1.0 / t.t END AS p,
             CASE WHEN c.h = 1 THEN c.n * 1.0 / t.t END AS q
      FROM counts c JOIN totals t USING (event_type, h)
    ), merged AS (
      SELECT event_type, b,
             coalesce(sum(p), 0.0) AS p, coalesce(sum(q), 0.0) AS q
      FROM shares GROUP BY event_type, b
    )
    SELECT event_type,
           floor(sum(abs(p - q)) / 2.0 * 1000000 + 0.5) / 1000000 AS tvd,
           count(*) AS n_buckets
    FROM merged GROUP BY event_type
    """,
    doc="Train/serve-style distribution drift per event type: total "
    "variation distance of the value histogram between the first and "
    "second half of the stream — fixed buckets, pure rational "
    "arithmetic (no libm), two partial-aggregated exchanges",
)
def q_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_tvd(load(spark, sf_dir, "events"))


@register(
    "q_time_to_convert",
    """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      FROM events GROUP BY user_id
    ), d AS (
      SELECT (t_purchase - t_signup) // 1000000 AS secs
      FROM f WHERE t_signup IS NOT NULL AND t_purchase > t_signup
    )
    SELECT count(*)                    AS n_converted,
           median(secs)                AS p50_secs,
           quantile_cont(secs, 0.90)   AS p90_secs,
           min(secs)                   AS min_secs,
           max(secs)                   AS max_secs
    FROM d
    """,
    doc="Time-to-convert funnel latency: per user the first signup -> "
    "first later purchase gap, then exact integral-seconds percentiles "
    "(interpolation on integers is exact on both engines, the q_median "
    "trick). One user_id exchange + a tiny scalar aggregate",
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    f = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros(F.col("ts").cast("timestamp")))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts").cast("timestamp")))
        ).alias("t_purchase"),
    )
    d = f.filter(
        F.col("t_signup").isNotNull()
        & (F.col("t_purchase") > F.col("t_signup"))
    ).select(
        ((F.col("t_purchase") - F.col("t_signup")) / F.lit(1000000))
        .cast("long")
        .alias("secs")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("median(secs)").alias("p50_secs"),
        F.expr("percentile(secs, 0.90)").alias("p90_secs"),
        F.min("secs").alias("min_secs"),
        F.max("secs").alias("max_secs"),
    )


# ------------------------------------------------------- gaps-and-islands


def activity_streaks(events: DataFrame) -> DataFrame:
    """Per-user activity streaks (the gaps-and-islands pattern): group
    each user's distinct active days into maximal runs of consecutive
    days, then report streak count, total active days, and the longest
    streak (earliest wins ties).

    Island id is ``day - row_number()`` — constant within a consecutive
    run, distinct across runs — so the whole op is the distinct-days
    dedup, one window, and two aggregates, ALL keyed on ``user_id``:
    every exchange is the same key and AQE coalesces them. No self-join,
    no spine; cost is |active days|, not |date range|.
    """
    day = F.col("ts").cast("date")
    active = events.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    streaks = (
        active.withColumn("island", F.date_sub(F.col("day"), F.row_number().over(w)))
        .groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("day").alias("s"),
            F.max("day").alias("e"),
        )
    )
    best = streaks.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("len"), F.asc("s"))
        ),
    ).filter(F.col("rk") == 1)
    agg = streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
    )
    return agg.join(best, "user_id").select(
        "user_id",
        "n_streaks",
        "n_active_days",
        F.col("len").alias("longest_len"),
        F.col("s").alias("longest_start"),
        F.col("e").alias("longest_end"),
    )


@register(
    "q_streaks",
    """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER) AS island
      FROM active
    ), st AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS len,
             min(day) AS s, max(day) AS e
      FROM isl GROUP BY user_id, island
    ), best AS (
      SELECT user_id, len, s, e,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, s) AS rk
      FROM st
    ), agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(sum(len) AS BIGINT) AS n_active_days
      FROM st GROUP BY user_id
    )
    SELECT a.user_id, a.n_streaks, a.n_active_days,
           b.len AS longest_len, b.s AS longest_start, b.e AS longest_end
    FROM agg a JOIN best b ON a.user_id = b.user_id AND b.rk = 1
    """,
    doc="Gaps-and-islands activity streaks: day - row_number() island "
    "ids over distinct active days, per-user streak stats + longest run "
    "(earliest tie-break). Dedup, window, and both aggregates all keyed "
    "on user_id — co-keyed exchanges, cost |active days| not |calendar|",
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return activity_streaks(load(spark, sf_dir, "events"))


# ------------------------------------------------------------ change point


def changepoint_daily(events: DataFrame) -> DataFrame:
    """CUSUM-style change-point estimate per event type: the day t that
    maximizes |S_t| where S_t = Σ_{i<=t}(x_i − mean) is the classic
    argmax-of-the-CUSUM-bridge estimator for a single mean shift in the
    daily volume series.

    Everything stays integer until the final report: with T days and
    total N events, days·S_t = T·cumsum_t − t·N — exact on any engine,
    so the argmax (and therefore the reported day) can never flip on a
    floating-point ulp. One aggregate + one window, both keyed on
    ``event_type``; the per-type (total, days) frame is broadcast-sized.
    """
    day = F.col("ts").cast("date")
    daily = events.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("days")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    st = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("cum", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("t", F.row_number().over(w))
        .withColumn(
            "s_scaled", F.col("days") * F.col("cum") - F.col("t") * F.col("total")
        )
    )
    pick = st.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.abs(F.col("s_scaled")).desc(), F.col("day").asc()
            )
        ),
    ).filter(F.col("rk") == 1)
    return pick.select(
        "event_type",
        F.col("day").alias("change_day"),
        _q(F.col("s_scaled").cast("double") / F.col("days"), 10000).alias("cusum_dev"),
        _q(F.col("total").cast("double") / F.col("days"), 10000).alias("daily_mean"),
    )


@register(
    "q_changepoint",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), tot AS (
      SELECT event_type, sum(n) AS total, count(*) AS days
      FROM daily GROUP BY event_type
    ), st AS (
      SELECT d.event_type, d.day,
             t.days * sum(d.n) OVER (PARTITION BY d.event_type ORDER BY d.day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
             - row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
               * t.total AS s_scaled,
             t.total, t.days
      FROM daily d JOIN tot t ON d.event_type = t.event_type
    ), pick AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(s_scaled) DESC, day) AS rk
      FROM st
    )
    SELECT event_type, day AS change_day,
           floor(CAST(s_scaled AS DOUBLE) / days * 10000 + 0.5) / 10000
             AS cusum_dev,
           floor(CAST(total AS DOUBLE) / days * 10000 + 0.5) / 10000
             AS daily_mean
    FROM pick WHERE rk = 1
    """,
    doc="Per-type change-point estimate: argmax |CUSUM bridge| over the "
    "daily volume series, kept INTEGER (T*cumsum - t*N) until the final "
    "report so the argmax can never flip on an ulp. One aggregate + one "
    "window co-keyed on event_type; broadcast per-type totals",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changepoint_daily(load(spark, sf_dir, "events"))


# ------------------------------------------------------ intraday seasonality

def seasonal_profile(events: DataFrame) -> DataFrame:
    """(weekday, hour) seasonal baseline over the event stream: per-cell
    volume and mean value plus a seasonality index (cell mean / global
    mean) — the intraday/weekly profile a trading or traffic pipeline
    fits before it can call anything an anomaly.

    Plan: one partial-agg shuffle to the 7x24 grid plus a 1-row global
    aggregate broadcast back (scalar-subquery pattern, allowlisted in
    tools/plan_audit.py) — the fact table is scanned twice but never
    wide-shuffled, and the second scan shares the parquet cache.
    """
    cells = events.groupBy(
        F.weekday("ts").alias("wd"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    totals = events.agg(
        F.sum("value").alias("st"), F.count(F.lit(1)).alias("ct")
    )
    return cells.crossJoin(totals).select(
        "wd",
        "hr",
        "n",
        _q(F.col("sv") / F.col("n"), 10000).alias("avg_value"),
        _q((F.col("sv") / F.col("n")) / (F.col("st") / F.col("ct")), 10000).alias(
            "seasonal_idx"
        ),
    )


@register(
    "q_seasonal_profile",
    """
    WITH c AS (
      SELECT CAST(isodow(ts) - 1 AS INT) AS wd,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
             count(*) AS n, sum(value) AS sv
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT sum(value) AS st, count(*) AS ct FROM events
    )
    SELECT wd, hr, n,
           floor(sv / n * 10000 + 0.5) / 10000 AS avg_value,
           floor((sv / n) / (st / ct) * 10000 + 0.5) / 10000 AS seasonal_idx
    FROM c, t
    """,
    doc="Weekday x hour seasonal profile with a seasonality index "
    "(cell mean over global mean; weekday() == isodow-1 on both "
    "engines, Monday=0). 7x24-bounded output; the global mean arrives "
    "as a 1-row broadcast, never a single-partition window funnel",
)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_profile(load(spark, sf_dir, "events"))

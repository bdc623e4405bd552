"""As-of join (extension op E10): for each left row, the latest right row
at or before its timestamp, per key.

Two strategies:

- :func:`asof_join_union` — the scale path: tag both sides, UNION, one
  window pass with ``last(value, ignorenulls=True)`` over
  (key ORDER BY ts, side). Exactly ONE shuffle on the key, no join
  blow-up, no range-condition nested loop. This is how you as-of join two
  100 TB tables.
- :func:`asof_join_pandas` — ``applyInPandas`` + ``pandas.merge_asof`` per
  key group: useful when per-key state logic grows beyond what a window
  expresses; Arrow-batched. Same one-shuffle cost but crosses into Python.

Tie semantics: a right row at exactly the left row's timestamp IS matched
(``>=``, like pandas merge_asof and DuckDB ASOF JOIN) — the right side
sorts before the left at equal ts via the side tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_col: str = "value",
    value_alias: str = "asof_value",
) -> DataFrame:
    """Left as-of join via union + ignore-nulls last over one window.

    ``left`` keeps all its columns; ``right`` contributes ``value_col`` as
    ``value_alias`` — typed as the right side's actual dtype — and is null
    only when NO right row exists at or before the left ts. The payload
    rides inside a one-field struct so ``last(ignorenulls)`` tracks the
    latest right ROW, not the latest non-null VALUE: a right row whose
    payload is NULL yields NULL (as pandas ``merge_asof`` and DuckDB ASOF
    do) instead of falling through to an older row.
    """
    lcols = left.columns
    rtype = dict(right.dtypes)[value_col]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(f"struct<v:{rtype}>")
    )
    r_tag = (
        right.select(
            on,
            ts_col,
            F.struct(F.col(value_col).alias("v")).alias("_rv"),
        )
        .withColumn("_side", F.lit(0))
    )
    # align schemas: right side gets nulls for left-only columns
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*lcols, F.col("_m.v").alias(value_alias))
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_col: str = "value",
    value_alias: str = "asof_value",
) -> DataFrame:
    """Same semantics via applyInPandas + merge_asof.

    The cogroup key is a HASH BUCKET of the join key, not the key
    itself: cogrouped ``applyInPandas`` invokes the Python function once
    per grouping-key value, so keying by ``on`` directly paid one
    Arrow round-trip + pandas setup per user (~40 s at sf10 for the
    events table, the round-10 scale audit's q_asof_pandas entry).
    Bucketing by ``pmod(xxhash64(on), n_buckets)`` hands each call
    thousands of keys at once and ``merge_asof(by=on)`` resolves the
    per-key as-of inside the one vectorized call — identical semantics,
    per-call overhead amortized away. ``n_buckets`` derives from the
    session's core count (scale-adaptive, not a local constant).
    """
    import pandas as pd

    rtype = dict(right.dtypes)[value_col]
    out_schema = ", ".join(f"`{n}` {t}" for n, t in left.dtypes) + f", {value_alias} {rtype}"
    out_cols = [*left.columns, value_alias]

    # When both sides derive from the same scan (self-cogroup), Spark dedups
    # same-exprId attributes and the right group would arrive with only the
    # key column — alias the right side to fresh attributes to prevent that.
    right_fresh = right.select(
        F.col(on).alias(on),
        F.col(ts_col).alias("_r_ts"),
        F.col(value_col).alias("_r_value"),
    )

    # Integral/boolean payloads ride through merge_asof as pandas NULLABLE
    # dtypes: otherwise unmatched rows force a float64 promotion, which
    # silently loses precision for int64 above 2^53 and conflates a genuine
    # NaN double payload with "no match".
    _NULLABLE = {
        "tinyint": "Int8", "smallint": "Int16", "int": "Int32",
        "bigint": "Int64", "boolean": "boolean",
    }
    nullable_dtype = _NULLABLE.get(rtype)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        # a bucket present on only one side yields an empty (even
        # column-less) frame for the other side — guard before access
        if l_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        l_pdf = l_pdf.drop(columns=["_bkt"])
        # NULL join keys never match (they formed their own cogroup
        # under the old per-key shape and merged with NULL-key right
        # rows; merge_asof's by-hashing treats NaN keys the same way —
        # split them out explicitly so the behavior is pinned, not an
        # artifact of pandas NaN semantics)
        l_null = l_pdf[l_pdf[on].isna()]
        l_pdf = l_pdf[l_pdf[on].notna()]
        parts = []
        if not l_null.empty:
            ln = l_null.copy()
            ln[value_alias] = None
            parts.append(ln)
        if not l_pdf.empty:
            l_sorted = l_pdf.sort_values(ts_col)
            if r_pdf.empty:
                out = l_sorted.copy()
                out[value_alias] = None
                parts.append(out)
            else:
                r_sorted = (
                    r_pdf[[on, "_r_ts", "_r_value"]]
                    .rename(columns={"_r_ts": ts_col, "_r_value": value_alias})
                    .sort_values(ts_col)
                )
                r_sorted = r_sorted[r_sorted[on].notna()]
                if nullable_dtype is not None:
                    r_sorted[value_alias] = r_sorted[value_alias].astype(
                        nullable_dtype
                    )
                parts.append(
                    pd.merge_asof(
                        l_sorted,
                        r_sorted,
                        on=ts_col,
                        by=on,
                        direction="backward",
                    )
                )
        out = pd.concat(parts) if parts else pd.DataFrame(columns=out_cols)
        return out[out_cols]

    n_buckets = 4 * left.sparkSession.sparkContext.defaultParallelism
    bkt = F.pmod(F.xxhash64(F.col(on)), F.lit(n_buckets))
    return (
        left.withColumn("_bkt", bkt)
        .groupBy("_bkt")
        .cogroup(right_fresh.withColumn("_bkt", bkt).groupBy("_bkt"))
        .applyInPandas(merge, schema=out_schema)
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_col: str = "value",
    value_alias: str = "asof_value",
    tolerance_micros: int | None = None,
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join with a staleness bound and a direction — the pandas
    ``merge_asof(tolerance=..., direction=...)`` surface on the same
    one-shuffle union+window plan as :func:`asof_join_union`.

    - ``backward``: latest right row with ``r.ts <= l.ts`` (and
      ``l.ts - r.ts <= tolerance``); the trade-print-vs-quote shape.
    - ``forward``: earliest right row with ``r.ts >= l.ts`` (and
      ``r.ts - l.ts <= tolerance``); next-event attribution.

    ``right_tiebreak`` (e.g. an event id) makes the choice among
    same-timestamp right rows deterministic: the HIGHEST tiebreak wins in
    both directions. The matched right timestamp rides in the payload
    struct so the tolerance check is a post-window filter — still exactly
    one exchange on the key.
    """
    assert direction in ("backward", "forward")
    lcols = left.columns
    rtype = dict(right.dtypes)[value_col]
    rts_type = dict(right.dtypes)[ts_col]  # timestamp vs timestamp_ntz
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    l_tag = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_tb", F.lit(0).cast("long"))
        .withColumn(
            "_rv", F.lit(None).cast(f"struct<ts:{rts_type},v:{rtype}>")
        )
    )
    r_tag = (
        right.select(
            on,
            ts_col,
            F.struct(F.col(ts_col).alias("ts"), F.col(value_col).alias("v")).alias("_rv"),
            tb.cast("long").alias("_tb"),
        )
        .withColumn("_side", F.lit(0))
    )
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc()]
    else:
        order = [F.col(ts_col).desc(), F.col("_side").asc(), F.col("_tb").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_micros is not None:
        # unix_micros only accepts TIMESTAMP (LTZ); NTZ columns cast
        # identically on both operands, so the DIFFERENCE is exact
        l_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        r_us = F.unix_micros(F.col("_m.ts").cast("timestamp"))
        if direction == "backward":
            dist = l_us - r_us
        else:
            dist = r_us - l_us
        matched = matched.withColumn(
            "_m", F.when(dist <= F.lit(tolerance_micros), F.col("_m"))
        )
    return matched.select(*lcols, F.col("_m.v").alias(value_alias))

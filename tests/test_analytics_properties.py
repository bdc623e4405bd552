"""Property-based invariants for the round-5 analytics ops (hypothesis):
algebraic identities that hold by the operators' semantics for ANY input,
not by fixture luck — quantization is scale-invariant, z-scores are
shift-invariant, retention doesn't count repeats, funnel stage counts are
monotone under adding events."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.analytics_queries import (
    funnel_counts,
    quantize_embeddings,
    retention_cohort,
    zscore_outliers,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(rows):
    return [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=int(h)), int(u), t, float(v), "{}")
        for i, (u, t, h, v) in enumerate(rows)
    ]


vectors = st.lists(
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False).map(
        lambda x: round(x, 3)
    ),
    min_size=2,
    max_size=8,
).filter(lambda v: any(x != 0 for x in v))


@settings(**SETTINGS)
@given(vecs=st.lists(vectors, min_size=1, max_size=5), c=st.sampled_from([0.5, 2.0, 4.0]))
def test_quantize_codes_are_scale_invariant(spark, vecs, c):
    """int8 symmetric quantization depends only on each vector's DIRECTION:
    scaling by c > 0 scales max|x| by the same c (powers of two: exact in
    binary floating point), so every code is unchanged."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    scaled = [(i, [float(x) * c for x in v]) for i, v in enumerate(vecs)]
    schema = "vec_id long, embedding array<double>"
    q1 = {
        r["vec_id"]: r["qvec"]
        for r in quantize_embeddings(spark.createDataFrame(rows, schema)).collect()
    }
    q2 = {
        r["vec_id"]: r["qvec"]
        for r in quantize_embeddings(spark.createDataFrame(scaled, schema)).collect()
    }
    assert q1 == q2


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10_000).map(lambda v: v / 100),
        min_size=25,
        max_size=40,
    ),
    shift=st.integers(min_value=-1000, max_value=1000),
)
def test_zscore_is_shift_invariant(spark, vals, shift):
    """z = (x - mean)/std is invariant under x -> x + k. An integer k is
    exact in both the double input and the decimal(18,2) moment casts, so
    the invariance holds bit-for-bit, not just approximately."""
    rows = _events([(1, "view", i, v) for i, v in enumerate(vals)])
    shifted = _events([(1, "view", i, v + shift) for i, v in enumerate(vals)])
    z1 = {
        r["event_id"]: r["zscore"]
        for r in zscore_outliers(spark.createDataFrame(rows, EVENT_SCHEMA)).collect()
    }
    z2 = {
        r["event_id"]: r["zscore"]
        for r in zscore_outliers(
            spark.createDataFrame(shifted, EVENT_SCHEMA)
        ).collect()
    }
    assert z1 == z2


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user
            st.integers(min_value=0, max_value=24 * 40),  # hours offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_retention_ignores_repeated_activity(spark, rows):
    """The matrix counts distinct active (user, week) pairs — replicating
    every event 3x changes nothing."""
    ev = _events([(u, "view", h, 1.0) for u, h in rows])
    ev3 = ev + [
        (len(ev) + i, ts, u, t, v, p) for i, (_, ts, u, t, v, p) in enumerate(ev * 2)
    ]
    r1 = sorted(
        map(tuple, retention_cohort(spark.createDataFrame(ev, EVENT_SCHEMA)).collect())
    )
    r2 = sorted(
        map(tuple, retention_cohort(spark.createDataFrame(ev3, EVENT_SCHEMA)).collect())
    )
    assert r1 == r2


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.sampled_from(["signup", "click", "purchase", "view"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_stage_counts_are_monotone(spark, rows):
    """n_signup >= n_click >= n_purchase for ANY event stream (each stage
    conditions on the previous), and counts never exceed the user count."""
    ev = spark.createDataFrame(
        _events([(u, t, h, 1.0) for u, t, h in rows]), EVENT_SCHEMA
    )
    out = funnel_counts(ev).collect()[0]
    n_users = ev.select("user_id").distinct().count()
    assert out["n_signup"] >= out["n_click"] >= out["n_purchase"]
    assert out["n_signup"] <= n_users


# ---------------------------------------------------- round-5 batch 3/4 ops

from trading_data_pipeline_spark.operators.bi_queries import (  # noqa: E402
    gini_concentration,
)
from trading_data_pipeline_spark.operators.trading_queries import (  # noqa: E402
    corr_matrix,
    max_drawdown,
)

cents_values = st.lists(
    st.integers(min_value=-10000, max_value=10000).map(lambda c: c / 100.0),
    min_size=1,
    max_size=30,
)


@settings(**SETTINGS)
@given(vals=cents_values)
def test_max_drawdown_matches_sequential_reference(spark, vals):
    """The distributed drawdown equals the obvious O(n) sequential fold
    for ANY 2-decimal value sequence (decimal-exact, so no tolerance)."""
    rows = _events([(1, "t", i, v) for i, v in enumerate(vals)])
    got = max_drawdown(
        spark.createDataFrame(rows, EVENT_SCHEMA)
    ).collect()[0]
    equity = peak = mdd = 0.0
    cents = 0
    peak_c = None
    mdd_c = 0
    for v in vals:
        cents += round(v * 100)
        peak_c = cents if peak_c is None else max(peak_c, cents)
        mdd_c = max(mdd_c, peak_c - cents)
    assert got.max_drawdown == mdd_c / 100.0
    assert got.peak_equity == peak_c / 100.0
    assert got.n_events == len(vals)


@settings(**SETTINGS)
@given(vals=st.lists(st.integers(min_value=0, max_value=10000), min_size=1, max_size=25))
def test_gini_matches_numpy_reference_and_bounds(spark, vals):
    """Gini equals the sorted-rank formula computed directly, and always
    lands in [0, (n-1)/n]."""
    import math

    rows = [
        (i, i, "O", c / 100.0, dt.datetime(2024, 1, 1, 12), "1-URGENT")
        for i, c in enumerate(vals)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    r = gini_concentration(orders).collect()[0]
    n = len(vals)
    sx = sum(vals)
    if sx == 0:
        assert r.gini is None or r.gini == 0.0 or math.isnan(r.gini)
        return
    # tie-break by customer key == by original index for equal values;
    # G is invariant to tie order, so plain stable sort suffices
    ordered = sorted(range(n), key=lambda i: (vals[i] / 100.0, i))
    six = sum((rank + 1) * vals[i] / 100.0 for rank, i in enumerate(ordered))
    want = 2.0 * six / (n * (sx / 100.0)) - (n + 1.0) / n
    assert r.n_customers == n
    assert abs(r.gini - want) <= 2e-6  # quantization step
    # the theoretical max (n-1)/n is attainable (all spend on one
    # customer, e.g. [0, 0, 1]) and the 1e-6 quantization may round
    # PAST it — the bound check needs the same quantization slack
    assert -1e-6 <= r.gini <= (n - 1) / n + 1e-6


@settings(**SETTINGS)
@given(
    days=st.integers(min_value=3, max_value=8),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_corr_matrix_matches_numpy(spark, days, seed):
    """Pairwise correlation equals numpy.corrcoef on the per-day series
    (within the 1e-6 quantization step) for arbitrary 2-type data."""
    import numpy as np

    rng = [(seed * 9301 + i * 49297) % 233280 / 233280.0 for i in range(2 * days)]
    a = [round(1 + 10 * x, 2) for x in rng[:days]]
    b = [round(1 + 10 * x, 2) for x in rng[days:]]
    rows = []
    eid = 0
    for d in range(days):
        for typ, v in (("A", a[d]), ("B", b[d])):
            rows.append((eid, dt.datetime(2024, 1, d + 1, 12), 1, typ, v, "{}"))
            eid += 1
    out = corr_matrix(
        spark.createDataFrame(rows, EVENT_SCHEMA)
    ).collect()
    got = {(r.ta, r.tb): r.corr for r in out}[("A", "B")]
    want = float(np.corrcoef(a, b)[0, 1])
    if np.isnan(want):  # constant series → NULL on the Spark side
        assert got is None
    else:
        assert abs(got - want) <= 2e-6


from trading_data_pipeline_spark.operators.trading_queries import (  # noqa: E402
    mad_outliers,
    vwap_bars,
)


@settings(**SETTINGS)
@given(
    trades=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9999).map(lambda c: c / 100.0),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_vwap_lies_within_bar_range(spark, trades):
    """A volume-weighted average of prices can never leave [low, high],
    and volume/n_trades must total the inputs — for ANY trade tape."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 9, 0, i % 60), 1, "t", p, '{"k": %d}' % q)
        for i, (p, q) in enumerate(trades)
    ]
    bars = vwap_bars(
        spark.createDataFrame(rows, EVENT_SCHEMA), bar_seconds=86400
    ).collect()
    assert len(bars) == 1
    b = bars[0]
    assert b.low - 1e-9 <= b.vwap <= b.high + 1e-9
    assert b.volume == sum(q for _, q in trades)
    assert b.n_trades == len(trades)
    assert b.low == min(p for p, _ in trades)
    assert b.high == max(p for p, _ in trades)


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=-5000, max_value=5000).map(lambda c: c / 100.0),
        min_size=3,
        max_size=25,
    ),
    shift=st.sampled_from([-40.0, -7.25, 13.5, 100.0]),
)
def test_mad_outlier_count_is_shift_invariant(spark, vals, shift):
    """Median and MAD are shift-equivariant/-invariant, so adding a
    constant to every value must not change which rows are outliers."""
    def run(vs):
        rows = _events([(1, "t", i, v) for i, v in enumerate(vs)])
        r = mad_outliers(spark.createDataFrame(rows, EVENT_SCHEMA)).collect()[0]
        return r.n_outliers, r.mad_value

    base_n, base_mad = run(vals)
    shifted_n, shifted_mad = run([v + shift for v in vals])
    assert shifted_n == base_n
    assert shifted_mad == base_mad


from trading_data_pipeline_spark.operators.corpus_queries import (  # noqa: E402
    pps_sample,
)
from trading_data_pipeline_spark.operators.lake_queries import (  # noqa: E402
    snapshot_diff,
)

version_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),          # key
        st.integers(min_value=0, max_value=3),           # payload a
        st.sampled_from([None, 1.0, 2.5]),               # payload b (nullable)
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)


@settings(**SETTINGS)
@given(old_rows=version_rows, new_rows=version_rows)
def test_snapshot_diff_matches_dict_reference(spark, old_rows, new_rows):
    """snapshot_diff agrees with the obvious dict-based diff for ANY pair
    of keyed versions, including NULL payloads."""
    schema = "k long, a long, b double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    got = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}

    o = {r[0]: (r[1], r[2]) for r in old_rows}
    n = {r[0]: (r[1], r[2]) for r in new_rows}
    want = {}
    for k in o.keys() | n.keys():
        if k not in o:
            want[k] = "added"
        elif k not in n:
            want[k] = "removed"
        elif o[k] != n[k]:
            want[k] = "changed"
    assert got == want


@settings(**SETTINGS)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=40
    ),
    target=st.sampled_from([1, 3, 7]),
)
def test_pps_sample_matches_sequential_walk(spark, weights, target):
    """The distributed PPS sampler equals the O(n) sequential
    step-boundary walk for ANY weight sequence and target."""
    rows = [(i, "t", "en", "s", w) for i, w in enumerate(weights)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = sorted(r.doc_id for r in pps_sample(docs, target=target).collect())
    total = sum(weights)
    step = max(1, total // target)
    cum = 0
    want = []
    for i, w in enumerate(weights):
        prev = cum
        cum += w
        if cum // step > prev // step:
            want.append(i)
    assert got == want


# ------------------------------------------------- round-6 op invariants


@settings(**SETTINGS)
@given(
    scores=st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False).map(
                lambda x: round(x, 2)
            ),
            st.booleans(),
        ),
        min_size=4,
        max_size=40,
    ).filter(
        lambda rs: any(p for _, p in rs) and any(not p for _, p in rs)
    )
)
def test_auc_complement_and_reference(spark, scores):
    """AUC(scores) + AUC(-scores) == 1 (tie terms contribute ½ to each),
    and both match the O(n²) pairwise reference."""
    from trading_data_pipeline_spark.operators.bi_queries import auc_exact

    def frame(sgn):
        rows = [
            (i, dt.datetime(2024, 1, 1), 1,
             "purchase" if p else "click", sgn * s, "{}")
            for i, (s, p) in enumerate(scores)
        ]
        return spark.createDataFrame(rows, EVENT_SCHEMA)

    def ref(sgn):
        pos = [sgn * s for s, p in scores if p]
        neg = [sgn * s for s, p in scores if not p]
        wins = sum(
            1.0 if a > b else (0.5 if a == b else 0.0)
            for a in pos for b in neg
        )
        v = wins / (len(pos) * len(neg))
        import math

        return math.floor(v * 1_000_000 + 0.5) / 1_000_000

    up = auc_exact(frame(1.0)).collect()[0].auc
    down = auc_exact(frame(-1.0)).collect()[0].auc
    assert up == ref(1.0)
    assert down == ref(-1.0)
    assert abs((up + down) - 1.0) < 2e-6  # quantization of each side


@settings(**SETTINGS)
@given(
    days=st.lists(st.integers(min_value=1, max_value=28), min_size=1,
                  max_size=15, unique=True)
)
def test_streaks_partition_the_active_days(spark, days):
    """Streak lengths sum to the active-day count, streak count equals
    gap count + 1, and the longest streak matches a sequential scan."""
    from trading_data_pipeline_spark.operators.analytics_queries import (
        activity_streaks,
    )

    rows = [
        (i, dt.datetime(2024, 1, d, 9), 7, "click", 1.0, "{}")
        for i, d in enumerate(days)
    ]
    r = activity_streaks(spark.createDataFrame(rows, EVENT_SCHEMA)).collect()[0]
    ds = sorted(days)
    gaps = sum(1 for a, b in zip(ds, ds[1:]) if b - a > 1)
    runs, cur = [], 1
    for a, b in zip(ds, ds[1:]):
        if b - a == 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    assert r.n_active_days == len(ds)
    assert r.n_streaks == gaps + 1 == len(runs)
    assert r.longest_len == max(runs)


@settings(**SETTINGS)
@given(
    anchors=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=25),
            st.floats(min_value=-100, max_value=100, allow_nan=False).map(
                lambda x: round(x, 2)
            ),
        ),
        min_size=2,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_interpolate_matches_sequential_reference(spark, anchors):
    """Interpolated series equals the O(n) sequential reference on every
    spine day (observed days exact, gaps time-weighted)."""
    import math

    from trading_data_pipeline_spark.operators.analytics_queries import (
        interpolate_daily,
    )

    rows = [
        (i, dt.datetime(2024, 1, d, 9), 3, "click", v, "{}")
        for i, (d, v) in enumerate(anchors)
    ]
    got = {
        r.day.day: r.value_interp
        for r in interpolate_daily(
            spark.createDataFrame(rows, EVENT_SCHEMA)
        ).collect()
    }
    pts = sorted(anchors)
    want = {}
    for (d0, v0), (d1, v1) in zip(pts, pts[1:]):
        want[d0] = v0
        for d in range(d0 + 1, d1):
            frac = (d - d0) / (d1 - d0)
            want[d] = math.floor((v0 + (v1 - v0) * frac) * 10000 + 0.5) / 10000
    want[pts[-1][0]] = pts[-1][1]
    assert got == {
        d: math.floor(v * 10000 + 0.5) / 10000 for d, v in want.items()
    }

"""Property-based report1 invariants (hypothesis): for ANY input trade
frame, the OHLC report must satisfy min ≤ open/close ≤ max, volume equals
the group's sum, one output row per (ISIN, date) ≥ cutoff, and pct-change
must be recomputable from consecutive opening prices. These hold by the
operator's semantics, not by fixture luck — the generator produces
adversarial shapes (ties, single-row days, unordered input)."""

from __future__ import annotations

from datetime import date, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trading_data_pipeline_spark.config import SourceConfig, TargetConfig
from trading_data_pipeline_spark.operators.report1 import transform_report1

SCHEMA = (
    "ISIN string, Mnemonic string, Date string, Time string, "
    "StartPrice double, EndPrice double, MinPrice double, MaxPrice double, "
    "TradedVolume long"
)

prices = st.floats(min_value=1.0, max_value=500.0).map(lambda x: round(x, 2))


@st.composite
def trade_rows(draw):
    isins = draw(
        st.lists(st.sampled_from(["AAA111", "BBB222", "CCC333"]), min_size=1, max_size=3)
    )
    rows = []
    for isin in set(isins):
        n_days = draw(st.integers(1, 4))
        for d in range(n_days):
            day = (date(2021, 4, 15) + timedelta(days=d)).isoformat()
            n_trades = draw(st.integers(1, 4))
            times = draw(
                st.lists(
                    st.integers(7, 17), min_size=n_trades, max_size=n_trades,
                    unique=True,
                )
            )
            for t in times:
                p = draw(prices)
                lo, hi = p - draw(prices) % 5, p + draw(prices) % 5
                rows.append(
                    (isin, "MNE", day, f"{t:02d}:00", p, p,
                     round(min(lo, p), 2), round(max(hi, p), 2),
                     draw(st.integers(0, 10_000)))
                )
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=trade_rows())
def test_report1_invariants(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = transform_report1(
        df, SourceConfig(), TargetConfig(), extract_date="2021-04-15"
    ).collect()

    # one row per (ISIN, Date) present in the input at/after the cutoff
    in_groups = {(r[0], r[2]) for r in rows if r[2] >= "2021-04-15"}
    assert {(r["ISIN"], r["Date"]) for r in out} == in_groups

    by_group: dict[tuple, list] = {}
    for r in rows:
        by_group.setdefault((r[0], r[2]), []).append(r)

    opens: dict[str, dict[str, float]] = {}
    for r in out:
        grp = by_group[(r["ISIN"], r["Date"])]
        lo = min(g[6] for g in grp)
        hi = max(g[7] for g in grp)
        assert r["minimum_price_eur"] == round(lo, 2)
        assert r["maximum_price_eur"] == round(hi, 2)
        assert r["daily_traded_volume"] == sum(g[8] for g in grp)
        # open/close are StartPrices of first/last trade by time
        first = min(grp, key=lambda g: g[3])
        last = max(grp, key=lambda g: g[3])
        assert r["opening_price_eur"] == round(first[4], 2)
        assert r["closing_price_eur"] == round(last[4], 2)
        opens.setdefault(r["ISIN"], {})[r["Date"]] = r["opening_price_eur"]

    # pct change recomputable from consecutive openings
    for r in out:
        days = sorted(opens[r["ISIN"]])
        idx = days.index(r["Date"])
        if idx == 0:
            assert r["change_prev_closing_%"] is None
        else:
            prev = opens[r["ISIN"]][days[idx - 1]]
            want = round((r["opening_price_eur"] - prev) / prev * 100, 2)
            got = r["change_prev_closing_%"]
            assert got == pytest.approx(want, abs=0.011)

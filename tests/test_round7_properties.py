"""Property-based invariants for the round-7 session operators
(hypothesis): identities that hold for ANY tape by construction —
dollar bars conserve trades and dollars; the stochastic oscillator
stays in [0, 100]; MFI stays in [0, 100]; VPIN stays in [0, 1];
t-closeness TVD stays in [0, 1] and is 0 when every cell mirrors the
global marginal; repetition's dup fraction stays in [0, 1) and unique
grams never exceed totals."""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# a tape: per-event (day 1-28, price 1-200 in 0.01 steps, qty 0-99)
_trade = st.tuples(
    st.integers(1, 28),
    st.integers(100, 20000).map(lambda c: c / 100.0),
    st.integers(0, 99),
)
_tape = st.lists(_trade, min_size=2, max_size=80)


def _ev(spark, tape):
    rows = [
        (
            i,
            dt.datetime(2024, 1, day, 9, 0, 0) + dt.timedelta(seconds=i),
            1 + i % 3,
            "x",
            price,
            json.dumps({"k": qty}),
        )
        for i, (day, price, qty) in enumerate(sorted(tape), 1)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


@given(tape=_tape)
@settings(**SETTINGS)
def test_dollar_bars_conserve_trades_and_dollars(spark, tape):
    from trading_data_pipeline_spark.operators.indicators2_queries import (
        dollar_bars,
    )

    ev = _ev(spark, tape)
    out = dollar_bars(ev, threshold=50_000).collect()
    want_dollars = sum(
        int(round(p * 100)) * q for _, p, q in tape
    )
    assert sum(r.bar_dollars for r in out) == want_dollars
    assert sum(r.n_trades for r in out) == len(tape)
    for r in out:
        assert r.low <= r.open <= r.high and r.low <= r.close <= r.high


@given(tape=_tape)
@settings(**SETTINGS)
def test_stochastic_and_mfi_stay_bounded(spark, tape):
    from trading_data_pipeline_spark.operators.indicators2_queries import (
        mfi,
        stochastic,
    )

    ev = _ev(spark, tape)
    for r in stochastic(ev, n=3, d=2).collect():
        assert 0.0 <= r.pct_k <= 100.0 and 0.0 <= r.pct_d <= 100.0
    for r in mfi(ev, n=2).collect():
        assert 0.0 <= r.mfi <= 100.0
        assert r.pos_flow >= 0 and r.neg_flow >= 0


@given(tape=_tape)
@settings(**SETTINGS)
def test_vpin_stays_in_unit_interval(spark, tape):
    from trading_data_pipeline_spark.operators.microstructure_queries import (
        vpin,
    )

    for r in vpin(_ev(spark, tape), v=500, k=2).collect():
        assert 0.0 <= r.vpin <= 1.0
        assert r.imb <= r.buy + r.sell


@given(tape=_tape)
@settings(**SETTINGS)
def test_tcloseness_tvd_in_unit_interval(spark, tape):
    from trading_data_pipeline_spark.operators.trainprep_queries import (
        tcloseness,
    )

    for r in tcloseness(_ev(spark, tape)).collect():
        assert 0.0 <= r.tvd <= 1.0


_tok = st.text(alphabet="abc", min_size=1, max_size=3)
_doc = st.lists(_tok, min_size=3, max_size=40).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_repetition_fraction_bounded_and_consistent(spark, texts):
    from trading_data_pipeline_spark.operators.textqc_queries import (
        repetition,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    for r in repetition(docs).collect():
        assert 1 <= r.n_unique <= r.n_grams
        assert 0.0 <= r.dup_frac < 1.0
        # cross-check against Python on the raw text
        toks = texts[r.doc_id].split(" ")
        grams = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        assert r.n_grams == len(grams)
        assert r.n_unique == len(set(grams))

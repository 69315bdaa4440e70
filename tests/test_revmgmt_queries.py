"""Semantic invariants for batch 183 (q982-q986, revenue management)
beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.revmgmt import CAPACITY, FARES, OB_CAP

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_demand_profile_order_stats(spark, sf_dir):
    df = run("q982_demand_profile", spark, sf_dir)
    assert len(df) == 5
    assert (df["min_d"] <= df["median_d"]).all()
    assert (df["median_d"] <= df["max_d"]).all()
    assert (df["mean_d"] >= df["min_d"]).all()
    assert (df["mean_d"] <= df["max_d"]).all()


def test_littlewood_protection_sane(spark, sf_dir):
    row = run("q983_littlewood_rule", spark, sf_dir).iloc[0]
    prof = run("q982_demand_profile", spark, sf_dir).set_index("cls")
    # protection never exceeds the max observed full-fare demand and
    # is positive while the fare ratio is below 1
    assert 0 <= row["protection_y"] <= prof.loc["1-URGENT", "max_d"]
    assert row["discount_booking_limit"] == CAPACITY - row["protection_y"]
    assert row["full_fare_cents"] == FARES["1-URGENT"]


def test_emsrb_pools_more_than_littlewood(spark, sf_dir):
    lw = run("q983_littlewood_rule", spark, sf_dir).iloc[0]
    eb = run("q984_emsrb_protection", spark, sf_dir).iloc[0]
    # pooled upper-class demand is >= the full class alone, and the
    # weighted fare is above the discount fare, so the pooled
    # protection is at least the single-class one
    assert eb["pooled_protection"] >= lw["protection_y"]
    assert eb["weighted_fare_num"] > 0 and eb["weighted_fare_den"] > 0
    wf = eb["weighted_fare_num"] / eb["weighted_fare_den"]
    assert FARES["3-MEDIUM"] <= wf <= FARES["1-URGENT"]


def test_overbooking_grid_monotone(spark, sf_dir):
    df = run("q985_overbooking_grid", spark, sf_dir).sort_values("bookings")
    # more bookings -> more expected boarded AND more expected bumped
    assert df["expected_boarded"].is_monotonic_increasing
    assert df["expected_bumped"].is_monotonic_increasing
    assert (df["expected_boarded"] <= OB_CAP).all()
    # with a 90% show rate, booking exactly capacity boards ~0.9*CAP
    first = df.iloc[0]
    assert abs(first["expected_boarded"] - 0.9 * OB_CAP) < 0.01


def test_bid_price_curve_concave(spark, sf_dir):
    df = run("q986_bid_price_curve", spark, sf_dir).sort_values("seats")
    bp = df["bid_price_pax"].dropna()
    # marginal value of a seat is positive and decreasing (concavity)
    assert (bp > 0).all()
    assert (bp.diff().dropna() <= 1e-12).all()
    assert df["expected_boarded"].is_monotonic_increasing

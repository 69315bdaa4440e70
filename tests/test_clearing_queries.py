"""Semantic invariants for batch 182 (q977-q981, call-auction
clearing) beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_uncross_maximizes_volume(spark, sf_dir):
    u = run("q977_auction_uncross", spark, sf_dir)
    assert (u["exec_q"] >= 0).all()
    # executable = min(demand, supply) at the cross
    assert (
        u["exec_q"] == u[["demand_at_cross", "supply_at_cross"]].min(axis=1)
    ).all()


def test_fill_schedule_consistent(spark, sf_dir):
    u = run("q977_auction_uncross", spark, sf_dir).set_index("day")
    f = run("q978_fill_schedule", spark, sf_dir)
    assert (f["filled"] >= 0).all()
    assert (f["filled"] <= f["level_size"]).all()
    # total buy fills per day equal the executed volume
    per_day = f.groupby("day")["filled"].sum()
    for day, tot in per_day.items():
        assert tot == u.loc[day, "exec_q"]
    # price priority: once a level is not fully filled, every junior
    # (lower-priced) level must receive nothing
    for _, g in f.groupby("day"):
        g = g.sort_values("px", ascending=False)
        seen_partial = False
        for rec in g.itertuples(index=False):
            if seen_partial:
                assert rec.filled == 0
            if rec.fully_filled == 0:
                seen_partial = True


def test_surplus_nonnegative(spark, sf_dir):
    s = run("q979_auction_surplus", spark, sf_dir)
    assert (s["buyer_surplus"] >= 0).all()
    assert (s["seller_surplus"] >= 0).all()
    assert (
        s["total_surplus"] == s["buyer_surplus"] + s["seller_surplus"]
    ).all()


def test_imbalance_consistent(spark, sf_dir):
    i = run("q980_residual_imbalance", spark, sf_dir)
    assert (i["unfilled_buy_depth"] >= 0).all()
    assert (i["unfilled_sell_depth"] >= 0).all()
    # exactly one side can carry residual depth at the cross (the
    # other is fully executed by definition of exec = min)
    assert (
        (i["unfilled_buy_depth"] == 0) | (i["unfilled_sell_depth"] == 0)
    ).all()
    assert (
        (i["imbalance"] > 0) == (i["pressure_side"] == 1)
    ).all()


def test_moves_match_prices(spark, sf_dir):
    u = run("q977_auction_uncross", spark, sf_dir).sort_values("day")
    m = run("q981_clearing_price_moves", spark, sf_dir).sort_values("day")
    assert len(m) == len(u) - 1
    assert (m["move_cents"] == m["clearing_px"] - m["prev_px"]).all()

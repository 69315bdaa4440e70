"""Semantic invariants for batch 194 (q1037-q1041, unit-economics
sensitivity) beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.tornado import DRIVERS, WATERFALL

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_tornado_ordering_and_symmetry(spark, sf_dir):
    df = run("q1037_tornado_swings", spark, sf_dir).sort_values("tornado_rank")
    assert set(df.driver) == set(DRIVERS)
    swings = df.swing_c.tolist()
    assert swings == sorted(swings, reverse=True)
    # base profit sits between each driver's low and high scenario
    base = df.base_profit_c.iloc[0]
    lo = df[["profit_low", "profit_high"]].min(axis=1)
    hi = df[["profit_low", "profit_high"]].max(axis=1)
    assert ((lo <= base) & (base <= hi)).all()
    # volume swing is exactly +/-10% of base up to FLOOR slack
    vol = df[df.driver == "volume"].iloc[0]
    assert abs(vol.swing_c - 2 * base // 10) <= 10


def test_grid_monotone_in_volume(spark, sf_dir):
    df = run("q1038_price_volume_grid", spark, sf_dir)
    assert len(df) == 25
    for _, g in df.groupby("prc_pct"):
        g = g.sort_values("vol_pct")
        # profit is linear (increasing) in volume at positive margin
        assert g.profit_c.is_monotonic_increasing
    for _, g in df.groupby("vol_pct"):
        g = g.sort_values("prc_pct")
        assert g.profit_c.is_monotonic_increasing


def test_breakeven_consistent_with_extremes(spark, sf_dir):
    df = run("q1039_breakeven_sweep", spark, sf_dir)
    assert set(df.driver) == set(DRIVERS)
    for _, r in df.iterrows():
        if r.breakeven_pct == -1:
            assert r.min_profit_c > 0
        else:
            assert r.min_profit_c <= 0


def test_waterfall_bridges_scenarios(spark, sf_dir):
    df = run("q1040_scenario_waterfall", spark, sf_dir).sort_values("step_no")
    assert len(df) == len(WATERFALL) + 1
    # deltas telescope: start + sum(deltas) = final
    assert df.delta_c.iloc[0] == 0
    assert (
        df.profit_c.iloc[0] + df.delta_c.iloc[1:].sum() == df.profit_c.iloc[-1]
    )
    # every optimistic move improves profit
    assert (df.delta_c.iloc[1:] > 0).all()


def test_volume_elasticity_is_one(spark, sf_dir):
    df = run("q1041_elasticity_ranking", spark, sf_dir).set_index("driver")
    # profit is linear in volume: arc elasticity = 1 exactly (up to
    # FLOOR slack on huge cents values)
    assert abs(df.loc["volume", "arc_elasticity"] - 1.0) < 1e-6
    assert (df.elast_den_x100 > 0).all()
    ranks = df.elasticity_rank.sort_values().tolist()
    assert ranks == list(range(1, len(DRIVERS) + 1))

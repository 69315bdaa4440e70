"""Semantic invariants for batch 191 (q1022-q1026, Bass/logistic
diffusion) beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.diffusion2 import BASS_P, BASS_Q, GRID

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_adoption_curve_conserves(spark, sf_dir):
    df = run("q1022_adoption_curve", spark, sf_dir).sort_values("wk")
    assert df.cum_adopters.is_monotonic_increasing
    assert df.cum_adopters.iloc[-1] == df.eventual_adopters.iloc[0]
    assert df.adopters.sum() == df.eventual_adopters.iloc[0]
    assert abs(df.cum_share.iloc[-1] - 1.0) < 1e-12


def test_bass_replay_matches_python(spark, sf_dir):
    df = run("q1023_bass_replay", spark, sf_dir).sort_values("wk")
    # dense spine, model conserves <= M
    assert (df.wk.values == range(len(df))).all()
    m = run("q1022_adoption_curve", spark, sf_dir).eventual_adopters.iloc[0]
    assert (df.cum_model <= m + 1e-9).all()
    assert df.cum_model.is_monotonic_increasing
    # recompute week 0..2 by hand
    n = 0.0
    for t in range(3):
        nhat = (BASS_P + BASS_Q * n / m) * (m - n)
        row = df[df.wk == t].iloc[0]
        import math

        assert row.nhat == math.floor(nhat * 1000 + 0.5) / 1000
        n += nhat
    assert df.actual.sum() == m


def test_logistic_unimodal_s_curve(spark, sf_dir):
    logi = run("q1024_logistic_replay", spark, sf_dir).sort_values("wk")
    assert logi.cum_model.is_monotonic_increasing
    m = run("q1022_adoption_curve", spark, sf_dir).eventual_adopters.iloc[0]
    assert (logi.cum_model <= m + 1e-9).all()
    # the logistic weekly increment is unimodal: rises to one peak,
    # then falls (the defining S-curve shape below saturation)
    nh = logi.nhat.tolist()
    peak = nh.index(max(nh))
    assert all(nh[i] <= nh[i + 1] + 1e-9 for i in range(peak))
    assert all(nh[i] >= nh[i + 1] - 1e-9 for i in range(peak, len(nh) - 1))


def test_grid_tournament_complete_and_ranked(spark, sf_dir):
    df = run("q1025_bass_grid_tournament", spark, sf_dir).sort_values("rk")
    assert len(df) == len(GRID)
    assert set(zip(df.p, df.q)) == set(GRID)
    assert (df.rk.values == range(1, len(GRID) + 1)).all()
    assert df.sse_milli.is_monotonic_increasing
    assert df.is_winner.sum() == 1
    assert df.iloc[0].is_winner == 1


def test_peak_week_consistent(spark, sf_dir):
    pk = run("q1026_peak_week", spark, sf_dir).iloc[0]
    curve = run("q1022_adoption_curve", spark, sf_dir)
    emp_peak = curve.sort_values(
        ["adopters", "wk"], ascending=[False, True]
    ).wk.iloc[0]
    assert pk.empirical_peak_wk == emp_peak
    # half-saturation weeks are inside the observed horizon
    assert 0 <= pk.empirical_half_wk <= curve.wk.max()
    assert 0 <= pk.model_half_wk <= curve.wk.max()
    assert pk.m == curve.eventual_adopters.iloc[0]

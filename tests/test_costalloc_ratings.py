"""Semantic invariants for batches 179-180 (q962-q971): cooperative
cost allocation and sequential table-Elo — properties the DuckDB
oracle hash cannot see (both engines could be wrong the same way),
checked on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.ratings import E_TABLE, N_BUCKETS, R0_MILL

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


# --- cost allocation ---------------------------------------------------------


def test_shapley_efficiency_and_core(spark, sf_dir):
    df = run("q962_airport_shapley", spark, sf_dir)
    # efficiency: shares sum to the joint cost c_max (exact up to the
    # nano quantization of <= n terms per nation)
    c_max = df["standalone_cents"].max()
    total_u = df["shapley_nanocents"].sum()
    assert abs(total_u - c_max * 1_000_000_000) <= len(df) ** 2
    # airport-game Shapley is in the core: nobody pays more than
    # standalone, everybody pays something positive
    assert (df["shapley_nanocents"] <= df["standalone_cents"] * 1_000_000_000).all()
    assert (df["shapley_nanocents"] > 0).all()
    # monotone in standalone cost
    s = df.sort_values("standalone_cents")["shapley_nanocents"]
    assert s.is_monotonic_increasing


def test_prorata_overcharges_small_players(spark, sf_dir):
    df = run("q963_shapley_vs_prorata", spark, sf_dir)
    # both allocations sum to ~c_max; divergence sums to ~0
    assert abs(df["overpay_nanocents"].sum()) <= len(df) ** 2 * 2
    # the single largest-cost nation is never overcharged by pro-rata
    big = df.loc[df["proportional_cents"].idxmax()]
    assert big["prorata_overcharges"] == 0


def test_power_indices_normalize(spark, sf_dir):
    bz = run("q964_banzhaf_power", spark, sf_dir)
    assert len(bz) == 5
    assert abs(bz["banzhaf_index"].sum() - 1.0) < 1e-9
    ss = run("q965_shapley_shubik", spark, sf_dir)
    assert ss["ss_num_120"].sum() == 120  # exact efficiency in /120 units
    assert (ss["ss_num_120"] >= 0).all()


def test_core_check_slack_sign_consistent(spark, sf_dir):
    df = run("q966_core_check_prorata", spark, sf_dir)
    assert len(df) == 25
    assert (
        (df["core_slack_cross"] >= 0) == (df["satisfied"] == 1)
    ).all()
    # the grand coalition row (full prefix) is always satisfied with
    # zero slack: sum of pro-rata shares equals c_max by construction
    last = df.loc[df["prefix_rank"].idxmax()]
    assert last["satisfied"] == 1 and last["core_slack_cross"] == 0


# --- Elo ----------------------------------------------------------------------


def test_e_table_shape():
    assert len(E_TABLE) == N_BUCKETS
    assert E_TABLE[0] >= 500 and E_TABLE[-1] <= 1000
    assert all(a <= b for a, b in zip(E_TABLE, E_TABLE[1:]))


def test_match_log_shape(spark, sf_dir):
    m = run("q967_match_log", spark, sf_dir)
    # one match per hour, players distinct, score in {500, 1000}
    assert m["hr"].is_unique
    assert (m["player_a"] != m["player_b"]).all()
    assert set(m["score_a_mill"].unique()) <= {500, 1000}
    assert sorted(m["match_idx"]) == list(range(1, len(m) + 1))


def test_elo_zero_sum(spark, sf_dir):
    f = run("q968_elo_final", spark, sf_dir)
    # every update is zero-sum, so total rating mass is conserved
    assert f["rating_mill"].sum() == len(f) * R0_MILL


def test_trajectory_brackets_final(spark, sf_dir):
    f = run("q968_elo_final", spark, sf_dir).set_index("player")["rating_mill"]
    t = run("q969_elo_trajectory", spark, sf_dir).set_index("player")
    assert set(t.index) == set(f.index)
    assert (t["trough_mill"] <= f.loc[t.index]).all()
    assert (f.loc[t.index] <= t["peak_mill"]).all()
    assert (t["trough_mill"] <= R0_MILL).all() and (t["peak_mill"] >= R0_MILL).all()


def test_k_sensitivity_same_players_zero_sum(spark, sf_dir):
    df = run("q970_elo_k_sensitivity", spark, sf_dir)
    assert df["rating_k16_mill"].sum() == df["rating_k32_mill"].sum()
    # K=32 moves SOMEBODY differently than K=16
    assert (df["rating_k16_mill"] != df["rating_k32_mill"]).any()


def test_concordance_bounds(spark, sf_dir):
    row = run("q971_elo_winrate_concordance", spark, sf_dir).iloc[0]
    assert row["concordant"] + row["discordant"] <= row["n_pairs"]
    assert -1.0 <= row["kendall_tau_a"] <= 1.0
    # rating should agree with win totals far more than it disagrees
    assert row["concordant"] > row["discordant"]

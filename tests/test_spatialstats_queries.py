"""Invariant checks for batch 97 (q551-q555, spatial statistics)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_moran_bounds(spark, sf_dir):
    r = REGISTRY["q551_moran_i"].fn(spark, sf_dir).collect()[0]
    # Moran's I is essentially bounded by the weight-matrix eigenvalues;
    # for a rook lattice it stays well inside [-1, 1].
    assert -1.0 <= r["moran_i"] <= 1.0
    assert r["expected_i"] < 0  # -1/(n-1)
    assert r["n_cells"] > 100
    # every interior cell has 4 rook links; edges fewer
    assert r["s0_links"] < 4 * r["n_cells"]


def test_geary_nonnegative(spark, sf_dir):
    r = REGISTRY["q552_geary_c"].fn(spark, sf_dir).collect()[0]
    assert r["geary_c"] >= 0.0
    assert r["n_cells"] > 100


def test_moran_geary_consistent(spark, sf_dir):
    # On the same surface, clustered (I>E[I]) should align with C<1 and
    # dispersed with C>1 — the two statistics must not contradict
    # strongly (allow the near-random band where both hug their nulls).
    i = REGISTRY["q551_moran_i"].fn(spark, sf_dir).collect()[0]
    c = REGISTRY["q552_geary_c"].fn(spark, sf_dir).collect()[0]
    if i["moran_i"] > 0.2:
        assert c["geary_c"] < 1.0
    if i["moran_i"] < -0.2:
        assert c["geary_c"] > 1.0


def test_getis_ranked_desc(spark, sf_dir):
    rows = REGISTRY["q553_getis_hotspots"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    zs = [r["gi_star"] for r in rows]
    assert zs == sorted(zs, reverse=True)
    for r in rows:
        assert 4 <= r["neighborhood_size"] <= 9  # queen + self, corner=4


def test_join_counts_partition(spark, sf_dir):
    r = REGISTRY["q554_join_counts"].fn(spark, sf_dir).collect()[0]
    # BB + WW + BW must equal the total undirected link count S0/2,
    # which equals Moran's s0_links / 2 on the same lattice.
    i = REGISTRY["q551_moran_i"].fn(spark, sf_dir).collect()[0]
    assert r["bb_joins"] + r["ww_joins"] + r["bw_joins"] == i["s0_links"] // 2
    assert 0 <= r["n_high"] <= r["n_cells"]
    assert r["expected_bb"] >= 0.0 and r["expected_bw"] >= 0.0


def test_lag_residual_consistency(spark, sf_dir):
    rows = REGISTRY["q555_spatial_lag_residuals"].fn(spark, sf_dir).collect()
    assert len(rows) == 12
    for r in rows:
        assert 3 <= r["neighborhood_size"] <= 8  # queen, no self
        assert abs(r["cell_count"] - r["neighbor_mean"] - r["residual"]) < 1e-3

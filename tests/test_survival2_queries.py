"""Invariant checks for batch 85 (q491-q495, survival analysis 2)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_nelson_aalen_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q491_nelson_aalen"].fn(spark, sf_dir).collect(),
        key=lambda r: r["duration_h"],
    )
    assert rows
    ch = [r["cum_hazard"] for r in rows]
    assert ch == sorted(ch)  # cumulative hazard never decreases
    assert all(r["hazard_var"] >= 0 for r in rows)
    # risk set shrinks over time
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_weibull_shape_positive(spark, sf_dir):
    row = REGISTRY["q492_weibull_mrr"].fn(spark, sf_dir).collect()[0]
    assert row["n_events"] > 0
    assert row["shape_k"] > 0  # Weibull shape is positive by definition
    assert row["ln_scale"] is not None


def test_cif_sums_below_one(spark, sf_dir):
    rows = sorted(
        REGISTRY["q493_competing_risks"].fn(spark, sf_dir).collect(),
        key=lambda r: r["duration_h"],
    )
    assert rows
    for r in rows:
        assert 0.0 <= r["cif_purchase"] <= 1.0
        assert 0.0 <= r["cif_error"] <= 1.0
        # total incidence never exceeds 1 (the A-J guarantee KM breaks)
        assert r["cif_purchase"] + r["cif_error"] <= 1.0 + 1e-6
    # each CIF is monotone nondecreasing
    for col in ("cif_purchase", "cif_error"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)


def test_rmst_bounded_by_tau(spark, sf_dir):
    row = REGISTRY["q494_rmst"].fn(spark, sf_dir).collect()[0]
    assert row["tau_h"] == 48
    assert 0.0 < row["rmst_h"] <= 48.0


def test_conditional_survival_valid(spark, sf_dir):
    rows = sorted(
        REGISTRY["q495_conditional_survival"].fn(spark, sf_dir).collect(),
        key=lambda r: r["given_survived_h"],
    )
    assert [r["given_survived_h"] for r in rows] == [6, 12, 24]
    for r in rows:
        assert 0.0 <= r["s_t_plus_12"] <= r["s_t"] <= 1.0
        assert 0.0 <= r["conditional_survival"] <= 1.0 + 1e-9

"""Invariant checks for batch 87 (q501-q505, centrality & ranking)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_textrank_top_keywords(spark, sf_dir):
    rows = REGISTRY["q501_textrank_keywords"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    masses = [r["rank_mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)
    assert all(m > 0 for m in masses)
    assert len({r["keyword"] for r in rows}) == 20


def test_katz_positive_and_ordered(spark, sf_dir):
    rows = REGISTRY["q502_katz_centrality"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    masses = [r["katz_mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)
    # every node's mass >= beta scale (1 + attenuated paths)
    assert all(m >= 10**9 for m in masses)
    assert all(r["node"][0] in ("p", "s") for r in rows)


def test_rake_phrases_multiword_present(spark, sf_dir):
    rows = REGISTRY["q503_rake_phrases"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r["rake_score"] > 0 for r in rows)
    # RAKE favors longer phrases: the top list should contain some
    assert any(" " in r["phrase"] for r in rows)
    # no stopwords inside phrases
    stops = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}
    for r in rows:
        assert not (set(r["phrase"].split()) & stops)


def test_ecod_scores_ordered(spark, sf_dir):
    rows = REGISTRY["q504_ecod_outliers"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["ecod_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # 64 dims, each term in [0, ln(n+1)]: scores are positive
    assert all(s > 0 for s in scores)


def test_theta_forecast_blend(spark, sf_dir):
    rows = sorted(
        REGISTRY["q505_theta_forecast"].fn(spark, sf_dir).collect(),
        key=lambda r: r["horizon_days"],
    )
    assert [r["horizon_days"] for r in rows] == list(range(1, 8))
    for r in rows:
        assert r["trend_line"] > 0
        # the blend stays in the same ballpark as the trend line
        assert 0.3 * r["trend_line"] < r["theta_forecast"] < 3 * r["trend_line"]
